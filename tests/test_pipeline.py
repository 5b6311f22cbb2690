"""The batched cross-locus pipeline must match per-locus analyze_tr."""

import os

import pytest

from trgt_tpu.engine.pipeline import BatchPipeline
from trgt_tpu.engine.workflow import Params, analyze_tr
from trgt_tpu.io.bam import BamReader
from trgt_tpu.io.catalog import iter_loci
from trgt_tpu.io.fasta import FastaReader
from trgt_tpu.utils import Genotyper, Karyotype, TrgtScoring


def _summarize(res):
    return (
        [(a.seq, a.ci, a.num_spanning, a.annotation.motif_counts,
          round(a.annotation.purity, 9), a.meth) for a in res.genotype],
        res.tr_spans,
        res.classification,
    )


@pytest.mark.parametrize("genotyper,use_device", [
    (Genotyper.SIZE, True), (Genotyper.SIZE, False),
    (Genotyper.CLUSTER, True),
])
def test_pipeline_matches_workflow(example_dir, genotyper, use_device):
    fa = FastaReader(os.path.join(example_dir, "reference.fasta"))
    bam = BamReader(os.path.join(example_dir, "sample.bam"))
    params = Params(min_flank_id_frac=0.7, min_read_qual=0.98,
                    search_flank_len=250, max_depth=250,
                    aln_scoring=TrgtScoring(2, 5, 1))
    loci = list(iter_loci(os.path.join(example_dir, "repeat.bed"), fa,
                          Karyotype.new("XX"), 250, genotyper))
    pipeline = BatchPipeline(params, use_device=use_device)
    batched = list(pipeline.process(iter(loci), bam))
    assert len(batched) == 1
    ref_result = analyze_tr(loci[0], params, bam)
    assert _summarize(batched[0][1]) == _summarize(ref_result)


def test_pipeline_targeted_preset(example_dir):
    """Targeted preset exercises the impure-read filter stage."""
    fa = FastaReader(os.path.join(example_dir, "reference.fasta"))
    bam = BamReader(os.path.join(example_dir, "sample.bam"))
    params = Params(min_flank_id_frac=0.8, min_read_qual=-1.0,
                    search_flank_len=200, max_depth=10000,
                    aln_scoring=TrgtScoring(1, 0, 1))
    loci = list(iter_loci(os.path.join(example_dir, "repeat.bed"), fa,
                          Karyotype.new("XX"), 200, Genotyper.CLUSTER))
    pipeline = BatchPipeline(params, use_device=True)
    batched = list(pipeline.process(iter(loci), bam))
    ref_result = analyze_tr(loci[0], params, bam)
    assert _summarize(batched[0][1]) == _summarize(ref_result)


def test_pipeline_threads_identical(example_dir):
    """--threads fans out extraction + host span DP + host consensus
    aligns (GIL-releasing numpy); outputs must be identical to the
    single-threaded host run."""
    fa = FastaReader(os.path.join(example_dir, "reference.fasta"))
    params = Params(min_flank_id_frac=0.7, min_read_qual=0.98,
                    search_flank_len=250, max_depth=250,
                    aln_scoring=TrgtScoring(2, 5, 1))
    loci = list(iter_loci(os.path.join(example_dir, "repeat.bed"), fa,
                          Karyotype.new("XX"), 250, Genotyper.CLUSTER))
    bam_path = os.path.join(example_dir, "sample.bam")
    single = BatchPipeline(params, use_device=False, num_threads=1)
    multi = BatchPipeline(params, use_device=False, num_threads=4,
                          bam_factory=lambda: BamReader(bam_path))
    got1 = [(lid.id, _summarize(res)) for lid, res in
            single.process(iter(loci), BamReader(bam_path))]
    got4 = [(lid.id, _summarize(res)) for lid, res in
            multi.process(iter(loci), BamReader(bam_path))]
    assert got1 == got4
