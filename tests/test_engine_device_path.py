"""The device-engine path must produce the same results as the host path."""

import os

from trgt_tpu.engine.batch import DeviceEngine
from trgt_tpu.engine.workflow import Params, analyze_tr
from trgt_tpu.io.bam import BamReader
from trgt_tpu.io.catalog import iter_loci
from trgt_tpu.io.fasta import FastaReader
from trgt_tpu.utils import Genotyper, Karyotype, TrgtScoring


def _run(example_dir, engine, genotyper):
    fa = FastaReader(os.path.join(example_dir, "reference.fasta"))
    bam = BamReader(os.path.join(example_dir, "sample.bam"))
    locus = next(iter_loci(os.path.join(example_dir, "repeat.bed"), fa,
                           Karyotype.new("XX"), 250, genotyper))
    params = Params(min_flank_id_frac=0.7, min_read_qual=0.98,
                    search_flank_len=250, max_depth=250,
                    aln_scoring=TrgtScoring(2, 5, 1))
    return analyze_tr(locus, params, bam, engine)


def _summarize(res):
    return (
        [(a.seq, a.ci, a.num_spanning, a.annotation.motif_counts,
          round(a.annotation.purity, 9)) for a in res.genotype],
        res.tr_spans,
        res.classification,
    )


def test_device_engine_matches_host(example_dir):
    host = _run(example_dir, None, Genotyper.SIZE)
    dev = _run(example_dir, DeviceEngine(), Genotyper.SIZE)
    assert _summarize(host) == _summarize(dev)


def test_device_engine_cluster_matches_host(example_dir):
    host = _run(example_dir, None, Genotyper.CLUSTER)
    dev = _run(example_dir, DeviceEngine(), Genotyper.CLUSTER)
    assert _summarize(host) == _summarize(dev)
