import os
import subprocess

import pytest

from trgt_tpu.io.bam import BamReader
from trgt_tpu.io.bam_write import BamWriter
from trgt_tpu.io.bgzf import BgzfReader, BgzfWriter
from trgt_tpu.io.catalog import iter_loci, parse_catalog_line
from trgt_tpu.io.fasta import FastaReader
from trgt_tpu.utils import Genotyper, Karyotype, GenomicRegion


def test_fasta_fetch(example_dir):
    fa = FastaReader(os.path.join(example_dir, "reference.fasta"))
    assert fa.chrom_lookup() == {"chrA": 11061}
    seq = fa.fetch("chrA", 0, 10)
    assert seq == "acacctgtaa"
    # TR region of the example locus
    tr = fa.fetch("chrA", 10001, 10061).upper()
    assert tr == "CAG" * 20


def test_region_parse():
    r = GenomicRegion.from_string("chr1:100-200")
    assert (r.contig, r.start, r.end) == ("chr1", 100, 200)
    with pytest.raises(ValueError):
        GenomicRegion.from_string("chr:1:100-200")
    with pytest.raises(ValueError):
        GenomicRegion.from_string("chr1:200-100")


def test_karyotype_presets():
    k = Karyotype.new("XX")
    from trgt_tpu.utils import Ploidy
    assert k.get_ploidy("chr1") == Ploidy.TWO
    assert k.get_ploidy("chrY") == Ploidy.ZERO
    k = Karyotype.new("XY")
    assert k.get_ploidy("chrX") == Ploidy.ONE
    assert k.get_ploidy("chr5") == Ploidy.TWO


def test_catalog_parse(example_dir):
    fa = FastaReader(os.path.join(example_dir, "reference.fasta"))
    loci = list(iter_loci(os.path.join(example_dir, "repeat.bed"), fa,
                          Karyotype.new("XX"), 250, Genotyper.SIZE))
    assert len(loci) == 1
    locus = loci[0]
    assert locus.id == "TR1"
    assert locus.motifs == ["CAG"]
    assert locus.struc == "<TR>"
    assert locus.tr == "CAG" * 20
    assert len(locus.left_flank) == 250
    assert len(locus.right_flank) == 250
    assert locus.left_flank[-1].upper() == locus.left_flank[-1]


def test_bam_read(example_dir):
    bam = BamReader(os.path.join(example_dir, "sample.bam"))
    recs = list(bam)
    assert len(recs) == 33
    fetched = list(bam.fetch("chrA", 9751, 10311))
    assert len(fetched) == 33
    r = recs[0]
    assert r.mapq == 60
    assert isinstance(r.aux().get("rq"), float)


def test_bgzf_roundtrip(tmp_path):
    path = str(tmp_path / "test.gz")
    data = b"hello bgzf world\n" * 10000
    with BgzfWriter(path) as w:
        w.write(data)
    with BgzfReader(path) as r:
        assert r.read_all() == data
    # gzip CLI should also decompress it (BGZF is valid multi-member gzip)
    out = subprocess.run(["gzip", "-dc", path], capture_output=True)
    assert out.stdout == data


def test_bam_roundtrip(tmp_path, example_dir):
    src = BamReader(os.path.join(example_dir, "sample.bam"))
    recs = list(src)
    path = str(tmp_path / "out.bam")
    with BamWriter(path, src.header.text, src.header.references) as w:
        for r in recs:
            w.write_record(r.qname, r.flag, r.ref_id, r.pos, r.mapq,
                           r.cigar, r.seq, r.qual, [])
    back = BamReader(path)
    recs2 = list(back)
    assert len(recs2) == len(recs)
    for a, b in zip(recs, recs2):
        assert a.qname == b.qname
        assert a.pos == b.pos
        assert a.seq == b.seq
        assert a.cigar == b.cigar
        assert a.qual == b.qual
