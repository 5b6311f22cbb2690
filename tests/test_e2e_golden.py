"""End-to-end golden test: the bundled example must reproduce the exact
VCF record documented in the reference tutorial
(ref: docs/tutorial.md:44-48)."""

import os
import subprocess
import sys

import pytest

from trgt_tpu.io.bam import BamReader
from trgt_tpu.io.bgzf import BgzfReader

GOLDEN_RECORD = (
    "chrA\t10001\t.\t"
    "CCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAG\t"
    "CCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCAG\t.\t.\t"
    "TRID=TR1;END=10061;MOTIFS=CAG;STRUC=<TR>\t"
    "GT:AL:ALLR:SD:MC:MS:AP:AM\t"
    "1/1:33,33:30-39,33-33:15,14:11,11:0(0-33),0(0-33):"
    "1.000000,1.000000:.,."
)


@pytest.fixture(scope="module")
def run_example(tmp_path_factory, example_dir=None):
    example_dir = "/root/reference/example"
    outdir = tmp_path_factory.mktemp("e2e")
    prefix = str(outdir / "sample")
    from trgt_tpu.cli import main
    rc = main([
        "genotype",
        "--genome", os.path.join(example_dir, "reference.fasta"),
        "--repeats", os.path.join(example_dir, "repeat.bed"),
        "--reads", os.path.join(example_dir, "sample.bam"),
        "--output-prefix", prefix,
    ])
    assert rc == 0
    return prefix


def test_vcf_golden_record(run_example):
    data = BgzfReader(run_example + ".vcf.gz").read_all().decode()
    records = [l for l in data.splitlines() if not l.startswith("#")]
    assert len(records) == 1
    assert records[0] == GOLDEN_RECORD


def test_vcf_header_shape(run_example):
    data = BgzfReader(run_example + ".vcf.gz").read_all().decode()
    lines = data.splitlines()
    assert lines[0] == "##fileformat=VCFv4.2"
    assert any(l.startswith("##contig=<ID=chrA,length=11061>")
               for l in lines)
    assert any(l.startswith("##trgtVersion=") for l in lines)
    assert any(l.startswith("##trgtCommand=") for l in lines)
    header_cols = [l for l in lines if l.startswith("#CHROM")]
    assert header_cols == [
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsample"]


def test_spanning_bam(run_example):
    bam = BamReader(run_example + ".spanning.bam")
    recs = list(bam)
    # SD is 15,14 → 29 spanning reads written
    assert len(recs) == 29
    for rec in recs:
        aux = rec.aux()
        assert aux["TR"] == "TR1"
        assert "rq" in aux
        assert aux["AL"] in (0, 1)
        assert aux["FL"] == ("I", [50, 50])
        assert "SO" in aux and "EO" in aux
        # reads clipped to their TR span ± 50bp flanks (ALLR is 30-39)
        assert 30 + 100 <= len(rec.seq) <= 39 + 100
    assert "@PG" in bam.header.text and "ID:trgt" in bam.header.text
