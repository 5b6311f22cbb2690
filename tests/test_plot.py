"""Plot (trvz) pipeline tests: end-to-end allele + waterfall plots on the
example dataset outputs."""

import os

import pytest

from trgt_tpu.cli import main


@pytest.fixture(scope="module")
def genotyped(tmp_path_factory):
    example_dir = "/root/reference/example"
    outdir = tmp_path_factory.mktemp("plot_e2e")
    prefix = str(outdir / "sample")
    rc = main([
        "genotype",
        "--genome", os.path.join(example_dir, "reference.fasta"),
        "--repeats", os.path.join(example_dir, "repeat.bed"),
        "--reads", os.path.join(example_dir, "sample.bam"),
        "--output-prefix", prefix,
    ])
    assert rc == 0
    return prefix


@pytest.mark.parametrize("plot_type", ["allele", "waterfall"])
def test_plot_svg(genotyped, tmp_path, plot_type):
    example_dir = "/root/reference/example"
    out = str(tmp_path / f"{plot_type}.svg")
    rc = main([
        "plot",
        "--genome", os.path.join(example_dir, "reference.fasta"),
        "--repeats", os.path.join(example_dir, "repeat.bed"),
        "--vcf", genotyped + ".vcf.gz",
        "--spanning-reads", genotyped + ".spanning.bam",
        "--repeat-id", "TR1",
        "--image", out,
        "--plot-type", plot_type,
    ])
    assert rc == 0
    data = open(out).read()
    assert data.startswith('<?xml version="1.0"?>')
    assert "<svg" in data and "</svg>" in data
    # motif legend with the CAG color (blue)
    assert "#1383C6" in data
    # flanks drawn in teal
    assert "#009CA2" in data


def test_plot_png(genotyped, tmp_path):
    example_dir = "/root/reference/example"
    out = str(tmp_path / "allele.png")
    rc = main([
        "plot",
        "--genome", os.path.join(example_dir, "reference.fasta"),
        "--repeats", os.path.join(example_dir, "repeat.bed"),
        "--vcf", genotyped + ".vcf.gz",
        "--spanning-reads", genotyped + ".spanning.bam",
        "--repeat-id", "TR1",
        "--image", out,
    ])
    assert rc == 0
    with open(out, "rb") as fh:
        assert fh.read(8) == b"\x89PNG\r\n\x1a\n"


def test_plot_squished_waterfall(genotyped, tmp_path):
    example_dir = "/root/reference/example"
    out = str(tmp_path / "wf.svg")
    rc = main([
        "plot",
        "--genome", os.path.join(example_dir, "reference.fasta"),
        "--repeats", os.path.join(example_dir, "repeat.bed"),
        "--vcf", genotyped + ".vcf.gz",
        "--spanning-reads", genotyped + ".spanning.bam",
        "--repeat-id", "TR1",
        "--image", out,
        "--plot-type", "waterfall",
        "--squished",
        "--max-allele-reads", "5",
    ])
    assert rc == 0
    assert os.path.exists(out)
