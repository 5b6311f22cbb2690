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


def test_plot_pdf_vector(genotyped, tmp_path):
    """PDF output is true vector (FlateDecode content stream with path
    operators), not a rasterized image."""
    import zlib
    import re
    example_dir = "/root/reference/example"
    out = str(tmp_path / "allele.pdf")
    rc = main([
        "plot",
        "--genome", os.path.join(example_dir, "reference.fasta"),
        "--repeats", os.path.join(example_dir, "repeat.bed"),
        "--vcf", genotyped + ".vcf.gz",
        "--spanning-reads", genotyped + ".spanning.bam",
        "--repeat-id", "TR1",
        "--image", out,
        "--plot-type", "allele",
    ])
    assert rc == 0
    data = open(out, "rb").read()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    m = re.search(rb"stream\n(.*?)\nendstream", data, re.S)
    content = zlib.decompress(m.group(1)).decode("latin-1")
    # vector drawing ops: rects, fills, text with the legend font
    assert " re\n" in content or " re " in content.replace("\n", " ")
    assert "Tj" in content and "/F1" in content
    # the CAG motif color (#1383C6 -> 0.07 0.51 0.78 rg)
    assert "0.07 0.51 0.78 rg" in content
    # no embedded raster images
    assert b"/Image" not in data and b"/DCTDecode" not in data


def test_plot_pdf_embedded_font(genotyped, tmp_path):
    """When a system monospace TTF exists the PDF embeds it whole
    (FontFile2 + TrueType descriptor with real metrics) instead of
    relying on base-14 Courier (ref: pipeplot bundles RobotoMono-Bold,
    crates/pipeplot/src/common.rs:3-10)."""
    from trgt_tpu.plot import vector_pdf
    if vector_pdf._load_ttf() is None:
        import pytest
        pytest.skip("no system TTF available")
    example_dir = "/root/reference/example"
    out = str(tmp_path / "allele_font.pdf")
    rc = main([
        "plot",
        "--genome", os.path.join(example_dir, "reference.fasta"),
        "--repeats", os.path.join(example_dir, "repeat.bed"),
        "--vcf", genotyped + ".vcf.gz",
        "--spanning-reads", genotyped + ".spanning.bam",
        "--repeat-id", "TR1",
        "--image", out,
        "--plot-type", "allele",
    ])
    assert rc == 0
    data = open(out, "rb").read()
    assert b"/FontFile2" in data
    assert b"/DejaVuSansMono-Bold" in data
    assert b"/WinAnsiEncoding" in data
    # the embedded program must round-trip back to a valid sfnt header
    import re, zlib
    m = re.search(rb"/Length1 (\d+) /Filter /FlateDecode >>\n"
                  rb"stream\n(.*?)\nendstream", data, re.S)
    assert m is not None
    font = zlib.decompress(m.group(2))
    assert len(font) == int(m.group(1))
    assert font[:4] in (b"\x00\x01\x00\x00", b"true")
