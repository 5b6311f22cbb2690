"""Merge pipeline tests (ref: src/merge/strategy/exact.rs:90-230 and the
k-way merge semantics of vcf_processor.rs)."""

import gzip
import os

import pytest

from trgt_tpu.merge.exact import merge_exact
from trgt_tpu.merge.runner import parse_gt, render_gt, run_merge


def U(i):
    return (i, False)


def test_merge_exact_reference_case():
    # port of strategy/exact.rs test_merge_exact
    sample_gts = [
        [[U(1), U(2)]],
        [[U(1), U(2)]],
        [[U(0), U(0)]],
        [[(None, False), (None, False)]],
        [[U(1), U(2)]],
    ]
    sample_alleles = [
        ["CAG", "CAGCAG", "CAGCAGCAG"],
        ["CAG", "CAGCAGCAG", "CA"],
        ["CAG"],
        [],
        ["CAG", "CAGG", "CAGCAG"],
    ]
    out_gts, out_alleles = merge_exact(sample_gts, sample_alleles)
    # alt union sorted by (len, lex), ref first
    assert out_alleles == ["CAG", "CA", "CAGG", "CAGCAG", "CAGCAGCAG"]
    assert out_gts[0] == [[U(3), U(4)]]
    assert out_gts[1] == [[U(4), U(1)]]
    assert out_gts[2] == [[U(0), U(0)]]
    assert out_gts[3] == [[(None, False), (None, False)]]
    assert out_gts[4] == [[U(2), U(3)]]


def test_merge_exact_ref_mismatch():
    with pytest.raises(ValueError, match="Reference alleles do not match"):
        merge_exact([[[U(0)]], [[U(0)]]], [["CAG"], ["CAA"]])


def test_merge_exact_phasing_preserved():
    gts = [[[(0, False), (1, True)]], [[(0, False), (0, True)]]]
    alleles = [["C", "CT"], ["C", "CTT"]]
    out_gts, out_alleles = merge_exact(gts, alleles)
    assert out_gts[0][0] == [(0, False), (1, True)]
    assert render_gt(out_gts[0][0]) == "0|1"


def test_parse_render_gt():
    assert parse_gt("0/1") == [(0, False), (1, False)]
    assert parse_gt("0|1") == [(0, False), (1, True)]
    assert parse_gt(".") == [(None, False)]
    assert parse_gt("./.") == [(None, False), (None, False)]
    assert render_gt(parse_gt("1/2")) == "1/2"


class MergeArgs:
    vcfs = None
    vcf_list = None
    genome_path = None
    output = None
    output_type = None
    skip_n = None
    process_n = None
    print_header = False
    force_single = False
    force_samples = False
    no_version = False
    missing_to_ref = False
    strategy = "exact"
    quit_on_errors = False
    contigs = None


@pytest.fixture
def two_sample_vcfs(tmp_path, example_dir):
    from trgt_tpu.cli import main
    paths = []
    for name in ("alpha", "beta"):
        prefix = str(tmp_path / name)
        rc = main([
            "genotype",
            "--genome", os.path.join(example_dir, "reference.fasta"),
            "--repeats", os.path.join(example_dir, "repeat.bed"),
            "--reads", os.path.join(example_dir, "sample.bam"),
            "--output-prefix", prefix,
            "--sample-name", name,
            "--disable-bam-output",
        ])
        assert rc == 0
        paths.append(prefix + ".vcf.gz")
    return paths


def test_merge_two_samples(tmp_path, two_sample_vcfs):
    args = MergeArgs()
    args.vcfs = two_sample_vcfs
    args.output = str(tmp_path / "merged.vcf")
    run_merge(args)
    with open(args.output) as fh:
        lines = fh.read().splitlines()
    header = [l for l in lines if l.startswith("#CHROM")][0]
    assert header.endswith("alpha\tbeta")
    records = [l for l in lines if not l.startswith("#")]
    assert len(records) == 1
    cols = records[0].split("\t")
    assert cols[0] == "chrA" and cols[1] == "10001"
    assert cols[8] == "GT:AL:ALLR:SD:MC:MS:AP:AM"
    # both samples carry the same genotype data
    assert cols[9] == cols[10]
    assert cols[9].startswith("1/1:33,33:30-39,33-33:15,14:")


def test_merge_duplicate_samples_rejected(tmp_path, two_sample_vcfs,
                                          example_dir):
    args = MergeArgs()
    args.vcfs = [two_sample_vcfs[0], two_sample_vcfs[0]]
    args.output = str(tmp_path / "merged.vcf")
    with pytest.raises(ValueError, match="Duplicate sample ID"):
        run_merge(args)


def test_merge_bcf_output(tmp_path, two_sample_vcfs):
    from trgt_tpu.io.bcf import BcfReader, FLOAT_MISSING
    args = MergeArgs()
    args.vcfs = two_sample_vcfs
    args.output = str(tmp_path / "merged.bcf.gz")
    args.output_type = "b"
    run_merge(args)
    reader = BcfReader(args.output)
    assert reader.samples == ["alpha", "beta"]
    recs = list(reader.records())
    assert len(recs) == 1
    rec = recs[0]
    assert rec["chrom"] == "chrA"
    assert rec["pos"] == 10000  # 0-based
    assert rec["info"]["TRID"] == "TR1"
    assert rec["info"]["END"][1][0] == 10061
    assert rec["qual_bits"] == FLOAT_MISSING
    # GT 1/1 for both samples: encoded (1+1)<<1 = 4
    gt = rec["fmt"]["GT"]
    assert [row for _, row in gt] == [[4, 4], [4, 4]]
    al = rec["fmt"]["AL"]
    assert [row for _, row in al] == [[33, 33], [33, 33]]
    allr = rec["fmt"]["ALLR"]
    assert allr == ["30-39,33-33", "30-39,33-33"]


def test_merge_skip_and_process_n(tmp_path, two_sample_vcfs):
    args = MergeArgs()
    args.vcfs = two_sample_vcfs
    args.output = str(tmp_path / "m.vcf")
    args.skip_n = 1
    run_merge(args)
    records = [l for l in open(args.output) if not l.startswith("#")]
    assert records == []  # only one site, skipped

    args2 = MergeArgs()
    args2.vcfs = two_sample_vcfs
    args2.output = str(tmp_path / "m2.vcf")
    args2.process_n = 1
    run_merge(args2)
    records = [l for l in open(args2.output) if not l.startswith("#")]
    assert len(records) == 1


def test_merge_roundtrip_through_bcf(tmp_path, two_sample_vcfs):
    """VCF → merge to BCF → merge BCF with --force-single → text VCF."""
    args = MergeArgs()
    args.vcfs = two_sample_vcfs
    args.output = str(tmp_path / "merged.bcf.gz")
    args.output_type = "b"
    run_merge(args)

    args2 = MergeArgs()
    args2.vcfs = [args.output]
    args2.output = str(tmp_path / "back.vcf")
    args2.force_single = True
    run_merge(args2)
    lines = [l for l in open(args2.output) if not l.startswith("#")]
    assert len(lines) == 1
    cols = lines[0].rstrip("\n").split("\t")
    assert cols[0] == "chrA" and cols[1] == "10001"
    assert cols[9].startswith("1/1:33,33:30-39,33-33:15,14:")
    assert cols[9] == cols[10]
