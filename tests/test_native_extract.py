"""Native (C++) vs Python twin equality for fused read extraction+clip.

The native path (trgt_tpu/reads/native_extract.py + native/bamcodec.cpp
trgt_extract_reads) must produce bit-identical HiFiRead lists to the
Python implementation (workflow.extract_reads + clip_reads)."""

import os

import pytest

from tests.synth import SynthLocus, make_dataset, mm_ml_for
from trgt_tpu.engine.workflow import (Params, clip_reads, extract_reads)
from trgt_tpu.io.bam import BamReader
from trgt_tpu.io.bam_write import BamWriter
from trgt_tpu.reads.native_extract import (extract_and_clip_native,
                                           native_extract_available)
from trgt_tpu.utils import GenomicRegion

EXAMPLE = "/root/reference/example"


class FakeLocus:
    def __init__(self, contig, start, end, lid="L1"):
        self.id = lid
        self.region = GenomicRegion(contig, start, end)


def params(min_rq=-1.0, flank=250, max_depth=250):
    return Params(min_flank_id_frac=0.7, min_read_qual=min_rq,
                  search_flank_len=flank, max_depth=max_depth)


def assert_reads_equal(native, python):
    assert len(native) == len(python)
    for a, b in zip(native, python):
        assert a.id == b.id
        assert a.is_reverse == b.is_reverse
        assert a.bases == b.bases
        assert a.quals == b.quals
        assert a.meth == b.meth, a.id
        assert a.read_qual == b.read_qual
        assert a.mismatch_offsets == b.mismatch_offsets
        assert a.start_offset == b.start_offset
        assert a.end_offset == b.end_offset
        assert a.hp_tag == b.hp_tag
        assert a.mapq == b.mapq
        assert (a.cigar is None) == (b.cigar is None)
        if a.cigar is not None:
            assert a.cigar.ref_pos == b.cigar.ref_pos
            assert a.cigar.ops == b.cigar.ops


def both_paths(bam_path, locus, p):
    bam = BamReader(bam_path)
    if not native_extract_available(bam):
        pytest.skip("native codec unavailable")
    native = extract_and_clip_native(locus, bam, p,
                                     2 * p.search_flank_len)
    assert native is not None
    bam2 = BamReader(bam_path)
    py = clip_reads(locus, 2 * p.search_flank_len,
                    extract_reads(locus, bam2, p))
    return native, py


def test_example_bam_equality():
    locus = FakeLocus("chrA", 10001, 10061, "TR1")
    for min_rq in (-1.0, 0.98):
        native, py = both_paths(os.path.join(EXAMPLE, "sample.bam"),
                                locus, params(min_rq=min_rq))
        assert len(py) > 0
        assert_reads_equal(native, py)


def test_synth_meth_equality(tmp_path):
    loci = [SynthLocus("S1", "CAG", 12, (12, 18)),
            SynthLocus("S2", "ATTCT", 8, (8, 30))]
    fasta, bed, bam_path = make_dataset(str(tmp_path), loci, depth=14,
                                        meth_prob=200)
    with open(bed) as fh:
        for line in fh:
            chrom, start, end, _info = line.split("\t")
            locus = FakeLocus(chrom, int(start), int(end))
            native, py = both_paths(bam_path, locus, params(flank=200))
            assert len(py) > 0
            assert any(r.meth for r in py)
            assert_reads_equal(native, py)


def test_synth_error_reads_equality(tmp_path):
    loci = [SynthLocus("E1", "CAG", 10, (10, 16))]
    fasta, bed, bam_path = make_dataset(str(tmp_path), loci, depth=10,
                                        error_rate=0.02, seed=3)
    with open(bed) as fh:
        chrom, start, end, _info = fh.readline().split("\t")
    locus = FakeLocus(chrom, int(start), int(end))
    native, py = both_paths(bam_path, locus, params(flank=200))
    assert len(py) > 0
    assert_reads_equal(native, py)


def test_handcrafted_reverse_softclip_hp(tmp_path):
    """Reverse-strand MM/ML, soft clips, X ops (mismatch offsets), HP
    tags, rq filtering — the corners the generator doesn't hit."""
    chrom = "chrT"
    bam_path = str(tmp_path / "hand.bam")
    header = f"@HD\tVN:1.5\tSO:coordinate\n@SQ\tSN:{chrom}\tLN:100000\n"
    w = BamWriter(bam_path, header, [(chrom, 100000)], build_index=True)

    seq1 = "ACGT" * 50 + "CG" * 30 + "TTGCA" * 40
    # forward, soft-clipped both ends, X mismatches outside the region
    cigar1 = [(10, "S"), (30, "="), (4, "X"), (len(seq1) - 64, "="),
              (20, "S")]
    mm = mm_ml_for(seq1, 150)
    aux1 = [("rq", "f", 0.95), ("HP", "i", 1)] + (mm or [])
    w.write_record("fwd1", 0, 0, 4950, 60, cigar1, seq1,
                   bytes([30] * len(seq1)), aux1)

    # reverse-strand read with MM/ML in original-orientation coords
    seq2 = "TTACG" * 30 + "CG" * 25 + "GGCAT" * 30
    import re
    # original orientation = revcomp of stored seq
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    orig = "".join(comp[c] for c in reversed(seq2))
    g_positions = [i for i, ch in enumerate(orig) if ch == "C"]
    # mark every C in original orientation whose stored position is a CpG G
    deltas, prev = [], -1
    for r, p in enumerate(g_positions):
        stored = len(orig) - 1 - p
        if stored > 0 and seq2[stored - 1] == "C" and seq2[stored] == "G":
            deltas.append(r - prev - 1)
            prev = r
    aux2 = [("rq", "f", 0.99)]
    if deltas:
        aux2.append(("MM", "Z", "C+m," + ",".join(map(str, deltas)) + ";"))
        aux2.append(("ML", "B", ("C", [99] * len(deltas))))
    w.write_record("rev1", 16, 0, 4990, 55, [(len(seq2), "M")], seq2,
                   bytes([35] * len(seq2)), aux2)

    # low-rq read (filtered at min_rq=0.98)
    seq3 = "ACGT" * 100
    w.write_record("lowq", 0, 0, 4960, 50, [(len(seq3), "M")], seq3,
                   bytes([20] * len(seq3)), [("rq", "f", 0.5)])
    w.close()

    locus = FakeLocus(chrom, 5050, 5120)
    for min_rq in (-1.0, 0.98):
        native, py = both_paths(bam_path, locus,
                                params(min_rq=min_rq, flank=40))
        assert_reads_equal(native, py)
    native, py = both_paths(bam_path, locus, params(min_rq=-1.0, flank=40))
    assert len(py) == 3
    assert any(r.is_reverse and r.meth for r in py)
    assert any(r.mismatch_offsets for r in py)
    assert any(r.hp_tag == 1 for r in py)


def test_reservoir_equality(tmp_path):
    """Above 3×max_depth the reservoir replay must keep the exact same
    reads in the exact same order as the Python twin."""
    loci = [SynthLocus("R1", "CAG", 10, (10, 14))]
    fasta, bed, bam_path = make_dataset(str(tmp_path), loci, depth=40,
                                        seed=7)
    with open(bed) as fh:
        chrom, start, end, _info = fh.readline().split("\t")
    locus = FakeLocus(chrom, int(start), int(end))
    p = params(flank=200, max_depth=10)   # threshold 30 < 40 reads
    native, py = both_paths(bam_path, locus, p)
    assert len(py) == 30
    assert_reads_equal(native, py)
