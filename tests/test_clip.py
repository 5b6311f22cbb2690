"""Read clipping tests ported from the reference
(ref: src/trgt/reads/clip_region.rs and clip_bases.rs test modules)."""

import re

import pytest

from trgt_tpu.reads.clip import clip_bases, clip_to_region
from trgt_tpu.reads.hifi_read import Cigar, HiFiRead


def make_cigar(ref_pos, encoding):
    ops = [(int(n), op) for n, op in re.findall(r"(\d+)([MIDNSHP=X])",
                                               encoding)]
    return Cigar(ref_pos=ref_pos, ops=ops)


def make_read(bases, meths, cigar):
    return HiFiRead(
        id="read1", is_reverse=False, bases=bases.encode(),
        quals=b"(" * len(bases), meth=bytes(meths), read_qual=None,
        mismatch_offsets=None, start_offset=0, end_offset=0,
        cigar=cigar, hp_tag=None, mapq=60)


def eq(a, b):
    return (a.bases == b.bases and a.quals == b.quals and a.meth == b.meth
            and a.cigar == b.cigar)


def test_if_no_overlap_then_none():
    cigar = make_cigar(10, "3=2D2=1X2=5I3=")
    read = make_read("CGCTCGTTAAATCACG", [10, 20, 30], cigar)
    assert clip_to_region(read, (0, 10)) is None
    assert clip_to_region(read, (23, 33)) is None


def test_alignment_contained_inside_region():
    cigar = make_cigar(10, "5S3=2D2=1X2=5I3=10S")
    read = make_read("AAAAACGCTCGTTAAATCACGAAAAAAAAAA", [10, 20, 30], cigar)
    clipped = clip_to_region(read, (9, 23))
    assert eq(clipped, read)


def test_overlaps_left_flank():
    cigar = make_cigar(10, "3=2D2=1X2=5I3=")
    read = make_read("CGCTCGTTAAATCACG", [10, 20, 30], cigar)
    clipped = clip_to_region(read, (0, 15))
    expected = make_read("CGC", [10], make_cigar(10, "3=2D"))
    assert eq(clipped, expected)


def test_op_overlaps_flanks():
    cigar = make_cigar(10, "3=2D2=1X2=5I3=")
    read = make_read("CGCTCGTTAAATCACG", [10, 20, 30], cigar)
    clipped = clip_to_region(read, (12, 17))
    expected = make_read("CTC", [20], make_cigar(12, "1=2D2="))
    assert eq(clipped, expected)


def test_op_spans_entire_region():
    cigar = make_cigar(10, "3=2D2=1X2=5I3=")
    read = make_read("CGCTCGTTAAATCACG", [10, 20, 30], cigar)
    clipped = clip_to_region(read, (21, 22))
    expected = make_read("C", [30], make_cigar(21, "1="))
    assert eq(clipped, expected)


def test_alignment_starts_inside_region():
    cigar = make_cigar(10, "3=2D2=1X2=5I3=")
    read = make_read("CGCTCGTTAAATCACG", [10, 20, 30], cigar)
    clipped = clip_to_region(read, (0, 17))
    expected = make_read("CGCTC", [10, 20], make_cigar(10, "3=2D2="))
    assert eq(clipped, expected)


def test_clip_bases_whole_query_none():
    cigar = make_cigar(10, "3=2D2=1X2=5I3=")
    read = make_read("CGCTCGTTAAATCACG", [10, 20, 30], cigar)
    assert clip_bases(read, 16, 0) is None
    assert clip_bases(read, 0, 16) is None
    assert clip_bases(read, 12, 4) is None


def test_clip_bases_from_left():
    cigar = make_cigar(10, "5S3=2D2=1X2=5I3=10S")
    read = make_read("AAAAACGCTCGTTAAATCACGAAAAAAAAAA", [10, 20, 30], cigar)

    expected = make_read("AACGCTCGTTAAATCACGAAAAAAAAAA", [10, 20, 30],
                         make_cigar(10, "2S3=2D2=1X2=5I3=10S"))
    assert eq(clip_bases(read, 3, 0), expected)

    expected = make_read("CGCTCGTTAAATCACGAAAAAAAAAA", [10, 20, 30],
                         make_cigar(10, "3=2D2=1X2=5I3=10S"))
    assert eq(clip_bases(read, 5, 0), expected)

    expected = make_read("GTTAAATCACGAAAAAAAAAA", [30],
                         make_cigar(17, "1X2=5I3=10S"))
    assert eq(clip_bases(read, 10, 0), expected)


def test_clip_bases_from_right():
    cigar = make_cigar(10, "5S3=2D2=1X2=5I3=10S")
    read = make_read("AAAAACGCTCGTTAAATCACGAAAAAAAAAA", [10, 20, 30], cigar)
    expected = make_read("AAAAACGCTCGTTAAATCACGAAAAA", [10, 20, 30],
                         make_cigar(10, "5S3=2D2=1X2=5I3=5S"))
    assert eq(clip_bases(read, 0, 5), expected)
