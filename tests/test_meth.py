"""Methylation (MM/ML) extraction tests (ref: src/trgt/reads/read.rs
tests at 171-205) and CpG clipping behavior."""

from trgt_tpu.io.bam import BamRecord
from trgt_tpu.reads.hifi_read import extract_meth
from trgt_tpu.reads.clip import _clip_meth


def make_rec(bases: str, mm: str, ml, reverse: bool = False) -> BamRecord:
    import struct
    aux = b""
    aux += b"MM" + b"Z" + mm.encode() + b"\0"
    aux += b"ML" + b"B" + b"C" + struct.pack("<I", len(ml)) + bytes(ml)
    return BamRecord(
        ref_id=0, pos=0, mapq=60, flag=0x10 if reverse else 0,
        qname="test", cigar=[], seq=bases, qual=b"(" * len(bases),
        aux_raw=aux)


def test_basemods_error():
    rec = make_rec("ACGTCG", "no", [42])
    assert extract_meth(rec, b"ACGTCG") is None


def test_matching_modifications():
    bases = "AGTCTAGACTCCGTAATTACTCGCCTAG"
    rec = make_rec(bases, "C+m,3,1;", [249, 4])
    assert extract_meth(rec, bases.encode()) == bytes([249, 4])


def test_reverse_strand_modifications():
    # Reverse read: stored seq is revcomp of the original; MM counts G
    # complements from the 3' end of the stored sequence.
    bases = "ACGTACGT"  # CpGs at stored positions 1, 5 (G at 2, 6)
    rec = make_rec(bases, "C+m,0,0;", [200, 100], reverse=True)
    meth = extract_meth(rec, bases.encode())
    assert meth is not None
    assert len(meth) == 2


def test_no_mm_tag():
    rec = BamRecord(ref_id=0, pos=0, mapq=60, flag=0, qname="r",
                    cigar=[], seq="ACGCG", qual=b"((((( ", aux_raw=b"")
    assert extract_meth(rec, b"ACGCG") is None


def test_clip_meth():
    # bases with CpGs at 0 and 4; clip to [3, 6) keeps only the second
    bases = b"CGTACGT"
    meth = bytes([10, 20])
    assert _clip_meth(bases, meth, 0, 7) == bytes([10, 20])
    assert _clip_meth(bases, meth, 3, 7) == bytes([20])
    assert _clip_meth(bases, meth, 1, 3) == b""
    assert _clip_meth(bases, None, 0, 7) is None
