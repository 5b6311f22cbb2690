"""CRAM 3.0 reader/writer: rANS codec roundtrip, record roundtrip vs
BAM, fetch via .crai, and genotype-pipeline equality on CRAM input."""

import os
import random
import subprocess
import sys

import pytest

from tests.synth import SynthLocus, make_dataset
from trgt_tpu.io.bam import BamReader
from trgt_tpu.io.cram import CramReader, rans_decode
from trgt_tpu.io.cram_write import CramWriter, itf8, ltf8, rans_encode
from trgt_tpu.io.cram import ByteStream


def test_itf8_ltf8_roundtrip():
    for v in (0, 1, 127, 128, 255, 16383, 16384, 1 << 20, 1 << 27,
              (1 << 31) - 1, -1, -2):
        bs = ByteStream(itf8(v))
        assert bs.itf8() == v, v
    for v in (0, 127, 128, 1 << 14, 1 << 20, 1 << 35, 1 << 47,
              (1 << 63) - 1, 1 << 55, -1):
        bs = ByteStream(ltf8(v))
        assert bs.ltf8() == v, v


@pytest.mark.parametrize("order", [0, 1])
def test_rans_roundtrip(order):
    rng = random.Random(11)
    cases = [
        b"",
        b"A",
        b"AAAAAAA",
        bytes(rng.choice(b"ACGT") for _ in range(1000)),
        bytes(rng.randrange(256) for _ in range(777)),
        bytes([7] * 4096),
        bytes(rng.choice(b"\x00\x01") for _ in range(63)),
    ]
    for data in cases:
        enc = rans_encode(data, order=order)
        assert rans_decode(enc) == data, (order, data[:20])
        # native C++ decoder == Python twin on every case
        from trgt_tpu.io import native as _native
        from trgt_tpu.io.cram import rans_decode_py
        if _native.get_lib() is not None:
            assert _native.rans_decode(enc) == data, (order, data[:20])
        assert rans_decode_py(enc) == data, (order, data[:20])


def _mk_cram_from_bam(bam_path, fasta, cram_path):
    bam = BamReader(bam_path)
    writer = CramWriter(cram_path, bam.header.text,
                        bam.header.references, fasta)
    n = 0
    for rec in bam:
        aux = []
        for tag, val in rec.aux().items():
            if isinstance(val, float):
                aux.append((tag, "f", val))
            elif isinstance(val, int):
                aux.append((tag, "i", val))
            elif isinstance(val, tuple):
                aux.append((tag, "B", val))
            else:
                aux.append((tag, "Z", val))
        writer.write_record(rec.qname, rec.flag, rec.ref_id, rec.pos,
                            rec.mapq, rec.cigar, rec.seq, rec.qual, aux)
        n += 1
    writer.close()
    return n


def _norm_cigar(cigar):
    """Collapse M/=/X into M runs (CRAM does not preserve =/X)."""
    out = []
    for length, op in cigar:
        op = "M" if op in "=X" else op
        if out and out[-1][1] == op:
            out[-1] = (out[-1][0] + length, op)
        else:
            out.append((length, op))
    return out


def test_cram_roundtrip_synth(tmp_path):
    loci = [SynthLocus("C1", "CAG", 12, (12, 18)),
            SynthLocus("C2", "ATTCT", 8, (8, 30))]
    fasta, bed, bam_path = make_dataset(str(tmp_path), loci, depth=10,
                                        meth_prob=200)
    cram_path = str(tmp_path / "reads.cram")
    n = _mk_cram_from_bam(bam_path, fasta, cram_path)
    assert n > 0
    bam_recs = list(BamReader(bam_path))
    cram_recs = list(CramReader(cram_path, fasta))
    assert len(cram_recs) == n == len(bam_recs)
    for b, c in zip(bam_recs, cram_recs):
        assert c.qname == b.qname
        assert c.flag == b.flag
        assert c.ref_id == b.ref_id
        assert c.pos == b.pos
        assert c.mapq == b.mapq
        assert c.seq == b.seq
        assert bytes(c.qual) == bytes(b.qual)
        assert _norm_cigar(c.cigar) == _norm_cigar(b.cigar)
        assert c.aux() == b.aux()


def test_cram_roundtrip_errors_and_clips(tmp_path):
    """Mismatches (X features), soft clips, deletions/insertions."""
    loci = [SynthLocus("E1", "CAG", 10, (8, 16))]
    fasta, bed, bam_path = make_dataset(str(tmp_path), loci, depth=8,
                                        error_rate=0.03, seed=5)
    cram_path = str(tmp_path / "reads.cram")
    _mk_cram_from_bam(bam_path, fasta, cram_path)
    for b, c in zip(BamReader(bam_path), CramReader(cram_path, fasta)):
        assert c.seq == b.seq, b.qname
        assert _norm_cigar(c.cigar) == _norm_cigar(b.cigar)


def test_cram_fetch(tmp_path):
    loci = [SynthLocus("F1", "CAG", 10, (10, 14)),
            SynthLocus("F2", "CTG", 9, (9, 9))]
    fasta, bed, bam_path = make_dataset(str(tmp_path), loci, depth=6)
    cram_path = str(tmp_path / "reads.cram")
    _mk_cram_from_bam(bam_path, fasta, cram_path)
    assert os.path.exists(cram_path + ".crai")
    bam = BamReader(bam_path)
    cram = CramReader(cram_path, fasta)
    with open(bed) as fh:
        for line in fh:
            chrom, start, end, _ = line.split("\t")
            beg, fin = int(start) - 100, int(end) + 100
            b_names = sorted(r.qname for r in bam.fetch(chrom, beg, fin))
            c_names = sorted(r.qname for r in cram.fetch(chrom, beg, fin))
            assert b_names == c_names
            assert len(b_names) > 0


def test_genotype_cram_equals_bam(tmp_path):
    """End-to-end: `genotype` on CRAM input produces the same VCF body
    as on the BAM it was converted from."""
    from trgt_tpu.cli import main
    loci = [SynthLocus("G1", "CAG", 12, (12, 20))]
    fasta, bed, bam_path = make_dataset(str(tmp_path), loci, depth=12,
                                        meth_prob=150)
    cram_path = str(tmp_path / "reads.cram")
    _mk_cram_from_bam(bam_path, fasta, cram_path)
    outs = {}
    for label, reads in (("bam", bam_path), ("cram", cram_path)):
        prefix = str(tmp_path / f"out_{label}")
        rc = main(["genotype", "--genome", fasta, "--repeats", bed,
                   "--reads", reads, "--output-prefix", prefix,
                   "--device", "host"])
        assert rc == 0
        import gzip
        with gzip.open(prefix + ".vcf.gz", "rt") as fh:
            outs[label] = [ln for ln in fh if not ln.startswith("##")]
    assert outs["bam"] == outs["cram"]
    assert any("\tGT:" in ln or "GT:AL" in ln for ln in outs["bam"])


def test_cram_corrupt_block_crc_raises(tmp_path):
    """A flipped byte inside a CRAM container must surface as an
    IOError (block CRC32 verification, ADVICE r2) — never as silently
    wrong reads."""
    import pytest

    loci = [SynthLocus("CC", "CAG", 12, (12, 18))]
    fasta, bed, bam_path = make_dataset(str(tmp_path), loci, depth=10)
    cram_path = str(tmp_path / "reads.cram")
    n = _mk_cram_from_bam(bam_path, fasta, cram_path)
    assert n > 0
    clean = list(CramReader(cram_path, fasta))
    data = bytearray(open(cram_path, "rb").read())
    # corrupt a byte deep in the data-containers region (past the magic
    # + file header container); try several offsets — each must either
    # raise or (if it landed in padding) reproduce the clean records
    saw_error = False
    for frac in (0.5, 0.6, 0.7, 0.8):
        corrupt = bytearray(data)
        corrupt[int(len(data) * frac)] ^= 0x41
        bad_path = str(tmp_path / f"bad_{frac}.cram")
        open(bad_path, "wb").write(bytes(corrupt))
        try:
            recs = list(CramReader(bad_path, fasta))
        except Exception:
            saw_error = True
            continue
        assert [(r.qname, r.seq) for r in recs] == \
            [(r.qname, r.seq) for r in clean]
    assert saw_error, "no corruption was detected at any offset"
