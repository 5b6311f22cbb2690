"""Native C++ BGZF codec tests (native/bamcodec.cpp via ctypes)."""

import os

import pytest

from trgt_tpu.io import native
from trgt_tpu.io.bgzf import BgzfReader, BgzfWriter


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native codec unavailable (no g++/zlib)")
    return lib


def test_native_roundtrip(lib, tmp_path):
    data = b"The quick brown fox jumps over the lazy dog\n" * 5000
    comp = native.bgzf_compress(data)
    assert comp is not None
    path = str(tmp_path / "n.gz")
    with open(path, "wb") as fh:
        fh.write(comp)
    # native read of native write
    assert native.bgzf_read_file(path) == data
    # python reader of native write
    with BgzfReader(path) as r:
        assert r.read_all() == data


def test_native_reads_python_write(lib, tmp_path):
    data = os.urandom(200000)
    path = str(tmp_path / "p.gz")
    with BgzfWriter(path) as w:
        w.write(data)
    assert native.bgzf_read_file(path) == data


def test_native_reads_example_bam(lib):
    data = native.bgzf_read_file("/root/reference/example/sample.bam")
    assert data is not None
    assert data[:4] == b"BAM\x01"


def test_decode_seq(lib):
    # A=1, C=2, G=4, T=8 in 4-bit encoding
    packed = bytes([0x12, 0x48])
    assert native.decode_seq(packed, 4) == "ACGT"
    assert native.decode_seq(packed, 3) == "ACG"


def test_rans_decode_rejects_corrupt_table(lib):
    """A corrupted order-0 frequency table (sum != 4096) must fail with
    None, not silently decode garbage (ADVICE r2: validated table +
    zero-init cum; the Python twin raises on the uncovered slot)."""
    from trgt_tpu.io.cram_write import rans_encode
    payload = (b"ACGTACGGTTACGT" * 40)
    for order in (0, 1):
        blob = bytearray(rans_encode(payload, order=order))
        assert native.rans_decode(bytes(blob)) == payload
        # frequency tables start right after the 9-byte header; smash a
        # frequency byte so the table no longer sums to TOTFREQ
        corrupt = bytearray(blob)
        corrupt[10] ^= 0x55
        out = native.rans_decode(bytes(corrupt))
        assert out is None or out == payload  # reject, never garbage
        # truly hostile: claim a symbol table that covers nothing
        corrupt2 = bytearray(blob)
        for i in range(9, min(len(corrupt2), 14)):
            corrupt2[i] = 0xFF
        out2 = native.rans_decode(bytes(corrupt2))
        assert out2 is None or out2 == payload


def test_rans_decode_matches_python_on_corrupt_inputs(lib):
    """Fuzz: on random single-byte corruptions the native decoder never
    returns a 'successful' result that differs from the Python twin's
    (both may reject; neither may silently diverge... the native side
    may additionally reject inputs Python accepts, which is fine)."""
    import random

    from trgt_tpu.io import cram

    rng = random.Random(7)
    payload = bytes(rng.choice(b"ACGTN") for _ in range(500))
    from trgt_tpu.io.cram_write import rans_encode
    for order in (0, 1):
        blob = rans_encode(payload, order=order)
        for _ in range(60):
            corrupt = bytearray(blob)
            corrupt[rng.randrange(len(corrupt))] ^= (
                1 << rng.randrange(8))
            data = bytes(corrupt)
            native_out = native.rans_decode(data)
            try:
                py_out = cram.rans_decode_py(data)
            except Exception:
                py_out = None
            if native_out is not None and py_out is not None:
                assert native_out == py_out


def test_bamlet_record_encoder_matches_python(lib):
    """The native BAMlet record encoder must be byte-identical to
    write_record with the equivalent aux list (the runner races no one
    here — the fast path simply replaces the Python encoder, so any
    byte difference corrupts the spanning BAM)."""
    import random

    import numpy as np

    from trgt_tpu.io.bam_write import (BamWriter, encode_bamlet_record,
                                       encode_aux, pack_seq,
                                       CIGAR_OP_CODE)
    import struct
    from trgt_tpu.io.bam import reg2bin

    def python_record(qname, flag, ref_id, pos, mapq, cigar, bases,
                      quals, tr_id, rq, meth, mo, hp, so, eo, al, fl):
        # mirror engine/runner.write_spanning_reads' aux list + the
        # body of BamWriter.write_record
        aux = [("TR", "Z", tr_id), ("rq", "f", rq)]
        if meth is not None:
            aux.append(("MC", "B", ("C", meth)))
        if mo is not None:
            aux.append(("MO", "B", ("i", mo)))
        if hp is not None:
            aux.append(("HP", "C", hp))
        aux += [("SO", "i", so), ("EO", "i", eo), ("AL", "i", al),
                ("FL", "B", ("I", [fl, fl]))]
        cigar = cigar or []
        qname_b = qname.encode() + b"\0"
        if cigar:
            ref_len = sum(l for l, op in cigar if op in "MDN=X")
            bin_v = reg2bin(pos, pos + max(1, ref_len))
        else:
            bin_v = reg2bin(pos, pos + 1)
        parts = [
            struct.pack("<iiBBHHHIiii", ref_id, pos, len(qname_b), mapq,
                        bin_v, len(cigar), flag, len(bases), -1, -1, 0),
            qname_b,
            struct.pack(f"<{len(cigar)}I",
                        *((l << 4) | CIGAR_OP_CODE[op]
                          for l, op in cigar)),
            pack_seq(bases.decode()),
            bytes(quals),
        ]
        parts.extend(encode_aux(t, ty, v) for t, ty, v in aux)
        rec = b"".join(parts)
        return struct.pack("<i", len(rec)) + rec

    rng = random.Random(11)
    for trial in range(40):
        L = rng.randrange(1, 300)
        bases = bytes(rng.choice(b"ACGTN") for _ in range(L))
        quals = bytes(rng.randrange(0, 60) for _ in range(L))
        if rng.random() < 0.2:
            cigar = None
        else:
            cigar = [(L, "M")] if rng.random() < 0.5 else \
                [(L // 2, "="), (1, "I"), (L - L // 2 - 1, "X")]
            cigar = [(l, op) for l, op in cigar if l > 0]
        meth = (None if rng.random() < 0.3 else
                np.array([rng.randrange(256) for _ in range(
                    rng.randrange(0, 9))], dtype=np.uint8))
        if meth is not None and rng.random() < 0.5:
            meth = meth.tobytes()       # reads carry meth as raw bytes
        mo = (None if rng.random() < 0.3 else
              np.array([rng.randrange(-500, 500) for _ in range(
                  rng.randrange(0, 12))], dtype=np.int32))
        hp = None if rng.random() < 0.5 else rng.randrange(1, 3)
        args = (f"read/{trial}", rng.choice([0, 16]), rng.randrange(3),
                rng.randrange(1 << 20), rng.randrange(61), cigar, bases,
                quals, f"TR{trial}", rng.choice([-1.0, 0.9921875]),
                meth, mo, hp, rng.randrange(-5, 500),
                rng.randrange(-5, 500), rng.randrange(2), 50)
        native_rec = encode_bamlet_record(*args)
        assert native_rec is not None
        assert native_rec == python_record(*args), trial
