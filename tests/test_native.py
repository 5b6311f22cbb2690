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
