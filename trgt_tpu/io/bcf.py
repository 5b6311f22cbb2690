"""BCF2.2 binary VCF writer (replaces htslib's BCF output used by
`trgt merge -O b/u`, ref: src/merge/vcf_writer.rs).

Implements the BCF2 typed-encoding from the VCF/BCF spec §6: a BGZF (or
raw) stream of [l_shared, l_indiv] framed records with the string
dictionary implied by header line order (PASS is FILTER index 0)."""

import re
import struct
from typing import Dict, List, Optional, Sequence, Tuple

from .bgzf import BgzfWriter

INT8_MISSING = -(1 << 7)
INT16_MISSING = -(1 << 15)
INT32_MISSING = -(1 << 31)
INT8_EOV = INT8_MISSING + 1
INT16_EOV = INT16_MISSING + 1
INT32_EOV = INT32_MISSING + 1
FLOAT_MISSING = 0x7F800001
FLOAT_EOV = 0x7F800002


def _typed_descriptor(length: int, btype: int) -> bytes:
    if length < 15:
        return bytes([(length << 4) | btype])
    return bytes([(15 << 4) | btype]) + _typed_int(length)


def _typed_int(v: int) -> bytes:
    if -120 <= v <= 127:
        return bytes([(1 << 4) | 1]) + struct.pack("<b", v)
    if -32760 <= v <= 32767:
        return bytes([(1 << 4) | 2]) + struct.pack("<h", v)
    return bytes([(1 << 4) | 3]) + struct.pack("<i", v)


def _typed_string(s: str) -> bytes:
    data = s.encode()
    return _typed_descriptor(len(data), 7) + data


def _int_width(vals: Sequence[int]) -> int:
    lo = min(vals, default=0)
    hi = max(vals, default=0)
    if -120 <= lo and hi <= 127:
        return 1
    if -32760 <= lo and hi <= 32767:
        return 2
    return 3


def _pack_ints(vals: Sequence[int], width: int,
               sentinel_map: Dict[int, int]) -> bytes:
    fmt = {1: "<b", 2: "<h", 3: "<i"}[width]
    out = b""
    for v in vals:
        out += struct.pack(fmt, sentinel_map.get(v, v))
    return out


def _typed_int_vector(vals: Sequence[int]) -> bytes:
    """Encode a vector that may contain MISSING/EOV int32 sentinels."""
    real = [v for v in vals if v not in (INT32_MISSING, INT32_EOV)]
    width = _int_width(real)
    sentinel = {
        1: {INT32_MISSING: INT8_MISSING, INT32_EOV: INT8_EOV},
        2: {INT32_MISSING: INT16_MISSING, INT32_EOV: INT16_EOV},
        3: {},
    }[width]
    return _typed_descriptor(len(vals), width) + \
        _pack_ints(vals, width, sentinel)


def _typed_float_vector(bits: Sequence[int]) -> bytes:
    # values given as raw uint32 bit patterns (handles MISSING/EOV exactly)
    out = _typed_descriptor(len(bits), 5)
    for b in bits:
        out += struct.pack("<I", b)
    return out


def _f32_bits(v: float) -> int:
    return struct.unpack("<I", struct.pack("<f", v))[0]


class BcfWriter:
    """Writes BCF2.2 from text header lines + per-record field data."""

    def __init__(self, path_or_stdout, header_lines: List[str],
                 uncompressed: bool = False):
        self._header_lines = list(header_lines)
        self._dict: Dict[str, int] = {}
        self._contigs: Dict[str, int] = {}
        self._build_dictionaries()

        text = "\n".join(self._header_lines) + "\n\0"
        payload = b"BCF\x02\x02" + struct.pack("<I", len(text)) + \
            text.encode()
        if path_or_stdout is None:
            import sys
            self._fh = sys.stdout.buffer
            self._owns = False
        elif uncompressed:
            self._fh = open(path_or_stdout, "wb")
            self._owns = True
        else:
            self._fh = BgzfWriter(path_or_stdout)
            self._owns = True
        self._fh.write(payload)

    def _build_dictionaries(self):
        # implicit IDX dictionary: PASS first, then FILTER/INFO/FORMAT IDs
        # in order of appearance (VCF spec §6.2.1)
        self._dict["PASS"] = 0
        next_idx = 1
        contig_idx = 0
        for line in self._header_lines:
            m = re.match(r"^##(FILTER|INFO|FORMAT)=<ID=([^,>]+)", line)
            if m and m.group(2) not in self._dict:
                self._dict[m.group(2)] = next_idx
                next_idx += 1
            m = re.match(r"^##contig=<ID=([^,>]+)", line)
            if m and m.group(1) not in self._contigs:
                self._contigs[m.group(1)] = contig_idx
                contig_idx += 1

    def write_record(self, chrom: str, pos: int, rid: str,
                     alleles: List[str], qual: Optional[float],
                     info: List[Tuple[str, object]],
                     fmt: List[Tuple[str, bytes, int]],
                     n_sample: int) -> None:
        """info: [(key, value)] where value is str | int | list[int].
        fmt: [(key, encoded_values, ...)] — encoded typed vectors covering
        all samples (use encode_* helpers)."""
        shared = b""
        shared += struct.pack("<i", self._contigs[chrom])
        shared += struct.pack("<i", pos)
        rlen = len(alleles[0]) if alleles else 0
        shared += struct.pack("<i", rlen)
        shared += struct.pack("<I", FLOAT_MISSING if qual is None
                              else _f32_bits(qual))
        shared += struct.pack("<HH", len(info), len(alleles))
        shared += struct.pack("<I", (len(fmt) << 24) | n_sample)
        shared += _typed_string(rid) if rid != "." else bytes([0x07])
        for a in alleles:
            shared += _typed_string(a)
        shared += bytes([0x00])  # FILTER: empty vector ('.')
        for key, value in info:
            shared += _typed_int(self._dict[key])
            if isinstance(value, str):
                shared += _typed_string(value)
            elif isinstance(value, int):
                shared += _typed_int(value)
            else:
                shared += _typed_int_vector(list(value))

        indiv = b""
        for key, encoded in fmt:
            indiv += _typed_int(self._dict[key])
            indiv += encoded

        rec = struct.pack("<II", len(shared), len(indiv)) + shared + indiv
        self._fh.write(rec)

    # ---- FORMAT helpers (values for ALL samples, uniform width) ----
    @staticmethod
    def encode_format_ints(per_sample: List[List[int]]) -> bytes:
        width = max(len(v) for v in per_sample)
        flat = []
        for vals in per_sample:
            flat.extend(vals + [INT32_EOV] * (width - len(vals)))
        real = [v for v in flat if v not in (INT32_MISSING, INT32_EOV)]
        w = _int_width(real)
        sentinel = {
            1: {INT32_MISSING: INT8_MISSING, INT32_EOV: INT8_EOV},
            2: {INT32_MISSING: INT16_MISSING, INT32_EOV: INT16_EOV},
            3: {},
        }[w]
        return _typed_descriptor(width, w) + _pack_ints(flat, w, sentinel)

    @staticmethod
    def encode_format_floats(per_sample: List[List[Optional[float]]]
                             ) -> bytes:
        width = max(len(v) for v in per_sample)
        flat_bits = []
        for vals in per_sample:
            bits = [FLOAT_MISSING if v is None else _f32_bits(v)
                    for v in vals]
            bits += [FLOAT_EOV] * (width - len(vals))
            flat_bits.extend(bits)
        out = _typed_descriptor(width, 5)
        for b in flat_bits:
            out += struct.pack("<I", b)
        return out

    @staticmethod
    def encode_format_strings(per_sample: List[str]) -> bytes:
        width = max(1, max(len(s) for s in per_sample))
        out = _typed_descriptor(width, 7)
        for s in per_sample:
            data = s.encode()
            out += data + b"\0" * (width - len(data))
        return out

    @staticmethod
    def encode_format_gt(per_sample: List[List[Tuple[Optional[int], bool]]]
                         ) -> bytes:
        # GT encoding: (allele+1)<<1 | phased; 0 = missing
        width = max(len(v) for v in per_sample)
        flat = []
        for vals in per_sample:
            enc = [(0 if idx is None else ((idx + 1) << 1)) | int(phased)
                   for idx, phased in vals]
            enc += [INT32_EOV] * (width - len(vals))
            flat.append(enc)
        return BcfWriter.encode_format_ints(flat)

    def close(self):
        if self._owns:
            self._fh.close()


class BcfReader:
    """Minimal BCF2.2 reader: header + records decoded back to text-level
    fields (enough to consume our own writer's output and htslib BCF for
    the TRGT field set)."""

    def __init__(self, path: str):
        from .bgzf import BgzfReader
        with open(path, "rb") as fh:
            magic = fh.read(2)
        if magic == b"\x1f\x8b":
            data = BgzfReader(path).read_all()
        else:
            with open(path, "rb") as fh:
                data = fh.read()
        if data[:5] != b"BCF\x02\x02":
            raise IOError(f"Not a BCF2.2 file: {path}")
        l_text = struct.unpack_from("<I", data, 5)[0]
        text = data[9:9 + l_text].split(b"\0")[0].decode()
        self._init_header(text)
        self._data = data
        self._pos = 9 + l_text

    def _init_header(self, text: str) -> None:
        self.header_lines = [l for l in text.splitlines() if l]
        self.samples = []
        for line in self.header_lines:
            if line.startswith("#CHROM"):
                self.samples = line.split("\t")[9:]
        # rebuild dictionaries
        self._idx_to_key: Dict[int, str] = {0: "PASS"}
        self._rid_to_contig: Dict[int, str] = {}
        next_idx = 1
        contig_idx = 0
        for line in self.header_lines:
            m = re.match(r"^##(FILTER|INFO|FORMAT)=<ID=([^,>]+)", line)
            if m and m.group(2) not in self._idx_to_key.values():
                self._idx_to_key[next_idx] = m.group(2)
                next_idx += 1
            m = re.match(r"^##contig=<ID=([^,>]+)", line)
            if m:
                self._rid_to_contig[contig_idx] = m.group(1)
                contig_idx += 1

    def _read_typed(self, data, pos):
        desc = data[pos]
        pos += 1
        length = desc >> 4
        btype = desc & 0xF
        if length == 15:
            length, pos = self._read_typed_scalar(data, pos)
        if btype == 0:
            return None, pos
        if btype == 7:
            val = data[pos:pos + length].split(b"\0")[0].decode()
            return val, pos + length
        width = {1: 1, 2: 2, 3: 4, 5: 4}[btype]
        fmt = {1: "<b", 2: "<h", 3: "<i", 5: "<I"}[btype]
        vals = [struct.unpack_from(fmt, data, pos + i * width)[0]
                for i in range(length)]
        return (btype, vals), pos + length * width

    def _read_typed_scalar(self, data, pos):
        desc = data[pos]
        pos += 1
        btype = desc & 0xF
        width = {1: 1, 2: 2, 3: 4}[btype]
        fmt = {1: "<b", 2: "<h", 3: "<i"}[btype]
        return struct.unpack_from(fmt, data, pos)[0], pos + width

    def records(self):
        data = self._data
        pos = self._pos
        n = len(data)
        while pos + 8 <= n:
            l_shared, l_indiv = struct.unpack_from("<II", data, pos)
            start = pos + 8
            end = start + l_shared + l_indiv
            rec = self._decode_record(data, start, start + l_shared, end)
            yield rec
            pos = end

    def close(self):
        pass

    def _decode_record(self, data, pos, shared_end, end):
        rid_i, rpos, rlen = struct.unpack_from("<iii", data, pos)
        qual_bits = struct.unpack_from("<I", data, pos + 12)[0]
        n_info, n_allele = struct.unpack_from("<HH", data, pos + 16)
        n_fmt_sample = struct.unpack_from("<I", data, pos + 20)[0]
        n_fmt = n_fmt_sample >> 24
        n_sample = n_fmt_sample & 0xFFFFFF
        p = pos + 24
        rec_id, p = self._read_typed(data, p)
        alleles = []
        for _ in range(n_allele):
            a, p = self._read_typed(data, p)
            alleles.append(a)
        _filters, p = self._read_typed(data, p)
        info = {}
        for _ in range(n_info):
            key_t, p = self._read_typed(data, p)
            key = self._idx_to_key[key_t[1][0]]
            val, p = self._read_typed(data, p)
            info[key] = val
        # indiv
        p = shared_end
        fmt = {}
        while p < end and len(fmt) < n_fmt:
            key_t, p = self._read_typed(data, p)
            key = self._idx_to_key[key_t[1][0]]
            desc = data[p]
            length = desc >> 4
            btype = desc & 0xF
            p += 1
            if length == 15:
                length, p = self._read_typed_scalar(data, p)
            if btype == 7:
                vals = []
                for s in range(n_sample):
                    vals.append(data[p:p + length].split(b"\0")[0].decode())
                    p += length
            else:
                width = {1: 1, 2: 2, 3: 4, 5: 4}[btype]
                f = {1: "<b", 2: "<h", 3: "<i", 5: "<I"}[btype]
                vals = []
                for s in range(n_sample):
                    row = [struct.unpack_from(f, data,
                                              p + i * width)[0]
                           for i in range(length)]
                    p += length * width
                    vals.append((btype, row))
            fmt[key] = vals
        return dict(
            chrom=self._rid_to_contig.get(rid_i, str(rid_i)),
            pos=rpos, rlen=rlen, id=rec_id or ".",
            alleles=alleles, qual_bits=qual_bits, info=info, fmt=fmt,
            n_sample=n_sample)


class BcfStreamReader(BcfReader):
    """Streaming BCF2.2 reader: the header is parsed eagerly, records
    decode one at a time from an incrementally-inflated BGZF stream —
    merge memory stays flat in input size (VERDICT r4 next #7; the
    reference reads BCF through htslib per-contig iterators with the
    same property, src/merge/vcf_processor.rs:237-337)."""

    def __init__(self, path: str):
        from .bgzf import BgzfReader
        with open(path, "rb") as fh:
            magic = fh.read(2)
        if magic == b"\x1f\x8b":
            self._stream = BgzfReader(path)
        else:
            self._stream = open(path, "rb")
        head = self._stream.read(9)
        if head[:5] != b"BCF\x02\x02":
            self._stream.close()
            raise IOError(f"Not a BCF2.2 file: {path}")
        l_text = struct.unpack_from("<I", head, 5)[0]
        text = self._stream.read(l_text).split(b"\0")[0].decode()
        self._init_header(text)

    def close(self):
        self._stream.close()

    def records(self):
        while True:
            hdr = self._stream.read(8)
            if len(hdr) < 8:
                return
            l_shared, l_indiv = struct.unpack_from("<II", hdr, 0)
            buf = self._stream.read(l_shared + l_indiv)
            if len(buf) < l_shared + l_indiv:
                raise IOError("Truncated BCF record")
            yield self._decode_record(buf, 0, l_shared, len(buf))
