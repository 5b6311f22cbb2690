"""BAM writer (replaces htslib BAM output; ref: src/trgt/writers/write_bam.rs)."""

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from .bgzf import BgzfWriter
from .bam import BamHeader, reg2bin, CIGAR_OPS

SEQ_NT16_CODE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}
CIGAR_OP_CODE = {op: i for i, op in enumerate(CIGAR_OPS)}

# ASCII byte → 4-bit nibble code (unknown → 15 = N), upper+lower case
_NT16_TABLE = bytearray([15]) * 256
for _c, _i in SEQ_NT16_CODE.items():
    _NT16_TABLE[ord(_c)] = _i
    _NT16_TABLE[ord(_c.lower())] = _i
_NT16_TABLE = bytes(_NT16_TABLE)


def pack_seq(seq: str) -> bytes:
    """4-bit pack a sequence (vectorized; the per-record hot path)."""
    l_seq = len(seq)
    codes = seq.encode("ascii").translate(_NT16_TABLE)
    if l_seq % 2:
        codes += b"\0"
    arr = np.frombuffer(codes, dtype=np.uint8)
    return ((arr[0::2] << 4) | arr[1::2]).tobytes()


def encode_aux(tag: str, typ: str, value) -> bytes:
    out = tag.encode("ascii") + typ.encode("ascii")
    if typ == "A":
        return out + value.encode("ascii")
    if typ == "c":
        return out + struct.pack("<b", value)
    if typ == "C":
        return out + struct.pack("<B", value)
    if typ == "s":
        return out + struct.pack("<h", value)
    if typ == "S":
        return out + struct.pack("<H", value)
    if typ == "i":
        return out + struct.pack("<i", value)
    if typ == "I":
        return out + struct.pack("<I", value)
    if typ == "f":
        return out + struct.pack("<f", value)
    if typ in "ZH":
        return out + value.encode("ascii") + b"\0"
    if typ == "B":
        sub, vals = value
        fmt = {"c": "b", "C": "B", "s": "h", "S": "H",
               "i": "i", "I": "I", "f": "f"}[sub]
        return out + sub.encode("ascii") + struct.pack("<I", len(vals)) + \
            struct.pack(f"<{len(vals)}{fmt}", *vals)
    raise ValueError(f"Unknown aux type: {typ}")


class BaiBuilder:
    """Builds a .bai index for records written in sorted order
    (replaces `samtools index` for our own sorted outputs)."""

    def __init__(self, n_ref: int):
        self.bins = [dict() for _ in range(n_ref)]     # bin -> [chunks]
        self.linear = [dict() for _ in range(n_ref)]   # window -> min voff

    def add(self, ref_id: int, pos: int, ref_end: int, voff_start: int,
            voff_end: int) -> None:
        if ref_id < 0:
            return
        b = reg2bin(pos, max(ref_end, pos + 1))
        chunks = self.bins[ref_id].setdefault(b, [])
        if chunks and chunks[-1][1] == voff_start:
            chunks[-1] = (chunks[-1][0], voff_end)
        else:
            chunks.append((voff_start, voff_end))
        for w in range(pos >> 14, (max(ref_end, pos + 1) - 1 >> 14) + 1):
            cur = self.linear[ref_id].get(w)
            if cur is None or voff_start < cur:
                self.linear[ref_id][w] = voff_start

    def write(self, path: str) -> None:
        out = [b"BAI\x01", struct.pack("<i", len(self.bins))]
        for bins, linear in zip(self.bins, self.linear):
            out.append(struct.pack("<i", len(bins)))
            for bin_id in sorted(bins):
                chunks = bins[bin_id]
                out.append(struct.pack("<Ii", bin_id, len(chunks)))
                for beg, end in chunks:
                    out.append(struct.pack("<QQ", beg, end))
            n_intv = max(linear, default=-1) + 1
            out.append(struct.pack("<i", n_intv))
            filled = 0
            for w in range(n_intv):
                v = linear.get(w)
                if v is not None:
                    filled = v
                out.append(struct.pack("<Q", v if v is not None else filled))
        with open(path, "wb") as fh:
            fh.write(b"".join(out))


class BamWriter:
    def __init__(self, path: str, header_text: str,
                 references: List[Tuple[str, int]],
                 build_index: bool = False):
        self._bgzf = BgzfWriter(path)
        self._path = path
        self._bai = BaiBuilder(len(references)) if build_index else None
        self.header = BamHeader(header_text, references)
        text = header_text.encode("utf-8")
        body = b"BAM\x01" + struct.pack("<i", len(text)) + text
        body += struct.pack("<i", len(references))
        for name, length in references:
            nb = name.encode("ascii") + b"\0"
            body += struct.pack("<i", len(nb)) + nb + struct.pack("<i", length)
        self._bgzf.write(body)

    def write_record(self, qname: str, flag: int, ref_id: int, pos: int,
                     mapq: int, cigar: Optional[List[Tuple[int, str]]],
                     seq: str, qual: bytes,
                     aux: List[Tuple[str, str, object]]):
        cigar = cigar or []
        qname_b = qname.encode("ascii") + b"\0"
        n_cigar = len(cigar)
        l_seq = len(seq)
        if cigar:
            ref_len = sum(length for length, op in cigar if op in "MDN=X")
            bin_v = reg2bin(pos, pos + max(1, ref_len))
        else:
            bin_v = reg2bin(pos, pos + 1)
        parts = [
            struct.pack("<iiBBHHHIiii", ref_id, pos, len(qname_b), mapq,
                        bin_v, n_cigar, flag, l_seq, -1, -1, 0),
            qname_b,
            struct.pack(f"<{n_cigar}I",
                        *((length << 4) | CIGAR_OP_CODE[op]
                          for length, op in cigar)),
            pack_seq(seq),
            bytes(qual),
        ]
        parts.extend(encode_aux(tag, typ, value) for tag, typ, value in aux)
        rec = b"".join(parts)
        voff_start = self._bgzf.tell_virtual()
        self._bgzf.write(struct.pack("<i", len(rec)) + rec)
        if self._bai is not None:
            ref_len = sum(length for length, op in cigar if op in "MDN=X")
            self._bai.add(ref_id, pos, pos + ref_len,
                          voff_start, self._bgzf.tell_virtual())

    def close(self):
        self._bgzf.close()
        if self._bai is not None:
            self._bai.write(self._path + ".bai")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
