"""CRAM 3.0 reader (replaces htslib's CRAM input path).

The reference accepts CRAM alignments (rust-htslib IndexedReader with
`set_reference`, ref: src/commands/genotype.rs:35-64); this module
implements the CRAM 3.0 specification from scratch: file definition,
containers, blocks (raw/gzip/rANS4x8), the compression header
(preservation map, data-series encoding map, tag dictionary), slice
decoding with the standard codecs (EXTERNAL, HUFFMAN, BYTE_ARRAY_LEN,
BYTE_ARRAY_STOP, BETA), and reference-based sequence reconstruction.
Decoded records surface as io.bam.BamRecord, so CramReader is a drop-in
for BamReader (including `.fetch` via the .crai index).

Like htslib, reconstructed CIGARs use M for match/mismatch runs (CRAM
stores substitutions as features, not as =/X ops).
"""

import gzip
import io as _io
import struct
import zlib
from typing import Dict, Iterator, List, Optional, Tuple

from .bam import BamHeader, BamRecord

CRAM_MAGIC = b"CRAM"

# block content types
CT_FILE_HEADER = 0
CT_COMPRESSION_HEADER = 1
CT_SLICE_HEADER = 2
CT_EXTERNAL = 4
CT_CORE = 5

# block compression methods
M_RAW = 0
M_GZIP = 1
M_BZIP2 = 2
M_LZMA = 3
M_RANS4x8 = 4

CIGAR_OPS = "MIDNSHP=X"


class ByteStream:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def u8(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def read(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def i32(self) -> int:
        v = struct.unpack_from("<i", self.data, self.pos)[0]
        self.pos += 4
        return v

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def itf8(self) -> int:
        c = self.u8()
        if not (c & 0x80):
            v = c
        elif not (c & 0x40):
            v = ((c & 0x3F) << 8) | self.u8()
        elif not (c & 0x20):
            v = ((c & 0x1F) << 16) | (self.u8() << 8) | self.u8()
        elif not (c & 0x10):
            v = ((c & 0x0F) << 24) | (self.u8() << 16) | \
                (self.u8() << 8) | self.u8()
        else:
            v = ((c & 0x0F) << 28) | (self.u8() << 20) | \
                (self.u8() << 12) | (self.u8() << 4) | (self.u8() & 0x0F)
        # ITF8 carries signed int32
        if v >= 1 << 31:
            v -= 1 << 32
        return v

    def ltf8(self) -> int:
        c = self.u8()
        if not (c & 0x80):
            return c
        n_extra = 0
        prefix_bits = c
        for bit in (0x40, 0x20, 0x10, 0x08, 0x04, 0x02, 0x01):
            n_extra += 1
            if not (prefix_bits & bit):
                break
        else:
            n_extra = 8
        if n_extra < 8:
            mask = (1 << (7 - n_extra)) - 1
            v = c & mask
        else:
            v = 0
        for _ in range(n_extra):
            v = (v << 8) | self.u8()
        if v >= 1 << 63:
            v -= 1 << 64
        return v


class BitReader:
    """MSB-first bit reader over the core block."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 7

    def get_bit(self) -> int:
        b = (self.data[self.pos] >> self.bit) & 1
        if self.bit == 0:
            self.bit = 7
            self.pos += 1
        else:
            self.bit -= 1
        return b

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get_bit()
        return v


# ---------------------------------------------------------------- rANS 4x8

RANS_L = 1 << 23
TOTFREQ = 4096


def _read_symbol_rle(bs: ByteStream):
    """Iterate the symbol stream of a rANS frequency table: ascending
    symbols use an RLE escape (sym, sym+1, runlen). Yields each symbol;
    a literal 0 terminates (spec section 13.4 / htslib rans4x8)."""
    j = bs.u8()
    rle = 0
    while True:
        yield j
        if rle > 0:
            rle -= 1
            j += 1
        else:
            nxt = bs.u8()
            if nxt == j + 1:
                j = nxt
                rle = bs.u8()
            else:
                j = nxt
                if j == 0:
                    return


def _read_freq(bs: ByteStream) -> int:
    f = bs.u8()
    if f >= 0x80:
        f = ((f & 0x7F) << 8) | bs.u8()
    return f


def _read_rans_freqs0(bs: ByteStream) -> Dict[int, int]:
    """Order-0 frequency table (spec section 13.4)."""
    return {sym: _read_freq(bs) for sym in _read_symbol_rle(bs)}


def _cum_table(freqs: Dict[int, int]):
    syms = sorted(freqs)
    cum = {}
    c = 0
    lookup = [0] * TOTFREQ

    for s in syms:
        cum[s] = c

        for i in range(c, min(c + freqs[s], TOTFREQ)):
            lookup[i] = s
        c += freqs[s]
    return cum, lookup


def rans_decode(data: bytes) -> bytes:
    """rANS4x8 block decode (orders 0 and 1), CRAM spec section 13.
    Dispatches to the C++ decoder (native/bamcodec.cpp
    trgt_rans_decode) with this module's pure-Python implementation as
    the behavioural twin / fallback (tests/test_cram.py asserts
    equality)."""
    from . import native as _native
    out = _native.rans_decode(data)
    if out is not None:
        return out
    return rans_decode_py(data)


def rans_decode_py(data: bytes) -> bytes:
    bs = ByteStream(data)
    order = bs.u8()
    _comp_size = bs.i32()
    out_size = bs.i32()
    if order == 0:
        freqs = _read_rans_freqs0(bs)
        cum, lookup = _cum_table(freqs)
        states = [struct.unpack_from("<I", data, bs.pos + 4 * i)[0]
                  for i in range(4)]
        bs.pos += 16
        out = bytearray(out_size)
        pos = bs.pos
        d = data
        for i in range(out_size):
            j = i & 3
            x = states[j]
            s = lookup[x & (TOTFREQ - 1)]
            out[i] = s
            x = freqs[s] * (x >> 12) + (x & (TOTFREQ - 1)) - cum[s]
            while x < RANS_L and pos < len(d):
                x = (x << 8) | d[pos]
                pos += 1
            states[j] = x
        return bytes(out)
    if order != 1:
        raise IOError(f"Unknown rANS order {order}")
    # order-1: per-context tables, 4 states over 4 segments
    ctx_freqs: Dict[int, Dict[int, int]] = {
        sym: _read_rans_freqs0(bs) for sym in _read_symbol_rle(bs)}
    tables = {c: _cum_table(f) for c, f in ctx_freqs.items()}
    states = [struct.unpack_from("<I", data, bs.pos + 4 * i)[0]
              for i in range(4)]
    bs.pos += 16
    pos = bs.pos
    d = data
    out = bytearray(out_size)
    isz4 = out_size >> 2
    ctx = [0, 0, 0, 0]
    offs = [0, isz4, 2 * isz4, 3 * isz4]
    for i in range(isz4):
        for j in range(4):
            x = states[j]
            c = ctx[j]
            freqs = ctx_freqs[c]
            cum, lookup = tables[c]
            s = lookup[x & (TOTFREQ - 1)]
            out[offs[j] + i] = s
            x = freqs[s] * (x >> 12) + (x & (TOTFREQ - 1)) - cum[s]
            while x < RANS_L and pos < len(d):
                x = (x << 8) | d[pos]
                pos += 1
            states[j] = x
            ctx[j] = s
    # remainder handled by state 3
    for i in range(4 * isz4, out_size):
        x = states[3]
        c = ctx[3]
        freqs = ctx_freqs[c]
        cum, lookup = tables[c]
        s = lookup[x & (TOTFREQ - 1)]
        out[i] = s
        x = freqs[s] * (x >> 12) + (x & (TOTFREQ - 1)) - cum[s]
        while x < RANS_L and pos < len(d):
            x = (x << 8) | d[pos]
            pos += 1
        states[3] = x
        ctx[3] = s
    return bytes(out)


# ------------------------------------------------------------------ blocks

class Block:
    __slots__ = ("method", "content_type", "content_id", "data")

    def __init__(self, method, content_type, content_id, data):
        self.method = method
        self.content_type = content_type
        self.content_id = content_id
        self.data = data


def read_block(bs: ByteStream) -> Block:
    start = bs.pos
    method = bs.u8()
    content_type = bs.u8()
    content_id = bs.itf8()
    comp_size = bs.itf8()
    raw_size = bs.itf8()
    payload = bs.read(comp_size)
    # CRAM 3.0: each block ends with the CRC32 of its preceding bytes
    # (header + compressed payload). Verifying here means a corrupt
    # container fails loudly instead of decoding to silently wrong reads
    # (the rANS codec cannot detect all corruptions by itself).
    crc_expected = struct.unpack("<I", bs.read(4))[0]
    crc_actual = zlib.crc32(bs.data[start:start + (bs.pos - 4 - start)])
    if crc_actual != crc_expected:
        raise IOError("CRAM block CRC32 mismatch (corrupt block)")
    if method == M_RAW:
        data = payload
    elif method == M_GZIP:
        data = gzip.decompress(payload)
    elif method == M_RANS4x8:
        data = rans_decode(payload)
    elif method == M_BZIP2:
        import bz2
        data = bz2.decompress(payload)
    elif method == M_LZMA:
        import lzma
        data = lzma.decompress(payload)
    else:
        raise IOError(f"Unsupported CRAM block method {method}")
    if len(data) != raw_size:
        raise IOError("CRAM block raw size mismatch")
    return Block(method, content_type, content_id, data)


# --------------------------------------------------------------- encodings

class Encoding:
    """Decoder for one data series (CRAM spec section 12)."""

    def __init__(self, codec: int, params: bytes):
        self.codec = codec
        bs = ByteStream(params)
        if codec == 0:      # NULL
            pass
        elif codec == 1:    # EXTERNAL
            self.content_id = bs.itf8()
        elif codec == 3:    # HUFFMAN (canonical)
            n = bs.itf8()
            self.alphabet = [bs.itf8() for _ in range(n)]
            m = bs.itf8()
            self.lengths = [bs.itf8() for _ in range(m)]
            self._build_huffman()
        elif codec == 4:    # BYTE_ARRAY_LEN
            len_codec = bs.itf8()
            len_params = bs.read(bs.itf8())
            val_codec = bs.itf8()
            val_params = bs.read(bs.itf8())
            self.len_enc = Encoding(len_codec, len_params)
            self.val_enc = Encoding(val_codec, val_params)
        elif codec == 5:    # BYTE_ARRAY_STOP
            self.stop_byte = bs.u8()
            self.content_id = bs.itf8()
        elif codec == 6:    # BETA
            self.offset = bs.itf8()
            self.nbits = bs.itf8()
        else:
            raise IOError(f"Unsupported CRAM encoding codec {codec}")

    def _build_huffman(self):
        # canonical codes from (symbol, length) sorted by (length, symbol)
        pairs = sorted(zip(self.lengths, self.alphabet))
        self.huff = {}          # (length, code) -> symbol
        code = 0
        prev_len = 0
        self.max_len = pairs[-1][0] if pairs else 0
        for length, sym in pairs:
            code <<= (length - prev_len)
            prev_len = length
            self.huff[(length, code)] = sym
            code += 1
        self.single = pairs[0][1] if len(pairs) == 1 and \
            pairs[0][0] == 0 else None

    def read_int(self, core: BitReader, ext: Dict[int, ByteStream]) -> int:
        if self.codec == 1:
            return ext[self.content_id].itf8()
        if self.codec == 3:
            if self.single is not None:
                return self.single
            length = 0
            code = 0
            while length <= self.max_len:
                code = (code << 1) | core.get_bit()
                length += 1
                sym = self.huff.get((length, code))
                if sym is not None:
                    return sym
            raise IOError("Bad Huffman code in CRAM core block")
        if self.codec == 6:
            return core.get_bits(self.nbits) - self.offset
        raise IOError(f"Encoding {self.codec} cannot decode ints")

    def read_byte(self, core: BitReader, ext: Dict[int, ByteStream]) -> int:
        if self.codec == 1:
            return ext[self.content_id].u8()
        return self.read_int(core, ext)

    def read_bytes(self, core: BitReader, ext: Dict[int, ByteStream],
                   length: Optional[int] = None) -> bytes:
        if self.codec == 5:
            stream = ext[self.content_id]
            # htslib treats end-of-block as an implicit stop byte
            end = stream.data.find(bytes([self.stop_byte]), stream.pos)
            if end < 0:
                end = len(stream.data)
            out = stream.data[stream.pos:end]
            stream.pos = end + 1
            return out
        if self.codec == 4:
            n = self.len_enc.read_int(core, ext)
            return self.val_enc.read_array(core, ext, n)
        if self.codec == 1:
            assert length is not None
            return ext[self.content_id].read(length)
        raise IOError(f"Encoding {self.codec} cannot decode byte arrays")

    def read_array(self, core: BitReader, ext: Dict[int, ByteStream],
                   n: int) -> bytes:
        if self.codec == 1:
            return ext[self.content_id].read(n)
        return bytes(self.read_byte(core, ext) for _ in range(n))


# --------------------------------------------------- compression header

class CompressionHeader:
    def __init__(self, data: bytes):
        bs = ByteStream(data)
        # preservation map
        bs.itf8()                      # size in bytes
        n = bs.itf8()
        self.read_names = True
        self.ap_delta = True
        self.reference_required = True
        self.substitution_matrix = bytes(5)
        self.tag_dict: List[List[Tuple[str, str]]] = [[]]
        for _ in range(n):
            key = bs.read(2)
            if key == b"RN":
                self.read_names = bs.u8() != 0
            elif key == b"AP":
                self.ap_delta = bs.u8() != 0
            elif key == b"RR":
                self.reference_required = bs.u8() != 0
            elif key == b"SM":
                self.substitution_matrix = bs.read(5)
            elif key == b"TD":
                blob = bs.read(bs.itf8())
                self.tag_dict = []
                for entry in blob.split(b"\x00")[:-1] if blob.endswith(
                        b"\x00") else blob.split(b"\x00"):
                    line = []
                    for i in range(0, len(entry), 3):
                        tag = entry[i:i + 2].decode("ascii")
                        typ = chr(entry[i + 2])
                        line.append((tag, typ))
                    line_ok = line
                    self.tag_dict.append(line_ok)
                if not self.tag_dict:
                    self.tag_dict = [[]]
            else:
                raise IOError(f"Unknown preservation key {key!r}")
        # data series encodings
        bs.itf8()
        n = bs.itf8()
        self.series: Dict[str, Encoding] = {}
        for _ in range(n):
            key = bs.read(2).decode("ascii")
            codec = bs.itf8()
            params = bs.read(bs.itf8())
            self.series[key] = Encoding(codec, params)
        # tag encodings
        bs.itf8()
        n = bs.itf8()
        self.tags: Dict[int, Encoding] = {}
        for _ in range(n):
            key = bs.itf8()
            codec = bs.itf8()
            params = bs.read(bs.itf8())
            self.tags[key] = Encoding(codec, params)
        # decoded substitution bases: SUB_BASES[ref_base][code] -> base
        self.sub_bases: Dict[int, List[int]] = {}
        bases = b"ACGTN"
        for ri, r in enumerate(bases):
            byte = self.substitution_matrix[ri]
            alts = [b for b in bases if b != r]
            by_code = [0] * 4
            for j, alt in enumerate(alts):
                code = (byte >> (6 - 2 * j)) & 3
                by_code[code] = alt
            self.sub_bases[r] = by_code


# ------------------------------------------------------------------ reader

class Container:
    __slots__ = ("length", "ref_id", "start", "span", "n_records",
                 "counter", "bases", "n_blocks", "landmarks", "offset")


def _read_container_header(fh) -> Optional[Container]:
    head = fh.read(4)
    if len(head) < 4:
        return None
    length = struct.unpack("<i", head)[0]
    # the header's variable-size fields (notably the landmark list, one
    # entry per slice) have no length prefix — retry with a growing
    # buffer until the parse fits
    size = 64 * 1024 if length < 0 else 8192
    while True:
        buf = fh.read(size)
        bs = ByteStream(buf)
        try:
            c = Container()
            c.length = length
            c.ref_id = bs.itf8()
            c.start = bs.itf8()
            c.span = bs.itf8()
            c.n_records = bs.itf8()
            c.counter = bs.ltf8()
            c.bases = bs.ltf8()
            c.n_blocks = bs.itf8()
            n_land = bs.itf8()
            c.landmarks = [bs.itf8() for _ in range(n_land)]
            bs.read(4)  # CRC
        except (IndexError, struct.error):
            if len(buf) < size:        # EOF: genuinely truncated
                raise
            fh.seek(-len(buf), 1)
            size *= 8
            continue
        # rewind to just after the header
        fh.seek(bs.pos - len(buf), 1)
        return c


class SliceHeader:
    __slots__ = ("ref_id", "start", "span", "n_records", "counter",
                 "n_blocks", "content_ids", "embedded_ref_id", "md5")


def _parse_slice_header(data: bytes) -> SliceHeader:
    bs = ByteStream(data)
    s = SliceHeader()
    s.ref_id = bs.itf8()
    s.start = bs.itf8()
    s.span = bs.itf8()
    s.n_records = bs.itf8()
    s.counter = bs.ltf8()
    s.n_blocks = bs.itf8()
    n = bs.itf8()
    s.content_ids = [bs.itf8() for _ in range(n)]
    s.embedded_ref_id = bs.itf8()
    s.md5 = bs.read(16)
    return s


class CramReader:
    """CRAM 3.0 alignment reader with BamReader-compatible surface."""

    def __init__(self, path: str, reference_path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "rb")
        magic = self._fh.read(4)
        if magic != CRAM_MAGIC:
            raise IOError(f"Not a CRAM file: {path}")
        version = self._fh.read(2)
        if version[0] != 3:
            raise IOError(f"Unsupported CRAM version {version[0]}."
                          f"{version[1]} (only 3.x)")
        self._fh.read(20)  # file id
        # first container: SAM header
        c = _read_container_header(self._fh)
        payload = self._fh.read(c.length)
        block = read_block(ByteStream(payload))
        hbs = ByteStream(block.data)
        text_len = hbs.i32()
        text = hbs.read(text_len).split(b"\0")[0].decode("utf-8")
        references = []
        for line in text.splitlines():
            if line.startswith("@SQ"):
                name = ln = None
                for field in line.split("\t")[1:]:
                    if field.startswith("SN:"):
                        name = field[3:]
                    elif field.startswith("LN:"):
                        ln = int(field[3:])
                if name is not None:
                    references.append((name, ln or 0))
        self.header = BamHeader(text, references)
        self._data_start = self._fh.tell()
        self._reference_path = reference_path
        self._fasta = None
        self._index = None
        self._ref_cache: Dict[int, bytes] = {}
        # decoded-record cache keyed on container file offset: per-locus
        # fetches from neighbouring loci re-read the same containers, and
        # a pure-Python rANS + feature decode is expensive to repeat
        self._container_cache: Dict[int, List[BamRecord]] = {}

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- reference access ----
    def _ref_seq(self, ref_id: int) -> bytes:
        cached = self._ref_cache.get(ref_id)
        if cached is not None:
            return cached
        if self._fasta is None:
            if self._reference_path is None:
                raise IOError("CRAM decoding requires a reference FASTA "
                              "(pass --genome)")
            from .fasta import FastaReader
            self._fasta = FastaReader(self._reference_path)
        name, length = self.header.references[ref_id]
        seq = self._fasta.fetch(name, 0, length).upper().encode("ascii")
        while len(self._ref_cache) > 4:
            self._ref_cache.pop(next(iter(self._ref_cache)))
        self._ref_cache[ref_id] = seq
        return seq

    # ---- container iteration ----
    def _iter_containers(self, from_offset: Optional[int] = None):
        fh = self._fh
        fh.seek(self._data_start if from_offset is None else from_offset)
        while True:
            offset = fh.tell()
            c = _read_container_header(fh)
            if c is None:
                return
            c.offset = offset
            payload = fh.read(c.length)
            if c.ref_id == -1 and c.n_records == 0 and not c.landmarks:
                return      # EOF container (spec 9.4)
            yield c, payload

    def _decode_container(self, c: Container,
                          payload: bytes) -> List[BamRecord]:
        bs = ByteStream(payload)
        comp_block = read_block(bs)
        if comp_block.content_type != CT_COMPRESSION_HEADER:
            raise IOError("Expected compression header block")
        comp = CompressionHeader(comp_block.data)
        records: List[BamRecord] = []
        while bs.pos < len(payload):
            blk = read_block(bs)
            if blk.content_type != CT_SLICE_HEADER:
                continue
            sh = _parse_slice_header(blk.data)
            core = None
            ext: Dict[int, ByteStream] = {}
            for _ in range(sh.n_blocks):
                b = read_block(bs)
                if b.content_type == CT_CORE:
                    core = BitReader(b.data)
                elif b.content_type == CT_EXTERNAL:
                    ext[b.content_id] = ByteStream(b.data)
            records.extend(self._decode_slice(comp, sh, core, ext))
        return records

    def _decode_slice(self, comp: CompressionHeader, sh: SliceHeader,
                      core: BitReader,
                      ext: Dict[int, ByteStream]) -> List[BamRecord]:
        S = comp.series

        def series_int(key, default=None):
            enc = S.get(key)
            if enc is None:
                if default is not None:
                    return default
                raise IOError(f"Missing data series {key}")
            return enc.read_int(core, ext)

        records = []
        prev_pos = sh.start
        for _ in range(sh.n_records):
            bf = series_int("BF")
            cf = series_int("CF")
            if sh.ref_id == -2:
                ref_id = series_int("RI")
            else:
                ref_id = sh.ref_id
            rl = series_int("RL")
            if comp.ap_delta:
                ap = prev_pos + series_int("AP")
                prev_pos = ap
            else:
                ap = series_int("AP")
            series_int("RG", default=-1)
            if comp.read_names:
                qname = S["RN"].read_bytes(core, ext).decode("ascii")
            else:
                qname = f"read{len(records)}"
            if cf & 2:        # detached: explicit mate info
                series_int("MF")
                if not comp.read_names:
                    S["RN"].read_bytes(core, ext)
                series_int("NS")
                series_int("NP")
                series_int("TS")
            elif cf & 4:      # mate downstream
                series_int("NF")
            # tags
            tl = series_int("TL", default=0)
            aux_parts = []
            for tag, typ in comp.tag_dict[tl]:
                key = (ord(tag[0]) << 16) | (ord(tag[1]) << 8) | ord(typ)
                payload = comp.tags[key].read_bytes(core, ext)
                aux_parts.append(tag.encode("ascii") + typ.encode("ascii")
                                 + payload)
            aux_raw = b"".join(aux_parts)

            unmapped = bool(bf & 0x4)
            if not unmapped:
                rec = self._decode_mapped(comp, core, ext, ref_id, ap, rl,
                                          bf, cf, qname, aux_raw)
            else:
                bases = S["BA"].read_array(core, ext, rl)
                mq = 0
                quals = (S["QS"].read_array(core, ext, rl)
                         if cf & 1 else b"\xff" * rl)
                rec = BamRecord(ref_id, ap - 1, mq, bf, qname, [],
                                bases.decode("ascii"), quals, aux_raw)
            records.append(rec)
        return records

    def _decode_mapped(self, comp, core, ext, ref_id, ap, rl, bf, cf,
                       qname, aux_raw) -> BamRecord:
        S = comp.series
        fn = S["FN"].read_int(core, ext)
        ref = self._ref_seq(ref_id)
        bases = bytearray(rl)
        cigar: List[Tuple[int, str]] = []
        seq_pos = 0            # 0-based within read
        ref_pos = ap - 1       # 0-based reference position
        fpos = 0               # 1-based feature position bookkeeping
        match_run = 0

        def flush_match():
            nonlocal match_run
            if match_run:
                cigar.append((match_run, "M"))
                match_run = 0

        def copy_match(n):
            nonlocal seq_pos, ref_pos, match_run
            if n <= 0:
                return
            bases[seq_pos:seq_pos + n] = ref[ref_pos:ref_pos + n]
            seq_pos += n
            ref_pos += n
            match_run += n

        for _ in range(fn):
            fc = chr(S["FC"].read_byte(core, ext))
            gap = S["FP"].read_int(core, ext)
            # FP deltas accumulate in 1-based read coordinates
            target = fpos + gap
            copy_match(target - 1 - seq_pos)
            fpos = target
            if fc == "X":
                code = S["BS"].read_byte(core, ext)
                rbase = ref[ref_pos] if ref_pos < len(ref) else ord("N")
                sub = comp.sub_bases.get(rbase, comp.sub_bases[ord("N")])
                bases[seq_pos] = sub[code]
                seq_pos += 1
                ref_pos += 1
                match_run += 1
            elif fc == "I":
                ins = S["IN"].read_bytes(core, ext)
                flush_match()
                bases[seq_pos:seq_pos + len(ins)] = ins
                seq_pos += len(ins)
                cigar.append((len(ins), "I"))
            elif fc == "i":
                flush_match()
                bases[seq_pos] = S["BA"].read_byte(core, ext)
                seq_pos += 1
                cigar.append((1, "I"))
            elif fc == "D":
                dl = S["DL"].read_int(core, ext)
                flush_match()
                cigar.append((dl, "D"))
                ref_pos += dl
            elif fc == "S":
                sc = S["SC"].read_bytes(core, ext)
                flush_match()
                bases[seq_pos:seq_pos + len(sc)] = sc
                seq_pos += len(sc)
                cigar.append((len(sc), "S"))
            elif fc == "N":
                rs = S["RS"].read_int(core, ext)
                flush_match()
                cigar.append((rs, "N"))
                ref_pos += rs
            elif fc == "P":
                pd = S["PD"].read_int(core, ext)
                flush_match()
                cigar.append((pd, "P"))
            elif fc == "H":
                hc = S["HC"].read_int(core, ext)
                flush_match()
                cigar.append((hc, "H"))
            elif fc == "B":
                bases[seq_pos] = S["BA"].read_byte(core, ext)
                S["QS"].read_byte(core, ext)
                seq_pos += 1
                ref_pos += 1
                match_run += 1
            elif fc == "b":
                bb = S["BB"].read_bytes(core, ext)
                bases[seq_pos:seq_pos + len(bb)] = bb
                seq_pos += len(bb)
                ref_pos += len(bb)
                match_run += len(bb)
            elif fc == "q":
                S["QQ"].read_bytes(core, ext)
            elif fc == "Q":
                S["QS"].read_byte(core, ext)
            else:
                raise IOError(f"Unknown CRAM feature code {fc!r}")
        copy_match(rl - seq_pos)
        flush_match()
        mq = S["MQ"].read_int(core, ext)
        quals = (S["QS"].read_array(core, ext, rl) if cf & 1
                 else b"\xff" * rl)
        return BamRecord(ref_id, ap - 1, mq, bf, qname, cigar,
                         bases.decode("ascii"), bytes(quals), aux_raw)

    # ---- iteration / fetch ----
    def __iter__(self) -> Iterator[BamRecord]:
        for c, payload in self._iter_containers():
            if c.n_records == 0:
                continue
            yield from self._decode_container(c, payload)

    def _load_index(self):
        if self._index is None:
            import os
            crai = self.path + ".crai"
            if not os.path.exists(crai):
                raise IOError(f"CRAM index not found for {self.path}")
            entries = []
            with gzip.open(crai, "rt") as fh:
                for line in fh:
                    parts = line.split("\t")
                    if len(parts) >= 6:
                        entries.append(tuple(int(x) for x in parts[:6]))
            self._index = entries
        return self._index

    def fetch(self, contig: str, beg: int, end: int) -> Iterator[BamRecord]:
        """Yield records overlapping [beg, end) on contig (htslib
        semantics, like BamReader.fetch)."""
        tid = self.header.tid(contig)
        if tid is None:
            return
        try:
            index = self._load_index()
        except IOError:
            index = None
        seen_offsets = set()
        if index is not None:
            offsets = []
            for (ref_id, start, span, c_off, _s_off, _s_len) in index:
                if ref_id != tid:
                    continue
                if start - 1 < end and (start - 1) + span > beg:
                    if c_off not in seen_offsets:
                        seen_offsets.add(c_off)
                        offsets.append(c_off)
            containers = []
            for off in sorted(offsets):
                self._fh.seek(off)
                c = _read_container_header(self._fh)
                c.offset = off
                payload = self._fh.read(c.length)
                containers.append((c, payload))
        else:
            containers = [(c, p) for c, p in self._iter_containers()
                          if c.n_records > 0 and
                          (c.ref_id in (tid, -2))]
        for c, payload in containers:
            if c.n_records == 0:
                continue
            key = getattr(c, "offset", None)
            if key is not None and key in self._container_cache:
                records = self._container_cache[key]
            else:
                records = self._decode_container(c, payload)
                if key is not None:
                    while len(self._container_cache) >= 4:
                        self._container_cache.pop(
                            next(iter(self._container_cache)))
                    self._container_cache[key] = records
            for rec in records:
                if rec.ref_id != tid:
                    continue
                if rec.is_unmapped:
                    continue
                if rec.pos >= end:
                    continue
                if rec.reference_end() > beg:
                    yield rec
