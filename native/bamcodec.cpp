// Native BGZF/BAM codec for the host I/O pipeline.
//
// Replaces the role htslib's C code plays in the reference (BAM/BGZF
// encode/decode; ref: rust-htslib usage at src/commands/genotype.rs:46,
// src/trgt/writers/write_bam.rs:37) without depending on htslib itself:
// a small zlib-based implementation of the BGZF framing from SAM spec
// §4.1 plus BAM record field decoding, exposed through a C ABI consumed
// via ctypes (trgt_tpu/io/native.py).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <vector>
#include <zlib.h>

extern "C" {

// ---------------- memory helpers ----------------

void trgt_buf_free(uint8_t *p) { free(p); }

// ---------------- BGZF decode ----------------

// Find BSIZE in the gzip FEXTRA field. Returns total block size or -1.
static int64_t block_size_at(const uint8_t *p, size_t avail) {
    if (avail < 18) return -1;
    if (p[0] != 0x1f || p[1] != 0x8b || p[2] != 8 || !(p[3] & 4)) return -1;
    uint16_t xlen = p[10] | (p[11] << 8);
    size_t pos = 12, end = 12 + xlen;
    if (end > avail) return -1;
    while (pos + 4 <= end) {
        uint8_t si1 = p[pos], si2 = p[pos + 1];
        uint16_t slen = p[pos + 2] | (p[pos + 3] << 8);
        if (si1 == 66 && si2 == 67 && slen == 2) {
            uint16_t bsize = p[pos + 4] | (p[pos + 5] << 8);
            return (int64_t)bsize + 1;
        }
        pos += 4 + slen;
    }
    return -1;
}

// Decompress a concatenation of BGZF blocks. Returns 0 on success.
int trgt_bgzf_decompress(const uint8_t *comp, size_t comp_size,
                         uint8_t **out, size_t *out_size) {
    std::vector<uint8_t> result;
    result.reserve(comp_size * 3);
    size_t pos = 0;
    while (pos + 28 <= comp_size) {
        int64_t bsize = block_size_at(comp + pos, comp_size - pos);
        if (bsize < 0) return -1;
        if (pos + bsize > comp_size) return -2;
        uint16_t xlen = comp[pos + 10] | (comp[pos + 11] << 8);
        const uint8_t *cdata = comp + pos + 12 + xlen;
        size_t cdata_len = bsize - 12 - xlen - 8;
        uint32_t isize;
        memcpy(&isize, comp + pos + bsize - 4, 4);
        size_t off = result.size();
        result.resize(off + isize);
        if (isize > 0) {
            z_stream zs;
            memset(&zs, 0, sizeof(zs));
            if (inflateInit2(&zs, -15) != Z_OK) return -3;
            zs.next_in = const_cast<uint8_t *>(cdata);
            zs.avail_in = (uInt)cdata_len;
            zs.next_out = result.data() + off;
            zs.avail_out = isize;
            int ret = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (ret != Z_STREAM_END) return -4;
        }
        pos += bsize;
    }
    *out = (uint8_t *)malloc(result.size() ? result.size() : 1);
    memcpy(*out, result.data(), result.size());
    *out_size = result.size();
    return 0;
}

// Read + decompress an entire BGZF file.
int trgt_bgzf_read_file(const char *path, uint8_t **out, size_t *out_size) {
    FILE *fp = fopen(path, "rb");
    if (!fp) return -1;
    fseek(fp, 0, SEEK_END);
    long size = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    std::vector<uint8_t> comp(size);
    if (fread(comp.data(), 1, size, fp) != (size_t)size) {
        fclose(fp);
        return -2;
    }
    fclose(fp);
    return trgt_bgzf_decompress(comp.data(), size, out, out_size);
}

// ---------------- BGZF encode ----------------

// Compress data into BGZF blocks (max 65280 bytes payload per block),
// appending the 28-byte EOF marker when add_eof != 0.
int trgt_bgzf_compress(const uint8_t *data, size_t size, int level,
                       int add_eof, uint8_t **out, size_t *out_size) {
    static const uint8_t EOF_BLOCK[28] = {
        0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff,
        0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
        0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00};
    const size_t MAX_BLOCK = 65280;
    std::vector<uint8_t> result;
    result.reserve(size / 2 + 64);
    size_t pos = 0;
    while (pos < size || (size == 0 && pos == 0)) {
        size_t chunk = size - pos < MAX_BLOCK ? size - pos : MAX_BLOCK;
        // deflate raw
        uLong bound = compressBound(chunk) + 64;
        std::vector<uint8_t> cdata(bound);
        z_stream zs;
        memset(&zs, 0, sizeof(zs));
        if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                         Z_DEFAULT_STRATEGY) != Z_OK)
            return -1;
        zs.next_in = const_cast<uint8_t *>(data + pos);
        zs.avail_in = (uInt)chunk;
        zs.next_out = cdata.data();
        zs.avail_out = (uInt)bound;
        int ret = deflate(&zs, Z_FINISH);
        size_t clen = bound - zs.avail_out;
        deflateEnd(&zs);
        if (ret != Z_STREAM_END) return -2;

        uint32_t crc = crc32(0L, Z_NULL, 0);
        crc = crc32(crc, data + pos, (uInt)chunk);
        uint32_t bsize = (uint32_t)(clen + 26);
        size_t off = result.size();
        result.resize(off + bsize);
        uint8_t *b = result.data() + off;
        const uint8_t header[12] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0,
                                    0,    0xff, 6, 0};
        memcpy(b, header, 12);
        b[12] = 66; b[13] = 67; b[14] = 2; b[15] = 0;
        uint16_t bs16 = (uint16_t)(bsize - 1);
        memcpy(b + 16, &bs16, 2);
        memcpy(b + 18, cdata.data(), clen);
        memcpy(b + 18 + clen, &crc, 4);
        uint32_t isize = (uint32_t)chunk;
        memcpy(b + 22 + clen, &isize, 4);
        pos += chunk;
        if (size == 0) break;
    }
    if (add_eof) {
        size_t off = result.size();
        result.resize(off + 28);
        memcpy(result.data() + off, EOF_BLOCK, 28);
    }
    *out = (uint8_t *)malloc(result.size() ? result.size() : 1);
    memcpy(*out, result.data(), result.size());
    *out_size = result.size();
    return 0;
}

// ---------------- BAM record decode ----------------

static const char SEQ_NT16[17] = "=ACMGRSVTWYHKDBN";

// Decode 4-bit packed sequence to ASCII.
void trgt_decode_seq(const uint8_t *packed, int32_t l_seq, char *out) {
    for (int32_t i = 0; i < l_seq; i++) {
        uint8_t b = packed[i >> 1];
        out[i] = SEQ_NT16[(i & 1) ? (b & 0xF) : (b >> 4)];
    }
}

// Scan BAM records in a decompressed buffer starting at `offset`.
// For each record, write (offset, block_size, ref_id, pos, flag, mapq)
// into the int64 output table (6 columns). Returns record count, or -1.
int64_t trgt_bam_scan(const uint8_t *buf, size_t size, size_t offset,
                      int64_t *table, int64_t max_records) {
    int64_t count = 0;
    size_t pos = offset;
    while (pos + 4 <= size && count < max_records) {
        int32_t block_size;
        memcpy(&block_size, buf + pos, 4);
        if (block_size < 32 || pos + 4 + block_size > size) break;
        const uint8_t *rec = buf + pos + 4;
        int32_t ref_id, rpos;
        memcpy(&ref_id, rec, 4);
        memcpy(&rpos, rec + 4, 4);
        uint8_t mapq = rec[9];
        uint16_t flag;
        memcpy(&flag, rec + 14, 2);
        table[count * 6 + 0] = (int64_t)pos;
        table[count * 6 + 1] = block_size;
        table[count * 6 + 2] = ref_id;
        table[count * 6 + 3] = rpos;
        table[count * 6 + 4] = flag;
        table[count * 6 + 5] = mapq;
        count++;
        pos += 4 + block_size;
    }
    return count;
}

}  // extern "C"
