// Native LZ4 frame codec for episode logs.
//
// The reference framework saves dense episode logs as LZ4-frame-compressed
// JSON through the python `lz4` package (reference foundation/utils.py:18-43).
// This is a from-scratch C++ implementation of the LZ4 block format and the
// LZ4 frame format (v1, spec: magic 0x184D2204) so the TPU framework can read
// and write the same `.lz4` log files without any Python-level dependency.
//
// Exposed C ABI (driven from Python via ctypes, see native/__init__.py):
//   aet_lz4f_compress_bound(n)                      -> worst-case frame size
//   aet_lz4f_compress(src, n, dst, cap)             -> frame bytes or -1
//   aet_lz4f_content_size(src, n)                   -> stored content size or -1
//   aet_lz4f_decompress(src, n, dst, cap)           -> content bytes or -1
//
// Build: g++ -O3 -shared -fPIC lz4frame.cpp -o _aet_native.so

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

// ---------------------------------------------------------------------------
// xxHash32 — needed for the frame header checksum byte (HC) and the optional
// content checksum field of the LZ4 frame format.
// ---------------------------------------------------------------------------

constexpr uint32_t P1 = 2654435761U;
constexpr uint32_t P2 = 2246822519U;
constexpr uint32_t P3 = 3266489917U;
constexpr uint32_t P4 = 668265263U;
constexpr uint32_t P5 = 374761393U;

inline uint32_t rotl32(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }

inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (x86-64 / aarch64)
}

inline uint16_t read16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

uint32_t xxh32(const uint8_t* input, size_t len, uint32_t seed) {
  const uint8_t* p = input;
  const uint8_t* end = input + len;
  uint32_t h;
  if (len >= 16) {
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 16;
    do {
      v1 = rotl32(v1 + read32(p) * P2, 13) * P1; p += 4;
      v2 = rotl32(v2 + read32(p) * P2, 13) * P1; p += 4;
      v3 = rotl32(v3 + read32(p) * P2, 13) * P1; p += 4;
      v4 = rotl32(v4 + read32(p) * P2, 13) * P1; p += 4;
    } while (p <= limit);
    h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
  } else {
    h = seed + P5;
  }
  h += (uint32_t)len;
  while (p + 4 <= end) {
    h = rotl32(h + read32(p) * P3, 17) * P4;
    p += 4;
  }
  while (p < end) {
    h = rotl32(h + (*p) * P5, 11) * P1;
    ++p;
  }
  h ^= h >> 15; h *= P2;
  h ^= h >> 13; h *= P3;
  h ^= h >> 16;
  return h;
}

// ---------------------------------------------------------------------------
// LZ4 block compression — greedy hash-table parser (standard format:
// token = [literal_len:4][match_len-4:4], extended lengths with 255-runs,
// 2-byte little-endian match offsets, MINMATCH 4, last 5 bytes literal,
// matches must not start within the last 12 bytes).
// ---------------------------------------------------------------------------

constexpr int HASH_LOG = 14;
constexpr size_t MINMATCH = 4;
constexpr size_t MFLIMIT = 12;
constexpr size_t LASTLITERALS = 5;
constexpr uint32_t MAX_DISTANCE = 65535;

inline uint32_t hash4(uint32_t v) { return (v * P1) >> (32 - HASH_LOG); }

inline uint8_t* write_length(uint8_t* op, size_t len) {
  while (len >= 255) { *op++ = 255; len -= 255; }
  *op++ = (uint8_t)len;
  return op;
}

// Compress one block; returns compressed size, or 0 if it would not fit in cap.
size_t lz4_compress_block(const uint8_t* src, size_t n, uint8_t* dst, size_t cap) {
  if (n == 0) return 0;
  uint32_t table[1 << HASH_LOG];
  std::memset(table, 0, sizeof(table));

  const uint8_t* ip = src;
  const uint8_t* anchor = src;
  const uint8_t* iend = src + n;
  const uint8_t* mflimit = (n >= MFLIMIT) ? iend - MFLIMIT : src;
  uint8_t* op = dst;
  uint8_t* oend = dst + cap;

  if (n >= MINMATCH + LASTLITERALS) {
    while (ip < mflimit) {
      // find a match
      uint32_t h = hash4(read32(ip));
      const uint8_t* match = src + table[h];
      table[h] = (uint32_t)(ip - src);
      if (match < ip && (size_t)(ip - match) <= MAX_DISTANCE &&
          read32(match) == read32(ip)) {
        // extend match forward
        const uint8_t* mp = match + MINMATCH;
        const uint8_t* p = ip + MINMATCH;
        const uint8_t* matchlimit = iend - LASTLITERALS;
        while (p < matchlimit && *p == *mp) { ++p; ++mp; }
        size_t mlen = (size_t)(p - ip);
        size_t litlen = (size_t)(ip - anchor);

        // worst-case emit size check
        if (op + 1 + litlen + litlen / 255 + 2 + mlen / 255 + 1 > oend)
          return 0;

        // token + literals
        uint8_t* token = op++;
        if (litlen >= 15) { *token = 0xF0; op = write_length(op, litlen - 15); }
        else { *token = (uint8_t)(litlen << 4); }
        std::memcpy(op, anchor, litlen);
        op += litlen;

        // offset + match length
        uint16_t off = (uint16_t)(ip - match);
        std::memcpy(op, &off, 2);
        op += 2;
        size_t mcode = mlen - MINMATCH;
        if (mcode >= 15) { *token |= 0x0F; op = write_length(op, mcode - 15); }
        else { *token |= (uint8_t)mcode; }

        ip = p;
        anchor = ip;
        if (ip < mflimit) table[hash4(read32(ip - 2))] = (uint32_t)(ip - 2 - src);
      } else {
        ++ip;
      }
    }
  }

  // trailing literals
  size_t litlen = (size_t)(iend - anchor);
  if (op + 1 + litlen + litlen / 255 > oend) return 0;
  uint8_t* token = op++;
  if (litlen >= 15) { *token = 0xF0; op = write_length(op, litlen - 15); }
  else { *token = (uint8_t)(litlen << 4); }
  std::memcpy(op, anchor, litlen);
  op += litlen;
  return (size_t)(op - dst);
}

// Decompress one block appended at `op` inside a contiguous output buffer
// that starts at `obase` (so linked-block matches reaching into previously
// decompressed blocks resolve naturally). Returns bytes written or -1.
ptrdiff_t lz4_decompress_block(const uint8_t* src, size_t n,
                               uint8_t* obase, uint8_t* op, uint8_t* oend) {
  const uint8_t* ip = src;
  const uint8_t* iend = src + n;
  uint8_t* ostart = op;

  while (ip < iend) {
    uint8_t token = *ip++;
    // literals
    size_t litlen = token >> 4;
    if (litlen == 15) {
      uint8_t b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        litlen += b;
      } while (b == 255);
    }
    if (ip + litlen > iend || op + litlen > oend) return -1;
    std::memcpy(op, ip, litlen);
    ip += litlen;
    op += litlen;
    if (ip >= iend) break;  // block ends with literals

    // match
    if (ip + 2 > iend) return -1;
    size_t offset = read16(ip);
    ip += 2;
    if (offset == 0 || (size_t)(op - obase) < offset) return -1;
    size_t mlen = (token & 0x0F);
    if (mlen == 15) {
      uint8_t b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        mlen += b;
      } while (b == 255);
    }
    mlen += MINMATCH;
    if (op + mlen > oend) return -1;
    const uint8_t* mp = op - offset;
    // overlapping copy must be byte-wise
    for (size_t i = 0; i < mlen; ++i) op[i] = mp[i];
    op += mlen;
  }
  return op - ostart;
}

// ---------------------------------------------------------------------------
// LZ4 frame format
// ---------------------------------------------------------------------------

constexpr uint32_t LZ4F_MAGIC = 0x184D2204U;
constexpr size_t BLOCK_MAX = 4 << 20;  // BD=7: 4 MB blocks (python-lz4 default)

inline void write32(uint8_t* p, uint32_t v) { std::memcpy(p, &v, 4); }
inline void write64(uint8_t* p, uint64_t v) { std::memcpy(p, &v, 8); }

}  // namespace

extern "C" {

// Worst-case frame size for `n` content bytes.
size_t aet_lz4f_compress_bound(size_t n) {
  size_t nblocks = n / BLOCK_MAX + 1;
  // header(19) + per-block (4-byte size + worst-case stored block)
  // + endmark(4) + content checksum(4)
  return 19 + n + n / 255 + nblocks * (4 + 16) + 8 + 64;
}

// Compress `src[0:n]` into an LZ4 frame at `dst` (capacity `cap`).
// Frame flags: v1, block-independent, content-size present, no checksums
// beyond the mandatory header-checksum byte. Returns frame size or -1.
ptrdiff_t aet_lz4f_compress(const uint8_t* src, size_t n, uint8_t* dst, size_t cap) {
  if (cap < 19 + 8) return -1;
  uint8_t* op = dst;
  write32(op, LZ4F_MAGIC);
  op += 4;
  uint8_t* hdr = op;
  // FLG: version=01, block-independent=1, content-size=1
  *op++ = 0x40 | 0x20 | 0x08;
  // BD: block max size 4 MB
  *op++ = 0x70;
  write64(op, (uint64_t)n);
  op += 8;
  *op++ = (uint8_t)((xxh32(hdr, (size_t)(op - hdr), 0) >> 8) & 0xFF);

  size_t pos = 0;
  while (pos < n || (n == 0 && pos == 0)) {
    size_t blk = (n - pos < BLOCK_MAX) ? n - pos : BLOCK_MAX;
    if (blk == 0) break;
    if ((size_t)(op - dst) + 4 + blk + 4 > cap) return -1;
    size_t csize = lz4_compress_block(src + pos, blk, op + 4, blk > 0 ? blk - 1 : 0);
    if (csize > 0 && csize < blk) {
      write32(op, (uint32_t)csize);
      op += 4 + csize;
    } else {
      // incompressible: store raw, high bit set
      write32(op, (uint32_t)blk | 0x80000000U);
      op += 4;
      std::memcpy(op, src + pos, blk);
      op += blk;
    }
    pos += blk;
  }
  if ((size_t)(op - dst) + 4 > cap) return -1;
  write32(op, 0);  // EndMark
  op += 4;
  return op - dst;
}

// Parse the frame header of `src[0:n]`; return the stored content size,
// 0 if the frame has no content-size field, or -1 on a malformed frame.
ptrdiff_t aet_lz4f_content_size(const uint8_t* src, size_t n) {
  if (n < 7 || read32(src) != LZ4F_MAGIC) return -1;
  uint8_t flg = src[4];
  if ((flg >> 6) != 1) return -1;  // version
  if (!(flg & 0x08)) return 0;     // no content size stored
  if (n < 15) return -1;
  uint64_t cs;
  std::memcpy(&cs, src + 6, 8);
  return (ptrdiff_t)cs;
}

// Decompress the LZ4 frame `src[0:n]` into `dst` (capacity `cap`).
// Handles both block-independent and block-linked frames, optional
// block/content checksums and dict-id. Returns content size or -1.
ptrdiff_t aet_lz4f_decompress(const uint8_t* src, size_t n, uint8_t* dst, size_t cap) {
  if (n < 7 || read32(src) != LZ4F_MAGIC) return -1;
  const uint8_t* ip = src + 4;
  const uint8_t* iend = src + n;
  uint8_t flg = *ip++;
  if ((flg >> 6) != 1) return -1;
  bool block_checksum = flg & 0x10;
  bool content_size = flg & 0x08;
  bool content_checksum = flg & 0x04;
  bool dict_id = flg & 0x01;
  ++ip;  // BD byte
  if (content_size) ip += 8;
  if (dict_id) ip += 4;
  ++ip;  // HC byte
  if (ip > iend) return -1;

  uint8_t* op = dst;
  uint8_t* oend = dst + cap;
  while (true) {
    if (ip + 4 > iend) return -1;
    uint32_t bsize = read32(ip);
    ip += 4;
    if (bsize == 0) break;  // EndMark
    bool stored = bsize & 0x80000000U;
    bsize &= 0x7FFFFFFFU;
    if (ip + bsize > iend) return -1;
    if (stored) {
      if (op + bsize > oend) return -1;
      std::memcpy(op, ip, bsize);
      op += bsize;
    } else {
      ptrdiff_t w = lz4_decompress_block(ip, bsize, dst, op, oend);
      if (w < 0) return -1;
      op += w;
    }
    ip += bsize;
    if (block_checksum) {
      if (ip + 4 > iend) return -1;
      ip += 4;  // trust, skip
    }
  }
  if (content_checksum) {
    if (ip + 4 > iend) return -1;
    if (read32(ip) != xxh32(dst, (size_t)(op - dst), 0)) return -1;
  }
  return op - dst;
}

// xxh32 exposed for tests.
uint32_t aet_xxh32(const uint8_t* p, size_t n, uint32_t seed) {
  return xxh32(p, n, seed);
}

}  // extern "C"
