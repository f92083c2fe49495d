// Native host runtime for frieda-tpu: byte->felt ingest, BLAKE2s primitives,
// Fiat-Shamir channel steps, PoW grind and Merkle path verification.
//
// The TPU owns the bulk compute (JAX/Pallas); this library owns the host hot
// paths the reference implements in Rust (SURVEY.md §2.1-2.2): packing
// (src/utils.rs:10-19), the raw-compression Merkle node hash (SURVEY.md A.6),
// the sequential channel (SURVEY.md B.2) and the scalar grind fallback.
// Exposed through a plain C ABI consumed via ctypes (no pybind11 in image).
//
// Semantics are the golden-verified spec; bit-exactness against the Python
// oracle is enforced by tests/test_native.py.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t IV[8] = {
    0x6A09E667u, 0xBB67AE85u, 0x3C6EF372u, 0xA54FF53Au,
    0x510E527Fu, 0x9B05688Cu, 0x1F83D9ABu, 0x5BE0CD19u,
};

constexpr uint8_t SIGMA[10][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
};

inline uint32_t rotr(uint32_t x, int r) { return (x >> r) | (x << (32 - r)); }

inline void g(uint32_t v[16], int a, int b, int c, int d, uint32_t x, uint32_t y) {
  v[a] = v[a] + v[b] + x;
  v[d] = rotr(v[d] ^ v[a], 16);
  v[c] = v[c] + v[d];
  v[b] = rotr(v[b] ^ v[c], 12);
  v[a] = v[a] + v[b] + y;
  v[d] = rotr(v[d] ^ v[a], 8);
  v[c] = v[c] + v[d];
  v[b] = rotr(v[b] ^ v[c], 7);
}

void compress(uint32_t h[8], const uint32_t m[16], uint64_t t, bool final_block) {
  uint32_t v[16];
  std::memcpy(v, h, 32);
  std::memcpy(v + 8, IV, 32);
  v[12] ^= static_cast<uint32_t>(t);
  v[13] ^= static_cast<uint32_t>(t >> 32);
  if (final_block) v[14] ^= 0xFFFFFFFFu;
  for (int r = 0; r < 10; ++r) {
    const uint8_t* s = SIGMA[r];
    g(v, 0, 4, 8, 12, m[s[0]], m[s[1]]);
    g(v, 1, 5, 9, 13, m[s[2]], m[s[3]]);
    g(v, 2, 6, 10, 14, m[s[4]], m[s[5]]);
    g(v, 3, 7, 11, 15, m[s[6]], m[s[7]]);
    g(v, 0, 5, 10, 15, m[s[8]], m[s[9]]);
    g(v, 1, 6, 11, 12, m[s[10]], m[s[11]]);
    g(v, 2, 7, 8, 13, m[s[12]], m[s[13]]);
    g(v, 3, 4, 9, 14, m[s[14]], m[s[15]]);
  }
  for (int i = 0; i < 8; ++i) h[i] ^= v[i] ^ v[i + 8];
}

// Full BLAKE2s-256 of `len` bytes (parameter block: digest 32, fanout/depth 1).
void blake2s256(const uint8_t* data, uint64_t len, uint8_t out[32]) {
  uint32_t h[8];
  std::memcpy(h, IV, 32);
  h[0] ^= 0x01010020u;
  uint64_t processed = 0;
  uint32_t m[16];
  // every block except the last is full; empty input hashes one zero block
  while (len - processed > 64) {
    std::memcpy(m, data + processed, 64);
    processed += 64;
    compress(h, m, processed, false);
  }
  uint64_t rem = len - processed;
  uint8_t last[64] = {0};
  std::memcpy(last, data + processed, rem);
  std::memcpy(m, last, 64);
  compress(h, m, len, true);
  std::memcpy(out, h, 32);
}

}  // namespace

extern "C" {

// Raw zero-state compression of n 16-word messages (Merkle node hash).
void frieda_raw_compress_batch(const uint32_t* msgs, uint64_t n, uint32_t* out) {
  for (uint64_t i = 0; i < n; ++i) {
    uint32_t h[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    compress(h, msgs + 16 * i, 0, false);
    std::memcpy(out + 8 * i, h, 32);
  }
}

void frieda_blake2s256(const uint8_t* data, uint64_t len, uint8_t* out32) {
  blake2s256(data, len, out32);
}

// Channel step: digest <- blake2s256(digest(32) || payload).
void frieda_channel_mix(const uint8_t* digest32, const uint8_t* payload,
                        uint64_t payload_len, uint8_t* out32) {
  uint8_t buf[4096];
  uint8_t* p = buf;
  bool heap = 32 + payload_len > sizeof(buf);
  if (heap) p = new uint8_t[32 + payload_len];
  std::memcpy(p, digest32, 32);
  std::memcpy(p + 32, payload, payload_len);
  blake2s256(p, 32 + payload_len, out32);
  if (heap) delete[] p;
}

// Scalar grind: min nonce with trailing_zeros(blake2s(digest||nonce)) >= bits.
uint64_t frieda_grind(const uint8_t* digest32, uint32_t pow_bits) {
  uint8_t buf[40];
  std::memcpy(buf, digest32, 32);
  uint8_t out[32];
  for (uint64_t nonce = 0;; ++nonce) {
    std::memcpy(buf + 32, &nonce, 8);  // little-endian on all targets we build
    blake2s256(buf, 40, out);
    // trailing zeros of the u128 little-endian first 16 bytes
    uint64_t lo, hi;
    std::memcpy(&lo, out, 8);
    std::memcpy(&hi, out + 8, 8);
    uint32_t tz;
    if (lo != 0) {
      tz = static_cast<uint32_t>(__builtin_ctzll(lo));
    } else if (hi != 0) {
      tz = 64 + static_cast<uint32_t>(__builtin_ctzll(hi));
    } else {
      tz = 128;
    }
    if (tz >= pow_bits) return nonce;
  }
}

// bytes -> 30-bit little-endian M31 felts (SURVEY.md A.1). out must hold
// ceil(8*len/30) uint32. Returns the felt count.
uint64_t frieda_bytes_to_felts(const uint8_t* data, uint64_t len, uint32_t* out) {
  uint64_t n_bits = 8 * len;
  uint64_t n_felts = (n_bits + 29) / 30;
  uint64_t acc = 0;
  int acc_bits = 0;
  uint64_t j = 0;
  for (uint64_t i = 0; i < len; ++i) {
    acc |= static_cast<uint64_t>(data[i]) << acc_bits;
    acc_bits += 8;
    while (acc_bits >= 30) {
      out[j++] = static_cast<uint32_t>(acc & 0x3FFFFFFFu);
      acc >>= 30;
      acc_bits -= 30;
    }
  }
  if (acc_bits > 0 && j < n_felts) out[j++] = static_cast<uint32_t>(acc);
  return n_felts;
}

// In-place-free bit-reversal permutation: out[i] = in[bitrev_log(i)].
void frieda_bitrev_u32(const uint32_t* in, uint32_t* out, uint32_t log_n) {
  uint64_t n = 1ull << log_n;
  for (uint64_t i = 0; i < n; ++i) {
    uint64_t r = 0, x = i;
    for (uint32_t b = 0; b < log_n; ++b) {
      r = (r << 1) | (x & 1);
      x >>= 1;
    }
    out[i] = in[r];
  }
}

// Merkle multi-opening root recomputation (light-client verify hot path —
// the whole bottom-up walk in one call instead of per-level Python/numpy).
// idxs: n sorted unique leaf indices; rows: n x 8 leaf hash words;
// wit: n_wit x 8 sibling hash words consumed in encounter order (the
// deterministic plan of merkle.verify_openings_rows). Writes the recomputed
// root to out8 and the consumed witness count to *consumed. Returns 1 when
// the walk completes to exactly node 0 (caller still compares the root and
// checks *consumed == n_wit), 0 on witness underrun / malformed structure.
int frieda_verify_openings(uint32_t log_n, uint64_t n, const int64_t* idxs,
                           const uint32_t* rows, const uint32_t* wit,
                           uint64_t n_wit, uint32_t* out8, uint64_t* consumed) {
  // Two preallocated ping-pong buffers (each level's node count only ever
  // shrinks) — the per-level vector builds this replaces were ~4 mallocs x
  // log_n levels per tree, a visible cost in verify_many's batched calls.
  std::vector<int64_t> idxbuf(2 * n);
  std::vector<uint32_t> hbuf(2 * 8 * n);
  int64_t* cur_idx = idxbuf.data();
  int64_t* nxt_idx = idxbuf.data() + n;
  uint32_t* cur_h = hbuf.data();
  uint32_t* nxt_h = hbuf.data() + 8 * n;
  std::memcpy(cur_idx, idxs, n * sizeof(int64_t));
  std::memcpy(cur_h, rows, 8 * n * sizeof(uint32_t));
  uint64_t cnt = n;
  uint64_t wi = 0;
  for (uint32_t lvl = 0; lvl < log_n; ++lvl) {
    if (cnt == 0) break;
    uint64_t out = 0;
    uint64_t i = 0;
    while (i < cnt) {
      int64_t cur = cur_idx[i];
      const uint32_t *l, *r;
      if (i + 1 < cnt && cur_idx[i + 1] == (cur ^ 1)) {
        l = cur_h + 8 * i;
        r = cur_h + 8 * (i + 1);
        i += 2;
      } else {
        if (wi >= n_wit) { *consumed = wi; return 0; }
        const uint32_t* w = wit + 8 * wi;
        ++wi;
        if ((cur & 1) == 0) { l = cur_h + 8 * i; r = w; }
        else { l = w; r = cur_h + 8 * i; }
        i += 1;
      }
      uint32_t m[16];
      std::memcpy(m, l, 32);
      std::memcpy(m + 8, r, 32);
      uint32_t hh[8] = {0, 0, 0, 0, 0, 0, 0, 0};
      compress(hh, m, 0, false);
      nxt_idx[out] = cur >> 1;
      std::memcpy(nxt_h + 8 * out, hh, 32);
      ++out;
    }
    std::swap(cur_idx, nxt_idx);
    std::swap(cur_h, nxt_h);
    cnt = out;
  }
  *consumed = wi;
  if (cnt != 1 || cur_idx[0] != 0) return 0;
  std::memcpy(out8, cur_h, 32);
  return 1;
}

// Batched multi-opening walk over n_trees INDEPENDENT equal-depth trees
// (the light-client verify_many hot path: one call per layer depth for a
// whole batch of proofs instead of one per proof). Tree p owns leaf rows
// [seg[p], seg[p+1]) of idxs/rows and witness rows [wseg[p], wseg[p+1]).
// idxs are tree-local (already de-offset). Writes n_trees x 8 root words
// and per-tree ok flags (walk completed AND consumed its witness exactly).
int frieda_verify_openings_batch(uint32_t log_n, uint32_t n_trees,
                                 const uint64_t* seg, const int64_t* idxs,
                                 const uint32_t* rows, const uint64_t* wseg,
                                 const uint32_t* wit, uint32_t* out_roots,
                                 uint8_t* out_ok) {
  for (uint32_t p = 0; p < n_trees; ++p) {
    uint64_t n = seg[p + 1] - seg[p];
    uint64_t n_wit = wseg[p + 1] - wseg[p];
    uint64_t consumed = 0;
    int ok = frieda_verify_openings(log_n, n, idxs + seg[p], rows + 8 * seg[p],
                                    wit + 8 * wseg[p], n_wit,
                                    out_roots + 8 * p, &consumed);
    out_ok[p] = (ok && consumed == n_wit) ? 1 : 0;
  }
  return 1;
}

// Merkle pair hash: compress(0, left(8 words) || right(8 words)).
void frieda_hash_pair(const uint32_t* left8, const uint32_t* right8, uint32_t* out8) {
  uint32_t m[16];
  std::memcpy(m, left8, 32);
  std::memcpy(m + 8, right8, 32);
  uint32_t h[8] = {0};
  compress(h, m, 0, false);
  std::memcpy(out8, h, 32);
}

}  // extern "C"
