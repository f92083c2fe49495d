"""Byte -> M31 felt ingest (host, vectorized numpy).

Production counterpart of /root/reference/src/utils.rs:10-33 (spec: SURVEY.md
A.1, golden-verified; oracle: frieda_tpu/spec/commit.py). Packs the input's
LSB-first bit stream into 30-bit little-endian chunks — every chunk < 2^30 so
all felts are canonical by construction.

Vectorization: lcm(8, 30) = 120 bits, so each 15-byte block yields exactly
4 felts via fixed shifts/masks (no per-bit work).
"""

from __future__ import annotations

import numpy as np


def bytes_to_felts(data: bytes) -> np.ndarray:
    try:  # native fast path (bit-exact; tests/test_native.py)
        from .. import native

        if native.available():
            return native.bytes_to_felts(data)
    except Exception:
        pass
    n_bits = 8 * len(data)
    n_felts = -(-n_bits // 30)
    if n_felts == 0:
        return np.zeros(0, np.uint32)
    n_blocks = -(-len(data) // 15)
    buf = np.zeros(n_blocks * 15, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    b = buf.reshape(n_blocks, 15).astype(np.uint32)
    f0 = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | ((b[:, 3] & 0x3F) << 24)
    f1 = (b[:, 3] >> 6) | (b[:, 4] << 2) | (b[:, 5] << 10) | (b[:, 6] << 18) | ((b[:, 7] & 0x0F) << 26)
    f2 = (b[:, 7] >> 4) | (b[:, 8] << 4) | (b[:, 9] << 12) | (b[:, 10] << 20) | ((b[:, 11] & 0x03) << 28)
    f3 = (b[:, 11] >> 2) | (b[:, 12] << 6) | (b[:, 13] << 14) | (b[:, 14] << 22)
    felts = np.stack([f0, f1, f2, f3], axis=1).reshape(-1)
    return felts[:n_felts]


def pad_to_blocks(data: bytes) -> np.ndarray:
    """Raw bytes zero-padded to whole 15-byte blocks (>= 1 block), flat uint8.
    This is the ONLY host-side ingest work on the device-unpack path: one
    memcpy, no bit manipulation. All felts at index >= ceil(8*len/30) decode
    from padding bytes only, so they are zero by construction."""
    n_blocks = max(-(-len(data) // 15), 1)
    buf = np.zeros(n_blocks * 15, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    return buf


def log_total_for(data_len: int) -> int:
    """log2 of the padded felt count for a data blob (src/utils.rs:23 .max(2)
    quirk included): max(ceil_log2(ceil(8*len/30)), 2)."""
    n_felts = -(-(8 * data_len) // 30)
    return max(ceil_log2(max(n_felts, 1)), 2)


def device_unpack(blocks_u8, log_total: int):
    """Device-side byte->felt ingest: the 15-byte/4-felt block trick as one
    elementwise jnp pass (jit-traceable; shapes static). blocks_u8: flat
    (n_blocks*15,) uint8 device array from pad_to_blocks. Returns natural-order
    coefficients (4, 2^log_total / 4) uint32 — bit-exact with
    polynomial_from_bytes (tests/test_commit_jax.py).

    Replaces the host packer + uint32 upload on single-chip hot paths: the
    host->device transfer shrinks 32/30x and the unpack shifts run at HBM
    bandwidth instead of host memcpy speed (VERDICT round 1, item 2)."""
    import jax.numpy as jnp

    b = blocks_u8.reshape(-1, 15).astype(jnp.uint32)
    f0 = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | ((b[:, 3] & 0x3F) << 24)
    f1 = (b[:, 3] >> 6) | (b[:, 4] << 2) | (b[:, 5] << 10) | (b[:, 6] << 18) | ((b[:, 7] & 0x0F) << 26)
    f2 = (b[:, 7] >> 4) | (b[:, 8] << 4) | (b[:, 9] << 12) | (b[:, 10] << 20) | ((b[:, 11] & 0x03) << 28)
    f3 = (b[:, 11] >> 2) | (b[:, 12] << 6) | (b[:, 13] << 14) | (b[:, 14] << 22)
    felts = jnp.stack([f0, f1, f2, f3], axis=1).reshape(-1)
    total = 1 << log_total
    k = felts.shape[0]
    if k >= total:
        felts = felts[:total]
    else:
        felts = jnp.pad(felts, (0, total - k))
    return felts.reshape(4, total // 4)


def pad_to_words(data: bytes, log_total: int) -> np.ndarray:
    """Little-endian uint32 word view of `data`, zero-padded so that every
    felt's (lo, hi) word pair is in range for device_ingest_rev:
    ceil(30*2^log_total / 32) + 1 words. One host memcpy, no bit work."""
    total = 1 << log_total
    nw = (30 * total + 31) // 32 + 1
    buf = np.zeros(nw * 4, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    return buf.view("<u4")


def device_unpack_blocks(words, log_total: int):
    """Gather-free device byte->felt unpack: uint32 words (pad_to_words) ->
    (4, 2^log_total / 4) NATURAL-order coefficients. lcm(30, 32) = 480 bits,
    so each 15-word group yields exactly 16 felts through a FIXED shift/or
    pattern — pure elementwise VPU work plus two tiled relayouts, no gather
    at all (random gathers were ~60% of the old ingest's device time).
    Requires log_total >= 4 (whole 16-felt groups). No 30*f bit-offset is
    ever materialized, so (unlike the gather path) this scales past
    log_total = 27."""
    import jax.numpy as jnp

    assert log_total >= 4
    total = 1 << log_total
    nb = total // 16
    w = words[: nb * 15].reshape(nb, 15).T  # (15, nb): one tiled relayout
    mask = jnp.uint32((1 << 30) - 1)
    outs = []
    for k in range(16):
        bit = 30 * k
        i, s = bit // 32, bit % 32
        if s <= 2:
            v = (w[i] >> jnp.uint32(s)) & mask
        else:
            v = ((w[i] >> jnp.uint32(s)) | (w[i + 1] << jnp.uint32(32 - s))) & mask
        outs.append(v)
    felts = jnp.stack(outs, axis=1).reshape(total)  # (nb, 16) -> natural order
    return felts.reshape(4, total // 4)


def _rev_idx(m: int) -> np.ndarray:
    """Bit-reversal permutation of [0, 2^m) as int32 (host-precomputed)."""
    k = np.arange(1 << m, dtype=np.int64)
    r = np.zeros_like(k)
    for i in range(m):
        r |= ((k >> i) & 1) << (m - 1 - i)
    return r.astype(np.int32)


def bitrev_rows_device(x, log_l: int):
    """Bit-reverse the last axis of (C, 2^log_l) WITHOUT a flat random
    gather: split the index bits log_l = a + b; then
    out2d[u, v] = in2d[rev_b(v), rev_a(u)] with in2d = row.reshape(2^b, 2^a),
    i.e. two whole-row axis gathers (contiguous DMA) + one tiled transpose —
    ~3 cheap HBM passes instead of one latency-bound 2^log_l random gather."""
    import jax.numpy as jnp

    if log_l <= 1:
        return x[..., _rev_idx(log_l)] if log_l == 1 else x
    a = log_l // 2
    b = log_l - a
    C = x.shape[0]
    y = x.reshape(C, 1 << b, 1 << a)
    y = jnp.take(y, jnp.asarray(_rev_idx(b)), axis=1)
    y = y.swapaxes(1, 2)  # (C, 2^a, 2^b)
    y = jnp.take(y, jnp.asarray(_rev_idx(a)), axis=1)
    return y.reshape(C, 1 << log_l)


def device_ingest_rev(words, log_size: int):
    """Fused device ingest: uint32 words (pad_to_words, log_total =
    log_size + 2) -> (4, 2^log_size) *bit-reversed-order* coefficients, ready
    for fft.evaluate (30-bit LSB-first extraction per SURVEY.md A.1 +
    coefficient bit-reversal). Bit-exact with
    fft.apply_bitrev(device_unpack(...), perm) (tests/test_commit_jax.py).

    Three device strategies, same result:
      * TPU, log_size >= 9: fused Pallas extraction (ops/ingest_pallas) —
        one HBM pass, no element-granular relayout (the XLA unpack's
        15-word transpose + 16-way interleave lower to near-scalar copies
        costing ~3.5 ms flat, the whole small-blob commit budget), then the
        power-of-2 tiled per-row bit-reversal of the remaining bits.
      * log_size >= 4: gather-free unpack (device_unpack_blocks) + transpose
        bit-reversal (bitrev_rows_device) — all contiguous HBM traffic.
      * tiny sizes: the direct per-felt (lo, hi) word-gather pair (bit
        offsets 30*f must fit uint32, hence the log_size + 2 <= 27 bound —
        the main path has no such limit)."""
    import jax
    import jax.numpy as jnp

    if log_size >= 9:
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu:
            from ..ops import ingest_pallas

            pre = ingest_pallas.ingest_rows(words, log_size)
            return bitrev_rows_device(pre, log_size - 4).reshape(
                4, 1 << log_size
            )
    if log_size >= 4:
        return bitrev_rows_device(device_unpack_blocks(words, log_size + 2),
                                  log_size)
    assert log_size + 2 <= 27
    L = 1 << log_size
    k = jnp.arange(L, dtype=jnp.uint32)
    rk = jnp.zeros_like(k)
    for i in range(log_size):
        rk = rk | (((k >> i) & jnp.uint32(1)) << (log_size - 1 - i))
    f = jnp.arange(4, dtype=jnp.uint32)[:, None] * jnp.uint32(L) + rk[None, :]
    bit = jnp.uint32(30) * f
    idx = (bit >> 5).astype(jnp.int32)
    sh = bit & jnp.uint32(31)
    lo = words[idx]
    hi = words[idx + 1]
    high = jnp.where(sh > 2, hi << ((jnp.uint32(32) - sh) & jnp.uint32(31)),
                     jnp.uint32(0))
    return ((lo >> sh) | high) & jnp.uint32((1 << 30) - 1)


def ceil_log2(n: int) -> int:
    """Exact integer ceil(log2(n)), n >= 1. (The reference uses f64 log2 at
    src/utils.rs:23, exact for every reachable size < 2^49.)"""
    return max(n - 1, 0).bit_length()


def polynomial_from_bytes(data: bytes) -> np.ndarray:
    """Felts padded to 2^max(ceil_log2(n), 2), split into the 4 coordinate
    polynomials of one secure circle polynomial: shape (4, 2^log_size),
    natural coefficient order (src/utils.rs:21-33)."""
    felts = bytes_to_felts(data)
    log_total = max(ceil_log2(max(len(felts), 1)), 2)
    total = 1 << log_total
    padded = np.zeros(total, np.uint32)
    padded[: len(felts)] = felts
    return padded.reshape(4, total // 4)
