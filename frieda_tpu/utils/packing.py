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


def device_ingest_rev(words, log_size: int):
    """Fused device ingest: uint32 words (pad_to_words, log_total =
    log_size + 2) -> (4, 2^log_size) *bit-reversed-order* coefficients, ready
    for fft.evaluate. The 30-bit LSB-first extraction (SURVEY.md A.1) and the
    coefficient bit-reversal collapse into ONE gather pair (lo/hi word) plus
    fused elementwise shifts — no uint8 minor-dim-15 relayout, no separate
    permutation gather. Bit-exact with
    fft.apply_bitrev(device_unpack(...), perm) (tests/test_commit_jax.py).
    Valid for log_size + 2 <= 27 (30*f must fit uint32)."""
    import jax.numpy as jnp

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
