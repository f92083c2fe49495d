"""Proof-of-work grind: minimum nonce whose mix clears pow_bits.

Reference semantics (SURVEY.md B.3; use-site /root/reference/src/proof.rs:13,
58-59): smallest nonce n >= 0 such that channel.clone().mix_u64(n)
.trailing_zeros() >= pow_bits. The device path sweeps nonce batches with the
batched BLAKE2s kernel and min-reduces qualifying nonces, preserving the
sequential scan's *minimum-nonce* answer exactly (transcript-exactness).

mix_u64 hashes digest(32B) || nonce(8B) = 40 bytes — a single full BLAKE2s-256
block (parameter-block IV, t = 40, final flag), so one compression per nonce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .blake2s import IV
from .channel import Blake2sChannel


def _full_blake2s_40_batch(digest_words, nonces_lo, nonces_hi):
    """Batched full blake2s-256 of (digest || nonce_le8). Returns the first
    two output words (enough for pow_bits <= 64)."""
    from .blake2s import G_INDICES, SIGMA, _ror

    shape = nonces_lo.shape
    m = [jnp.broadcast_to(w, shape) for w in digest_words]
    m += [nonces_lo, nonces_hi] + [jnp.zeros(shape, jnp.uint32)] * 6
    h = [jnp.full(shape, iv, jnp.uint32) for iv in IV]
    h[0] = h[0] ^ jnp.uint32(0x01010020)  # digest_length=32, fanout=1, depth=1
    v = list(h) + [jnp.full(shape, iv, jnp.uint32) for iv in IV]
    v[12] = v[12] ^ jnp.uint32(40)  # t0 = 40 bytes
    v[14] = v[14] ^ jnp.uint32(0xFFFFFFFF)  # final block flag
    for rnd in range(10):
        s = SIGMA[rnd]
        for g, (a, b, c, d) in enumerate(G_INDICES):
            x, y = m[s[2 * g]], m[s[2 * g + 1]]
            va = v[a] + v[b] + x
            vd = _ror(v[d] ^ va, 16)
            vc = v[c] + vd
            vb = _ror(v[b] ^ vc, 12)
            va = va + vb + y
            vd = _ror(vd ^ va, 8)
            vc = vc + vd
            vb = _ror(vb ^ vc, 7)
            v[a], v[b], v[c], v[d] = va, vb, vc, vd
    w0 = h[0] ^ v[0] ^ v[8]
    w1 = h[1] ^ v[1] ^ v[9]
    return w0, w1


@functools.partial(jax.jit, static_argnums=(3, 4))
def _grind_batch(digest_words, base_lo, base_hi, pow_bits: int, batch: int):
    """Scan nonces [base, base+batch) (base = base_hi*2^32 + base_lo, batch
    aligned so the window never crosses a 2^32 boundary). Returns the in-batch
    offset of the minimum qualifying nonce, or 2^32-1 if none. All-uint32 so
    no x64 mode is needed."""
    idx = jnp.arange(batch, dtype=jnp.uint32)
    lo = base_lo + idx
    hi = jnp.broadcast_to(base_hi, lo.shape)
    w0, w1 = _full_blake2s_40_batch(digest_words, lo, hi)
    if pow_bits <= 32:
        mask = jnp.uint32(((1 << pow_bits) - 1) & 0xFFFFFFFF)
        ok = (w0 & mask) == 0
    else:
        mask = jnp.uint32((1 << (pow_bits - 32)) - 1)
        ok = (w0 == 0) & ((w1 & mask) == 0)
    cand = jnp.where(ok, idx, jnp.uint32(0xFFFFFFFF))
    return jnp.min(cand)


def grind_device(channel: Blake2sChannel, pow_bits: int, batch: int = 1 << 20) -> int:
    digest_words = tuple(
        jnp.uint32(int.from_bytes(channel.digest[4 * i : 4 * i + 4], "little"))
        for i in range(8)
    )
    base = 0
    while True:
        off = int(
            _grind_batch(
                digest_words,
                jnp.uint32(base & 0xFFFFFFFF),
                jnp.uint32(base >> 32),
                pow_bits,
                batch,
            )
        )
        if off != 0xFFFFFFFF:
            return base + off
        base += batch


def grind_host(channel: Blake2sChannel, pow_bits: int) -> int:
    nonce = 0
    while True:
        c = channel.clone()
        c.mix_u64(nonce)
        if c.trailing_zeros() >= pow_bits:
            return nonce
        nonce += 1


def grind(channel: Blake2sChannel, pow_bits: int, prefer_device: bool = True) -> int:
    if prefer_device and pow_bits >= 12:
        return grind_device(channel, pow_bits)
    return grind_host(channel, pow_bits)
