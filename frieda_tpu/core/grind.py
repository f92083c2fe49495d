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


from .channel import Blake2sChannel


def _full_blake2s_40_batch(digest_words, nonces_lo, nonces_hi):
    """Batched full blake2s-256 of (digest || nonce_le8) — one final block of
    40 bytes. Returns the first two output words (enough for pow_bits <= 64)."""
    from .blake2s import blake2s_hash_one_block

    shape = nonces_lo.shape
    m = [jnp.broadcast_to(w, shape) for w in digest_words]
    m += [nonces_lo, nonces_hi] + [jnp.zeros(shape, jnp.uint32)] * 6
    out = blake2s_hash_one_block(m, data_len=40)
    return out[0], out[1]


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
    try:  # native scalar grind (bit-exact; tests/test_native.py)
        from .. import native

        if native.available():
            return native.grind(channel.digest, pow_bits)
    except Exception:
        pass
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
