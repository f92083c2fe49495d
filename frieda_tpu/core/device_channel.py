"""Device-side Fiat-Shamir channel (bit-exact twin of core/channel.py).

The transcript is inherently sequential (SURVEY.md §7 hard-part 4), but each
step is a single BLAKE2s block over <= 64 bytes — trivially computable on the
TPU between the big kernels. Running the channel ON DEVICE lets the whole FRI
commit phase (Merkle roots -> mix -> draw alpha -> fold, per layer, plus PoW
grind and query sampling) execute as ONE jitted dispatch, which matters
enormously when host<->device round-trips cost milliseconds.

Bit-exactness with the host channel is enforced by tests
(tests/test_device_channel.py); the host channel remains the verifier's
source of truth.

State is a pair (digest (8,) uint32 words little-endian, n_sent uint32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .blake2s import IV, compress_rows

P = (1 << 31) - 1


def _param_h():
    h = [jnp.uint32(w) for w in IV]
    h = [h[0] ^ jnp.uint32(0x01010020)] + h[1:]
    return h


def dc_blake2s(msg_words, byte_len: int):
    """Standard BLAKE2s-256 of byte_len bytes given as (16*k,) uint32 words
    (zero-padded). byte_len is static. Returns (8,) uint32 digest words."""
    n_blocks = max(1, -(-byte_len // 64))
    assert msg_words.shape[0] == 16 * n_blocks
    h = _param_h()
    a = jnp.stack(h[0:4])
    b = jnp.stack(h[4:8])
    for i in range(n_blocks):
        final = i == n_blocks - 1
        t = byte_len if final else (i + 1) * 64
        out = compress_rows(
            msg_words[16 * i : 16 * (i + 1)], h_rows=(a, b), t=t, final=final
        )
        a, b = out[0:4], out[4:8]
    return jnp.concatenate([a, b])


def fresh_digest():
    return jnp.zeros((8,), jnp.uint32)


def dc_mix_u64(digest, value_lo, value_hi):
    """digest <- blake2s(digest || value_le8). value as two u32 words."""
    msg = jnp.concatenate(
        [
            digest,
            jnp.reshape(value_lo.astype(jnp.uint32), (1,)),
            jnp.reshape(value_hi.astype(jnp.uint32), (1,)),
            jnp.zeros((6,), jnp.uint32),
        ]
    )
    return dc_blake2s(msg, 40)


def dc_mix_u64_const(digest, value: int):
    return dc_mix_u64(
        digest,
        jnp.uint32(value & 0xFFFFFFFF),
        jnp.uint32((value >> 32) & 0xFFFFFFFF),
    )


def dc_mix_digest(digest, root_words):
    """digest <- blake2s(digest || 32-byte root) — exactly one full block."""
    msg = jnp.concatenate([digest, root_words])
    return dc_blake2s(msg, 64)


def dc_mix_felts(digest, felts):
    """felts: (k, 4) uint32 QM31 coordinates. digest <- blake2s(digest ||
    each QM31 as 4 u32 LE words)."""
    k = felts.shape[0]
    byte_len = 32 + 16 * k
    n_blocks = -(-byte_len // 64)
    flat = jnp.concatenate([digest, felts.reshape(-1)])
    pad = 16 * n_blocks - flat.shape[0]
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint32)])
    return dc_blake2s(flat, byte_len)


def dc_draw_random_words(digest, n_sent):
    """One draw: blake2s(digest || n_sent_le8) -> ((8,) words, n_sent + 1)."""
    out = dc_mix_u64(digest, n_sent, jnp.uint32(0))
    return out, n_sent + jnp.uint32(1)


def dc_draw_base_felts(digest, n_sent):
    """8 uniform M31 felts with the host channel's whole-draw rejection rule:
    retry while any word >= 2P. Returns (felts (8,), n_sent')."""

    def cond(state):
        _, words, ok = state
        return jnp.logical_not(ok)

    def body(state):
        n_sent, _, _ = state
        words, n_sent = dc_draw_random_words(digest, n_sent)
        ok = jnp.all(words < jnp.uint32(2 * P))
        return (n_sent, words, ok)

    init = (n_sent, jnp.zeros((8,), jnp.uint32), jnp.asarray(False))
    n_sent, words, _ = jax.lax.while_loop(cond, body, init)
    felts = words - jnp.where(words >= P, jnp.uint32(P), jnp.uint32(0))
    return felts, n_sent


def dc_draw_felt(digest, n_sent):
    """Draw one QM31 (first 4 of 8 base felts). Returns ((4,), n_sent')."""
    felts, n_sent = dc_draw_base_felts(digest, n_sent)
    return felts[:4], n_sent


def dc_trailing_zeros(digest):
    """Trailing zeros of the u128 formed from the first 16 digest bytes LE."""
    words = digest[:4]
    tz_each = jnp.where(
        words == 0,
        jnp.uint32(32),
        jax.lax.population_count((words & (jnp.uint32(0) - words)) - jnp.uint32(1)),
    )
    # accumulate: add tz of word i only while all lower words were zero
    tz = tz_each[0]
    all_zero = words[0] == 0
    for i in range(1, 4):
        tz = tz + jnp.where(all_zero, tz_each[i], jnp.uint32(0))
        all_zero = jnp.logical_and(all_zero, words[i] == 0)
    # if all four words are zero the true u128 count is 128 (host returns 128)
    return tz


def dc_grind(digest, pow_bits: int, batch: int = 1 << 15):
    """Minimum nonce n with trailing_zeros(mix_u64(n)) >= pow_bits, entirely
    on device (nonces < 2^32 — astronomically safe for pow_bits <= 32+).
    Returns the nonce as uint32."""
    from .blake2s import blake2s_hash_one_block

    NONE = jnp.uint32(0xFFFFFFFF)

    def batch_min(base):
        idx = base + jnp.arange(batch, dtype=jnp.uint32)
        m = [jnp.broadcast_to(digest[i], idx.shape) for i in range(8)]
        m += [idx, jnp.zeros_like(idx)] + [jnp.zeros_like(idx)] * 6
        out = blake2s_hash_one_block(m, data_len=40)
        if pow_bits <= 32:
            mask = jnp.uint32(((1 << pow_bits) - 1) & 0xFFFFFFFF)
            ok = (out[0] & mask) == 0
            if pow_bits == 32:
                ok = out[0] == 0
        else:
            mask = jnp.uint32((1 << (pow_bits - 32)) - 1)
            ok = (out[0] == 0) & ((out[1] & mask) == 0)
        return jnp.min(jnp.where(ok, idx, NONE))

    def cond(state):
        base, found = state
        return found == NONE

    def body(state):
        base, _ = state
        return (base + jnp.uint32(batch), batch_min(base))

    _, found = jax.lax.while_loop(
        cond, body, (jnp.uint32(0), batch_min(jnp.uint32(0)))
    )
    return found


def dc_sample_query_words(digest, n_sent, n_queries: int, log_domain: int):
    """Draw n_queries positions (with duplicates, unsorted) exactly like the
    host sampler; sort/dedup stays on host. Returns ((n_queries,), n_sent')."""
    n_draws = -(-n_queries // 8)
    out = []
    for _ in range(n_draws):
        words, n_sent = dc_draw_random_words(digest, n_sent)
        out.append(words)
    positions = jnp.concatenate(out)[:n_queries] & jnp.uint32((1 << log_domain) - 1)
    return positions, n_sent
