"""Batched BLAKE2s compression on JAX uint32 lanes.

Device-side hashing for Merkle commitments: the zero-state raw compression
function (SURVEY.md A.6, golden-verified; reference use-site
/root/reference/src/commit.rs:17-21 via stwo's vcs) plus the standard
parameter-block variant used for channel-compatible hashing (grind kernel).

The 16-word working state is laid out as four row vectors a|b|c|d of 4 lanes
each ((4, ...) arrays), so one G application updates all four columns at once
and the diagonal step is a lane roll — the textbook SIMD formulation. The 10
rounds run under lax.fori_loop with the SIGMA schedule as a gathered constant,
keeping the traced graph ~100 ops instead of ~1120 fully unrolled (compile
time matters: the Merkle tree unrolls one compress per level).

Message/state layout is word-major: a batch of n compressions takes a list of
16 uint32 arrays of shape (..., n) and yields 8 such arrays, so the batch
axis stays on the 128-wide lane dimension on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)

SIGMA = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    (14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    (11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    (7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    (9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    (2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    (12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    (13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    (6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    (10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
)

# Kept for reference/tests: the (a, b, c, d) register quadruples of the 8 G
# applications per round (columns then diagonals).
G_INDICES = (
    (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
    (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14),
)


def _ror(x, r: int):
    return (x >> jnp.uint32(r)) | (x << jnp.uint32(32 - r))


def _g(a, b, c, d, x, y):
    a = a + b + x
    d = _ror(d ^ a, 16)
    c = c + d
    b = _ror(b ^ c, 12)
    a = a + b + y
    d = _ror(d ^ a, 8)
    c = c + d
    b = _ror(b ^ c, 7)
    return a, b, c, d


def compress_rows(msg, h_rows=None, t: int = 0, final: bool = False):
    """Core compression. msg: (16, ...) uint32; h_rows: optional (v[0..7] as
    two (4, ...) rows) — zero state when None. Returns (8, ...) output words.
    """
    shape = msg.shape[1:]
    iv = [jnp.full(shape, w, jnp.uint32) for w in IV]
    if h_rows is None:
        zero = jnp.zeros((4,) + shape, jnp.uint32)
        a, b = zero, zero
    else:
        a, b = h_rows
    c = jnp.stack(iv[0:4])
    d = jnp.stack(iv[4:8])
    if t:
        d = d.at[0].set(d[0] ^ jnp.uint32(t & 0xFFFFFFFF))
        d = d.at[1].set(d[1] ^ jnp.uint32((t >> 32) & 0xFFFFFFFF))
    if final:
        d = d.at[2].set(d[2] ^ jnp.uint32(0xFFFFFFFF))
    h_in = (a, b)
    sigma = jnp.asarray(SIGMA, jnp.int32)

    def round_fn(r, state):
        a, b, c, d = state
        mm = jnp.take(msg, sigma[r], axis=0, indices_are_sorted=False,
                      unique_indices=True)
        a, b, c, d = _g(a, b, c, d, mm[0:8:2], mm[1:8:2])
        b = jnp.roll(b, -1, axis=0)
        c = jnp.roll(c, -2, axis=0)
        d = jnp.roll(d, -3, axis=0)
        a, b, c, d = _g(a, b, c, d, mm[8::2], mm[9::2])
        b = jnp.roll(b, 1, axis=0)
        c = jnp.roll(c, 2, axis=0)
        d = jnp.roll(d, 3, axis=0)
        return (a, b, c, d)

    a, b, c, d = jax.lax.fori_loop(0, 10, round_fn, (a, b, c, d), unroll=2)
    out_lo = h_in[0] ^ a ^ c  # h'[0..3]
    out_hi = h_in[1] ^ b ^ d  # h'[4..7]
    return jnp.concatenate([out_lo, out_hi], axis=0)


def compress_batch(m: list) -> list:
    """Zero-state raw compression (Merkle node hash). m: 16 uint32 arrays of
    broadcast-compatible shapes; returns 8 uint32 arrays."""
    assert len(m) == 16
    shape = jnp.broadcast_shapes(*(x.shape for x in m))
    msg = jnp.stack([jnp.broadcast_to(x, shape) for x in m])
    out = compress_rows(msg)
    return [out[i] for i in range(8)]


def blake2s_hash_one_block(m: list, data_len: int) -> list:
    """Standard BLAKE2s-256 of a message that fits one block: parameter-block
    IV (digest_length=32, fanout=1, depth=1), t = data_len, final flag set.
    m: 16 uint32 arrays (zero-padded past data_len)."""
    assert len(m) == 16
    shape = jnp.broadcast_shapes(*(x.shape for x in m))
    msg = jnp.stack([jnp.broadcast_to(x, shape) for x in m])
    h0 = [jnp.full(shape, w, jnp.uint32) for w in IV]
    h0[0] = h0[0] ^ jnp.uint32(0x01010020)
    h_rows = (jnp.stack(h0[0:4]), jnp.stack(h0[4:8]))
    out = compress_rows(msg, h_rows=h_rows, t=data_len, final=True)
    return [out[i] for i in range(8)]
