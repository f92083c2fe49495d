"""Batched raw BLAKE2s compression on JAX uint32 lanes.

Device-side hashing for Merkle commitments: the zero-state raw compression
function (SURVEY.md A.6, golden-verified; reference use-site
/root/reference/src/commit.rs:17-21 via stwo's vcs). The 10 G-rounds are
fully unrolled into one fused elementwise pass over the batch axis — VPU
integer-throughput-bound, no memory traffic between rounds.

Message/state layout is word-major: a batch of n compressions takes a list of
16 uint32 arrays of shape (..., n) and yields 8 such arrays, so the batch
axis stays on the 128-wide lane dimension on TPU.
"""

from __future__ import annotations

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

G_INDICES = (
    (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
    (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14),
)


def _ror(x, r: int):
    return (x >> jnp.uint32(r)) | (x << jnp.uint32(32 - r))


def compress_batch(m: list) -> list:
    """Zero-state raw compression. m: 16 uint32 arrays (broadcast-compatible
    shapes); returns 8 uint32 arrays of the batch shape."""
    assert len(m) == 16
    shape = jnp.broadcast_shapes(*(x.shape for x in m))
    zero = jnp.zeros(shape, jnp.uint32)
    v = [zero] * 8 + [jnp.full(shape, iv, jnp.uint32) for iv in IV]
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
    # h' = h ^ v ^ v[+8] with h = 0
    return [v[i] ^ v[i + 8] for i in range(8)]
