"""Pallas TPU kernels for Merkle level hashing.

The XLA fori-loop blake2s (core/blake2s.py) re-materializes the 16-word state
in HBM every round (~1.3 KB of traffic per node); these kernels keep the
whole compression in VMEM/registers so a level costs its ideal ~100 B/node:

  leaf level : read 4x4 B (columns) -> write 8x4 B
  inner level: read 2x32 B (children) -> write 32 B

Natural-order halves pairing (core/circle.py layout): level M pairs node j
with j + M/2, so the inner kernel takes the SAME level array twice with
block index maps offset by half — all accesses are wide contiguous blocks.

The 10 G-rounds are fully unrolled in-kernel (no HBM between rounds); there
are exactly two kernel bodies and one block shape, so Mosaic compiles are
one-time and the XLA graph stays tiny. Levels smaller than the block fall
back to the jnp path (they're negligible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.blake2s import G_INDICES, IV, SIGMA

BLOCK = 4096  # lanes per grid step; VMEM use ~= 24 * BLOCK * 4B


def _ror(x, r: int):
    return (x >> jnp.uint32(r)) | (x << jnp.uint32(32 - r))


def _compress16(m):
    """Unrolled zero-state raw compression; m = list of 16 same-shape uint32
    arrays; returns list of 8."""
    zero = jnp.zeros_like(m[0])
    v = [zero] * 8 + [jnp.full_like(m[0], iv) for iv in IV]
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
    return [v[i] ^ v[i + 8] for i in range(8)]


def _leaf_kernel(cols_ref, out_ref):
    m = [cols_ref[i, :] for i in range(4)]
    m += [jnp.zeros_like(m[0])] * 12
    out = _compress16(m)
    for w in range(8):
        out_ref[w, :] = out[w]


def _inner_kernel(lo_ref, hi_ref, out_ref):
    m = [lo_ref[w, :] for w in range(8)] + [hi_ref[w, :] for w in range(8)]
    out = _compress16(m)
    for w in range(8):
        out_ref[w, :] = out[w]


def leaf_level(columns: jnp.ndarray, block: int = BLOCK, interpret: bool = False):
    """(4, N) natural-order columns -> (8, N) leaf hashes."""
    n = columns.shape[1]
    assert n % block == 0
    return pl.pallas_call(
        _leaf_kernel,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.uint32),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((4, block), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(columns)


def inner_level(level: jnp.ndarray, block: int = BLOCK, interpret: bool = False):
    """(8, M) level hashes -> (8, M/2) parents (pairs j, j + M/2)."""
    m = level.shape[1]
    half = m // 2
    assert half % block == 0
    nblk_half = half // block
    return pl.pallas_call(
        _inner_kernel,
        out_shape=jax.ShapeDtypeStruct((8, half), jnp.uint32),
        grid=(nblk_half,),
        in_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, block), lambda i, _n=nblk_half: (0, i + _n), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(level, level)
