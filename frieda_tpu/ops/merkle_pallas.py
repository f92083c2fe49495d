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


_M32 = 0xFFFFFFFF


def _is_c(x) -> bool:
    return isinstance(x, int)


def _add(a, b):
    """uint32 add with Python-int constant folding (adds of constant 0 — the
    12 zero message words of every leaf — vanish at trace time)."""
    if _is_c(a) and _is_c(b):
        return (a + b) & _M32
    if _is_c(a):
        return b if a == 0 else jnp.uint32(a) + b
    if _is_c(b):
        return a if b == 0 else a + jnp.uint32(b)
    return a + b


def _xor(a, b):
    if _is_c(a) and _is_c(b):
        return a ^ b
    if _is_c(a):
        return b if a == 0 else jnp.uint32(a) ^ b
    if _is_c(b):
        return a if b == 0 else a ^ jnp.uint32(b)
    return a ^ b


def _ror(x, r: int):
    if _is_c(x):
        return ((x >> r) | (x << (32 - r))) & _M32
    return (x >> jnp.uint32(r)) | (x << jnp.uint32(32 - r))


def _compress16(m):
    """Unrolled zero-state raw compression; m = list of 16 uint32 arrays OR
    Python-int constants (same shape where arrays); returns list of 8 arrays.

    Constant arithmetic folds at trace time: the state init is pure
    constants, so round-0 G functions whose two message words are both
    constants (6 of 8 in the leaf kernel — words 4..15 are zero) cost
    nothing, and every zero-message add in later rounds is skipped. ~14%
    fewer VPU ops for the leaf level; bit-exact (tests/test_merkle_pallas.py)."""
    v = [0] * 8 + list(IV)
    for rnd in range(10):
        s = SIGMA[rnd]
        for g, (a, b, c, d) in enumerate(G_INDICES):
            x, y = m[s[2 * g]], m[s[2 * g + 1]]
            va = _add(_add(v[a], v[b]), x)
            vd = _ror(_xor(v[d], va), 16)
            vc = _add(v[c], vd)
            vb = _ror(_xor(v[b], vc), 12)
            va = _add(_add(va, vb), y)
            vd = _ror(_xor(vd, va), 8)
            vc = _add(vc, vd)
            vb = _ror(_xor(vb, vc), 7)
            v[a], v[b], v[c], v[d] = va, vb, vc, vd
    out = [_xor(v[i], v[i + 8]) for i in range(8)]
    ref = next((x for x in m if not _is_c(x)), None)
    if ref is not None:  # materialize any all-constant lanes (degenerate)
        out = [jnp.full_like(ref, o) if _is_c(o) else o for o in out]
    return out


def _leaf_kernel(cols_ref, out_ref):
    m = [cols_ref[i, :] for i in range(4)] + [0] * 12
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


# ---------------------------------------------------------------------------
# Fused multi-level kernels (root-only commits).
#
# The decommit path needs every level materialized for its gathers, but a
# root-only commit doesn't: hashing THREE levels per pass keeps the two
# intermediate levels entirely in VMEM, cutting the Merkle HBM traffic from
# ~(3 + 2.6) bytes/leaf-byte to ~(0.5 + 0.6) (leaf pass: read 16 B/leaf +
# write 4 B/leaf instead of read 16 + write 32 + re-read 32 + ...).
#
# Pairing (natural halves layout): L_{k+1}[j] = H(L_k[j], L_k[j + M_k/2]),
# so the 3-level parent at j consumes the 8 eighth-offset positions
# {j + t*M/8}: blocks come in as 8 same-size slices of the level (or of the
# 4-row column array for the leaf-fused variant).
# ---------------------------------------------------------------------------


def _combine3(l0):
    """8 child hash blocks (list of 8 lists of 8 words, eighth t at index t)
    -> level-3 parent words. l1_i = H(l0_i, l0_{i+4}); l2_i = H(l1_i,
    l1_{i+2}); out = H(l2_0, l2_1)."""
    l1 = [_compress16(l0[i] + l0[i + 4]) for i in range(4)]
    l2 = [_compress16(l1[i] + l1[i + 2]) for i in range(2)]
    return _compress16(l2[0] + l2[1])


def _leaf3_kernel(*refs):
    cols, out_ref = refs[:8], refs[8]
    l0 = [_compress16([c[i, :] for i in range(4)] + [0] * 12) for c in cols]
    out = _combine3(l0)
    for w in range(8):
        out_ref[w, :] = out[w]


def _inner3_kernel(*refs):
    qs, out_ref = refs[:8], refs[8]
    out = _combine3([[q[w, :] for w in range(8)] for q in qs])
    for w in range(8):
        out_ref[w, :] = out[w]


def leaf3_level(columns: jnp.ndarray, block: int = BLOCK, interpret: bool = False):
    """(4, N) natural-order columns -> (8, N/8) level-3 hashes in one pass
    (leaf hash + two inner levels fused; intermediates never touch HBM)."""
    n = columns.shape[1]
    eighth = n // 8
    assert eighth % block == 0
    nb = eighth // block
    return pl.pallas_call(
        _leaf3_kernel,
        out_shape=jax.ShapeDtypeStruct((8, eighth), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((4, block), lambda i, _t=t, _n=nb: (0, i + _t * _n),
                         memory_space=pltpu.VMEM)
            for t in range(8)
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*([columns] * 8))


def _collapse_kernel_factory(m: int, out_widths: tuple):
    """Collapse a narrow (8, m) level in ONE kernel: every remaining tree
    level is computed in VMEM (fully unrolled compressions on shrinking
    widths), writing only the requested output widths. Replaces the
    per-level jnp fallback whose ~6-12 tiny dispatches dominated small-blob
    commit time (VERDICT r4 item 5)."""
    targets = {w: i for i, w in enumerate(out_widths)}

    def kernel(x_ref, *out_refs):
        rows = [x_ref[w : w + 1, :] for w in range(8)]  # (1, m) each
        width = m
        if width in targets:  # degenerate: echo the input level
            for w in range(8):
                out_refs[targets[width]][w, :] = rows[w][0, :]
        while width > min(out_widths):
            half = width // 2
            msg = [r[:, :half] for r in rows] + [r[:, half:width] for r in rows]
            rows = _compress16(msg)
            width = half
            if width in targets:
                for w in range(8):
                    out_refs[targets[width]][w, :] = rows[w][0, :]

    return kernel


def collapse_level(level: jnp.ndarray, out_width: int, interpret: bool = False):
    """(8, m) -> (8, out_width): all intermediate levels stay in VMEM."""
    return collapse_multi(level, (out_width,), interpret)[0]


def collapse_multi(level: jnp.ndarray, out_widths: tuple, interpret: bool = False):
    """(8, m) -> [(8, w) for w in out_widths] (descending widths, each
    dividing m) in one kernel call. m is bounded by the callers (<= 8*BLOCK,
    so VMEM use stays ~2 x 8 x m x 4 B)."""
    m = level.shape[1]
    assert all(m % w == 0 for w in out_widths), (m, out_widths)
    assert list(out_widths) == sorted(out_widths, reverse=True)
    kern = _collapse_kernel_factory(m, tuple(out_widths))
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((8, w), jnp.uint32) for w in out_widths],
        grid=(1,),
        in_specs=[pl.BlockSpec((8, m), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((8, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in out_widths
        ],
        interpret=interpret,
    )(level)


def inner3_level(level: jnp.ndarray, block: int = BLOCK, interpret: bool = False):
    """(8, M) level hashes -> (8, M/8) three-levels-up parents in one pass."""
    m = level.shape[1]
    eighth = m // 8
    assert eighth % block == 0
    nb = eighth // block
    return pl.pallas_call(
        _inner3_kernel,
        out_shape=jax.ShapeDtypeStruct((8, eighth), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, block), lambda i, _t=t, _n=nb: (0, i + _t * _n),
                         memory_space=pltpu.VMEM)
            for t in range(8)
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*([level] * 8))
