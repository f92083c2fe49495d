"""Fused Pallas circle-FFT kernels.

The XLA stage loop (core/fft.py) costs one full HBM pass per butterfly stage.
These kernels fuse all stages of each four-step phase into a single pass:

  phase A — the low-bit stages, on the transposed (C, blk, nb) view: each
            grid step holds an entire (blk, LANES) tile in VMEM and runs all
            its stages in-register. Twiddles are lane-invariant (blk,1)
            tables tiled per stage.
  phase B — the high-bit stages on the natural (C, nb, blk) view: the same
            roll-based butterfly along the nb (sublane) axis; twiddles vary
            along lanes, so each stage's table is BlockSpec-sliced per chunk.

Butterfly without reshapes (Mosaic-friendly): for combine distance e along
the sublane axis,

  out[j] = x[j] + t[j] * x[j+e]      where (j & e) == 0   (g0 rows)
  out[j] = x[j-e] - t[j] * x[j]      where (j & e) != 0   (g1 rows)

with t[j] = T_d[j mod e] — the two partner reads are cyclic rolls by ±e
(wrap-around lanes are never selected).

Whole transform: transpose, phase A, transpose, phase B — 4 HBM passes
instead of ~n. Bit-exact with core/fft.evaluate (tests/test_fft_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import circle as hostcircle
from ..core.field import m31_add, m31_mul, m31_sub

LANES = 128


def _butterfly(x, t, e: int):
    """One in-VMEM butterfly stage along the sublane axis (x: (1, M, LANES),
    combine distance e along axis 1)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    mask = (idx & e) == 0
    up = jnp.roll(x, -e, axis=1)
    dn = jnp.roll(x, e, axis=1)
    a = m31_add(x, m31_mul(t, up))
    b = m31_sub(dn, m31_mul(t, x))
    return jnp.where(mask, a, b)


def _phase_a_kernel_factory(stage_list):
    """stage_list: [(e, tw_input_index), ...] — e in elements along blk."""

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        x = x_ref[:]  # (1, blk, LANES)
        for e, ti in stage_list:
            t = refs[ti][:, :][None]  # (1, blk, 1), lane-invariant
            x = _butterfly(x, t, e)
        out_ref[:] = x

    return kernel


def _phase_b_kernel_factory(stage_list):
    """stage_list: [(e_rows, tw_input_index, reps), ...]."""

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        x = x_ref[:]  # (1, nb, LANES)
        for e_rows, ti, reps in stage_list:
            tw = refs[ti][:, :]  # (e_rows, LANES)
            if reps > 1:
                t = jnp.broadcast_to(
                    tw[None], (reps, e_rows, LANES)
                ).reshape(reps * e_rows, LANES)
            else:
                t = tw
            x = _butterfly(x, t[None], e_rows)
        out_ref[:] = x

    return kernel


@functools.lru_cache(maxsize=32)
def _phase_plans(n: int, log_l: int):
    """Static plan shared by both phases: which stages run where."""
    k = n // 2
    start = min(n - 1, log_l - 1)
    a_stages = [d for d in range(start, n - 1 - k, -1)] if start > n - 1 - k else []
    b_start = min(start, n - 1 - k)
    b_stages = list(range(b_start, -1, -1))
    return k, a_stages, b_stages


@functools.lru_cache(maxsize=32)
def _twiddle_tables(n: int, log_l: int):
    tw = hostcircle.get_twiddles(n)
    k, a_stages, b_stages = _phase_plans(n, log_l)
    blk = 1 << k
    nb = 1 << (n - k)
    a_tabs = []
    for d in a_stages:
        e = 1 << (n - 1 - d)
        tab = np.tile(np.asarray(tw.eval_stage_twiddle(d)), blk // e)
        a_tabs.append(jnp.asarray(tab.reshape(blk, 1)))
    b_tabs = []
    for d in b_stages:
        size = 1 << (n - 1 - d)
        e_rows = max(size // blk, 1)
        tab = np.asarray(tw.eval_stage_twiddle(d))
        if size < blk:  # only possible for tiny n; tile across blk
            tab = np.tile(tab, blk // size)
        b_tabs.append(jnp.asarray(tab.reshape(e_rows, blk)))
    return a_tabs, b_tabs


def evaluate_fused(coeffs_rev: jnp.ndarray, n: int, interpret: bool = False):
    """Drop-in fused equivalent of core/fft.evaluate for log domain size n
    (requires n >= 10 and 2^(n//2) >= LANES; callers fall back otherwise)."""
    C, L_len = coeffs_rev.shape
    N = 1 << n
    log_l = L_len.bit_length() - 1
    k, a_stages, b_stages = _phase_plans(n, log_l)
    blk = 1 << k
    nb = N // blk
    assert nb >= LANES and blk >= LANES
    a_tabs, b_tabs = _twiddle_tables(n, log_l)

    if L_len < N:
        w = jnp.broadcast_to(
            coeffs_rev[:, :, None], (C, L_len, N // L_len)
        ).reshape(C, N)
    else:
        w = coeffs_rev

    if a_stages:
        wt = w.reshape(C, nb, blk).transpose(0, 2, 1)  # (C, blk, nb)
        stage_list = [
            (1 << (n - 1 - d), i) for i, d in enumerate(a_stages)
        ]
        kern = _phase_a_kernel_factory(tuple(stage_list))
        wt = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, blk, nb), jnp.uint32),
            grid=(C, nb // LANES),
            in_specs=[
                pl.BlockSpec((1, blk, LANES), lambda c, i: (c, 0, i),
                             memory_space=pltpu.VMEM),
            ]
            + [
                pl.BlockSpec((blk, 1), lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM)
                for _ in a_stages
            ],
            out_specs=pl.BlockSpec((1, blk, LANES), lambda c, i: (c, 0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(wt, *a_tabs)
        w = wt.transpose(0, 2, 1).reshape(C, N)

    if b_stages:
        wb = w.reshape(C, nb, blk)
        stage_list = []
        specs = [
            pl.BlockSpec((1, nb, LANES), lambda c, i: (c, 0, i),
                         memory_space=pltpu.VMEM)
        ]
        for i, d in enumerate(b_stages):
            e_rows = b_tabs[i].shape[0]
            reps = nb // e_rows
            stage_list.append((e_rows, i, reps))
            specs.append(
                pl.BlockSpec((e_rows, LANES), lambda c, i: (0, i),
                             memory_space=pltpu.VMEM)
            )
        kern = _phase_b_kernel_factory(tuple(stage_list))
        wb = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, nb, blk), jnp.uint32),
            grid=(C, blk // LANES),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, nb, LANES), lambda c, i: (c, 0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(wb, *b_tabs)
        w = wb.reshape(C, N)
    return w
