"""Fused Pallas circle-FFT kernels (bounded-VMEM multi-pass).

The XLA stage loop (core/fft.py) costs one full HBM pass per butterfly stage.
These kernels fuse *groups* of stages into single passes, with every group's
working set bounded so Mosaic never exceeds the ~16 MB VMEM scoped limit at
any domain size (the previous two-phase four-step blew past it at 2^22+).

Stage model (core/fft.py): stage at bit position p pairs flat indices j and
j ^ 2^p with twiddle t[j] = T_p[j mod 2^p]; executed p's run p_min..n-1 where
p_min = n - log_l (lower bits are the free Reed-Solomon dilation broadcast).
Butterfly without reshapes (Mosaic-friendly), combine distance e along an
axis:

  out[j] = x[j] + t[j] * x[j+e]      where (j & e) == 0
  out[j] = x[j-e] - t[j] * x[j]      where (j & e) != 0

— the partner reads are cyclic rolls by ±e (wrap lanes never selected).

Pass types:
  low pass  — bits [p_min, c0), c0 <= LOW_BITS_MAX: runs on the transposed
              (C, 2^c0, N/2^c0) view so sub-lane strides become the sublane
              axis; twiddles are lane-invariant (rows, 1) tables.
  mid pass  — bits [b, c), 2^b >= LANES: runs on the natural
              (C, hi, 2^(c-b), 2^b) view; butterflies go along the mid axis,
              lanes are low bits; each stage's table is (rows, LANES)
              BlockSpec-sliced per lane chunk and broadcast up the mid axis.

Group widths are capped (GROUP_BITS_MAX) so a block is at most
(2^GROUP_BITS_MAX, LANES) u32 = 512 KB; with ~8 live temporaries per
butterfly plus twiddle tables a pass stays well under 8 MB of VMEM.

Whole transform at n=24: transpose, low pass, transpose, two mid passes —
~6 HBM passes instead of ~24. Bit-exact with core/fft.evaluate
(tests/test_fft_pallas.py).
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
GROUP_BITS_MAX = 10   # butterfly axis <= 1024 rows per pass
LOW_BITS_MAX = 10     # transposed low pass covers bits [p_min, min(10, ...))


def _butterfly_2d(x, t, e: int):
    """One in-VMEM butterfly along the sublane axis. x: (M, LANES), combine
    distance e rows; t: (M, LANES) or (M, 1) twiddles (already expanded).

    The stage twiddle table is periodic with period e rows (t[j] == t[j^e]:
    it is T_p[j mod 2^p] tiled/broadcast, and e == 2^p), so a single M31
    product u = t*x serves both branches: t[j]*x[j+e] == u[j+e] and
    t[j]*x[j] == u[j]. Halves the dominant VPU cost vs multiplying both
    rolled operands.

    Used only for e < 8: larger distances take _butterfly_halves, which
    avoids the rolls/iota/select entirely (but needs the pair axis to be
    sublane-tile-aligned, i.e. e >= 8)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    mask = (idx & e) == 0
    u = m31_mul(t, x)
    a = m31_add(x, jnp.roll(u, -e, axis=0))
    b = m31_sub(jnp.roll(x, e, axis=0), u)
    return jnp.where(mask, a, b)


def _butterfly_halves(x, tw, e: int):
    """Butterfly along the sublane axis for e >= 8, halves form. x: (M, L),
    combine distance e rows; tw: (e, L) or (e, 1) one twiddle period.

    View (M, L) as (M/2e, 2, e, L): the pair axis is axis 1, so
      out0 = x0 + t*x1,  out1 = x0 - t*x1
    costs one M31 product over HALF the elements and no roll/iota/select —
    ~2.5x fewer VPU ops than _butterfly_2d. e >= 8 keeps the (e, L) minor
    dims tile-aligned so all reshapes are free address arithmetic."""
    m, lanes = x.shape
    x4 = x.reshape(m // (2 * e), 2, e, lanes)
    x0 = x4[:, 0]
    u = m31_mul(tw[None], x4[:, 1])
    return jnp.stack([m31_add(x0, u), m31_sub(x0, u)], axis=1).reshape(m, lanes)


def _low_kernel_factory(stage_rows):
    """Transposed low pass. stage_rows: (e_rows, ...) per stage; twiddle
    tables are (blk, 1) lane-invariant inputs following x_ref."""

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        x = x_ref[0]  # (blk, LANES)
        for i, e in enumerate(stage_rows):
            if e >= 8:
                # table is the period tiled to (blk, 1): one period suffices
                x = _butterfly_halves(x, refs[i][0:e, :], e)
            else:
                x = _butterfly_2d(x, refs[i][:, :], e)
        out_ref[0] = x

    return kernel


def _butterfly_halves_full(x, tw_pairs, e: int):
    """_butterfly_halves with a FULL per-pair twiddle table (M/2, 1) in
    pair-first-element row order (needed when the table is not periodic in
    the current row order — the tile-major dilated low pass)."""
    m, lanes = x.shape
    x4 = x.reshape(m // (2 * e), 2, e, lanes)
    x0 = x4[:, 0]
    u = m31_mul(tw_pairs.reshape(m // (2 * e), e, 1), x4[:, 1])
    return jnp.stack([m31_add(x0, u), m31_sub(x0, u)], axis=1).reshape(m, lanes)


def _low_dil_kernel_factory(stage_es, dil: int):
    """Dilation-fused transposed low pass. The input block is the UNDILATED
    (blk/dil, LANES) coefficients; the Reed-Solomon dilation happens in VMEM
    as `dil` stacked copies (tile-major row order v' = v_lo*in_rows + v_hi,
    a plain sublane concatenation Mosaic handles natively — the interleaved
    v-order broadcast crashes its vector-layout pass). Butterfly distances
    shrink to e' = 2^(p - p_min) rows and the twiddle tables arrive already
    permuted to v'-order (_dil_low_tabs); the caller's transpose-out undoes
    the row permutation for free (it is one reshaped XLA transpose either
    way)."""

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        xc = x_ref[0]  # (blk/dil, LANES)
        x = jnp.concatenate([xc] * dil, axis=0)
        for i, e in enumerate(stage_es):
            if e >= 8:
                x = _butterfly_halves_full(x, refs[i][:, :], e)
            else:
                x = _butterfly_2d(x, refs[i][:, :], e)
        out_ref[0] = x

    return kernel


def _dil_low_tabs(low_tabs, dil: int):
    """Convert v-order (blk, 1) low-pass tables to the tile-major v'-order
    the dilating kernel runs in: v = v_hi*dil + v_lo -> v' = v_lo*in_rows +
    v_hi. Stages with e' >= 8 get the pair-compressed (blk/2, 1) form for
    _butterfly_halves_full. Works on numpy or jnp arrays."""
    out = []
    for i, t in enumerate(low_tabs):
        e_p = 1 << i  # e' = 2^(p - p_min) for the i-th executed low stage
        blk = t.shape[0]
        in_rows = blk // dil
        tv2 = t.reshape(in_rows, dil).T.reshape(blk, 1)
        if e_p >= 8:
            tv2 = tv2.reshape(-1, 2, e_p)[:, 0].reshape(blk // 2, 1)
        out.append(tv2)
    return out


def _mid_kernel_factory(stage_list):
    """Natural-layout mid pass. stage_list: [(rows, reps), ...]; tables are
    (rows, LB) inputs following x_ref, broadcast `reps` times up the mid
    axis (LB = lane-block width, a multiple of LANES)."""

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        x = x_ref[0, 0]  # (mid, LB)
        mid, lb = x.shape
        for i, (rows, reps) in enumerate(stage_list):
            tw = refs[i][:, :]  # (rows, LB)
            if rows >= 8:
                # halves form: (mid, lb) -> (reps/2, 2, rows, lb) is a free
                # view (minor dims keep their tiling); the pair axis is the
                # new axis 1, so no roll/iota/select and the M31 product
                # touches only half the elements.
                x = _butterfly_halves(x, tw, rows)
            else:
                # rows in {1, 2, 4}: build the periodic table with sublane
                # splats + a select tree (cheaper than an interleaving
                # reshape of a broadcast at sublane granularity).
                if rows == 1:
                    t = jnp.broadcast_to(tw, (mid, lb))
                else:
                    idx = jax.lax.broadcasted_iota(jnp.int32, (mid, lb), 0)
                    t = jnp.broadcast_to(tw[0:1], (mid, lb))
                    for r in range(1, rows):
                        t = jnp.where(
                            (idx & (rows - 1)) == r,
                            jnp.broadcast_to(tw[r : r + 1], (mid, lb)),
                            t,
                        )
                x = _butterfly_2d(x, t, rows)
        out_ref[0, 0] = x

    return kernel


@functools.lru_cache(maxsize=64)
def _pass_plan(n: int, log_l: int):
    """Group the executed stage bits [p_min, n) into a low pass + mid passes.

    Returns (p_min, c0, mid_groups) where mid_groups is a tuple of (b, c)
    half-open bit ranges. c0 == p_min means no low pass."""
    p_min = n - log_l if log_l > 0 else n  # log_l == 0: no butterflies
    if p_min >= n:
        return p_min, p_min, ()
    if p_min < 7:
        # low-pass lane axis is N / 2^c0: keep it >= LANES (c0 <= n - 7)
        c0 = min(LOW_BITS_MAX, n - 7)
    else:
        c0 = p_min  # all executed bits already have lo >= 128: no low pass
    # near-equal mid groups: a small-`mid` trailing group is measurably
    # slower than two balanced ones (its blocks are sublane-starved)
    total = n - c0
    n_groups = -(-total // GROUP_BITS_MAX) if total else 0
    groups = []
    b = c0
    for g in range(n_groups):
        c = c0 + total * (g + 1) // n_groups
        groups.append((b, c))
        b = c
    return p_min, c0, tuple(groups)


@functools.lru_cache(maxsize=64)
def _twiddle_tables(n: int, log_l: int, n_tw: int | None = None):
    """Twiddle tables per pass, as NUMPY arrays. Low pass: [(blk, 1)] per
    stage. Mid groups: [[(rows, lo)] per stage] (BlockSpec slices lanes).

    `n_tw` (default n): log size of the DOMAIN the twiddles come from. The
    sharded FFT (parallel/fft_sharded.py) runs these kernels on a local
    2^n-element shard of a 2^n_tw-element domain — the stage at bit p then
    needs the full domain's table (length 2^p, identical on every shard
    because it is indexed j mod 2^p and shard offsets are multiples of the
    local size >= 2^p).

    Numpy (not jnp) on purpose: this cache is populated during jit tracing,
    and jnp arrays created inside a trace can be tracer-backed — caching them
    leaks tracers into later traces (UnexpectedTracerError). Numpy constants
    are staged fresh by each pallas_call."""
    n_tw = n if n_tw is None else n_tw
    tw = hostcircle.get_twiddles(n_tw)
    p_min, c0, groups = _pass_plan(n, log_l)

    def table(p):  # natural-order twiddles for distance-2^p stage, length 2^p
        return np.asarray(tw.eval_stage_twiddle(n_tw - 1 - p))

    low_tabs = []
    if c0 > p_min:
        blk = 1 << c0
        for p in range(p_min, c0):
            tab = np.tile(table(p), blk >> p)  # (blk,), lane-invariant
            low_tabs.append(np.ascontiguousarray(tab.reshape(blk, 1)))
    mid_tabs = []
    for b, c in groups:
        lo = 1 << b
        tabs = []
        for p in range(b, c):
            tabs.append(np.ascontiguousarray(table(p).reshape(1 << (p - b), lo)))
        mid_tabs.append(tabs)
    return low_tabs, mid_tabs


def _run_low_pass(w, n, p_min, c0, low_tabs, interpret):
    C = w.shape[0]
    N = 1 << n
    blk = 1 << c0
    nb = N // blk
    wt = w.reshape(C, nb, blk).transpose(0, 2, 1)  # (C, blk, nb)
    stage_rows = tuple(1 << p for p in range(p_min, c0))
    kern = _low_kernel_factory(stage_rows)
    wt = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, blk, nb), jnp.uint32),
        grid=(C, nb // LANES),
        in_specs=[
            pl.BlockSpec((1, blk, LANES), lambda c, i: (c, 0, i),
                         memory_space=pltpu.VMEM)
        ]
        + [
            pl.BlockSpec((blk, 1), lambda c, i: (0, 0), memory_space=pltpu.VMEM)
            for _ in stage_rows
        ],
        out_specs=pl.BlockSpec((1, blk, LANES), lambda c, i: (c, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(wt, *low_tabs)
    return wt.transpose(0, 2, 1).reshape(C, N)


def _run_low_pass_dilating(coeffs_rev, n, p_min, c0, low_tabs, dil, interpret):
    """Dilation-fused low pass: reads the UNDILATED (C, N/dil) coefficients
    (the transpose-in moves dil x fewer bytes and the dilated array never
    exists in HBM), runs the [p_min, c0) stages in tile-major v'-order in
    VMEM, and un-permutes in the (single, reshaped) transpose-out."""
    C = coeffs_rev.shape[0]
    N = 1 << n
    blk = 1 << c0
    in_rows = blk // dil
    nb = N // blk
    ct = coeffs_rev.reshape(C, nb, in_rows).transpose(0, 2, 1)  # (C, in_rows, nb)
    stage_es = tuple(1 << (p - p_min) for p in range(p_min, c0))
    tabs = _dil_low_tabs(low_tabs, dil)
    kern = _low_dil_kernel_factory(stage_es, dil)
    wt = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, blk, nb), jnp.uint32),
        grid=(C, nb // LANES),
        in_specs=[
            pl.BlockSpec((1, in_rows, LANES), lambda c, i: (c, 0, i),
                         memory_space=pltpu.VMEM)
        ]
        + [
            pl.BlockSpec(t.shape, lambda c, i: (0, 0), memory_space=pltpu.VMEM)
            for t in tabs
        ],
        out_specs=pl.BlockSpec((1, blk, LANES), lambda c, i: (c, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ct, *tabs)
    # wt rows are v' = v_lo*in_rows + v_hi; natural j = u*blk + v_hi*dil + v_lo
    # -> axes (u, v_hi, v_lo): one reshaped transpose does un-permute +
    # transpose-out together.
    return wt.reshape(C, dil, in_rows, nb).transpose(0, 3, 2, 1).reshape(C, N)


def _mid_lane_block(mid: int, lo: int) -> int:
    """Lane-block width for a mid pass: aim for ~2^16-element blocks (256 KB)
    so shallow groups (small `mid`) don't degenerate into thousands of tiny
    latency-bound grid steps, while deep groups keep LANES-wide blocks."""
    lb = max(LANES, (1 << 16) // mid)
    return min(lb, lo)


def _run_mid_pass(w, n, b, c, tabs, interpret):
    C = w.shape[0]
    N = 1 << n
    lo = 1 << b
    mid = 1 << (c - b)
    hi = N // (lo * mid)
    lb = _mid_lane_block(mid, lo)
    wb = w.reshape(C, hi, mid, lo)
    # (rows, reps) with reps = mid // rows
    stage_list = tuple((1 << (p - b), mid // (1 << (p - b))) for p in range(b, c))
    kern = _mid_kernel_factory(stage_list)
    in_specs = [
        pl.BlockSpec((1, 1, mid, lb), lambda cc, h, i: (cc, h, 0, i),
                     memory_space=pltpu.VMEM)
    ]
    for p in range(b, c):
        rows = 1 << (p - b)
        in_specs.append(
            pl.BlockSpec((rows, lb), lambda cc, h, i: (0, i),
                         memory_space=pltpu.VMEM)
        )
    wb = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, hi, mid, lo), jnp.uint32),
        grid=(C, hi, lo // lb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, mid, lb), lambda cc, h, i: (cc, h, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(wb, *tabs)
    return wb.reshape(C, N)


def supported(n: int, log_l: int) -> bool:
    """Shapes the fused path handles (callers fall back to the stage loop)."""
    if log_l <= 0 or n < 14:
        return False
    p_min, c0, groups = _pass_plan(n, log_l)
    if p_min < 7 and c0 <= p_min:  # tiny poly, huge blowup: no valid low pass
        return False
    if c0 > p_min and (1 << n) // (1 << c0) < LANES:
        return False
    return all((1 << b) >= LANES for b, _ in groups)


def evaluate_fused(coeffs_rev: jnp.ndarray, n: int, interpret: bool = False,
                   n_tw: int | None = None, table_for_bit=None):
    """Drop-in fused equivalent of core/fft.evaluate for log domain size n.
    With `n_tw > n` this computes the LOCAL (lowest-n-bits) stages of a
    2^n_tw-size transform on one contiguous 2^n-element shard (see
    _twiddle_tables).

    `table_for_bit(p) -> (2^p,) uint32` supplies the natural-order stage
    table for bit p as a RUNTIME array (normally a view of the caller's
    stage_twiddles jit argument). Without it the tables are staged as HLO
    constants — fine for small/test shapes, but at n=24+ the constants reach
    hundreds of MB and the AOT compile request is rejected, so every hot
    caller passes it."""
    C, L_len = coeffs_rev.shape
    N = 1 << n
    log_l = L_len.bit_length() - 1
    p_min, c0, groups = _pass_plan(n, log_l)
    if table_for_bit is None:
        low_tabs, mid_tabs = _twiddle_tables(n, log_l, n_tw)
    else:
        low_tabs = []
        if c0 > p_min:
            blk = 1 << c0
            for p in range(p_min, c0):
                low_tabs.append(
                    jnp.tile(table_for_bit(p), blk >> p).reshape(blk, 1)
                )
        mid_tabs = [
            [table_for_bit(p).reshape(1 << (p - b), 1 << b) for p in range(b, c)]
            for b, c in groups
        ]

    dil = N // L_len
    if c0 > p_min and dil > 1 and (1 << c0) // dil >= 8:
        # dilation fused into the low pass: the kernel reads the UNDILATED
        # coefficients (transpose-in moves dil x fewer bytes) and stacks
        # copies in VMEM; the 2^p_min-times-larger dilated array never
        # exists in HBM.
        w = _run_low_pass_dilating(coeffs_rev, n, p_min, c0, low_tabs, dil,
                                   interpret)
    else:
        if L_len < N:  # Reed-Solomon dilation broadcast (bits [0, p_min))
            w = jnp.broadcast_to(
                coeffs_rev[:, :, None], (C, L_len, dil)
            ).reshape(C, N)
        else:
            w = coeffs_rev
        if c0 > p_min:
            w = _run_low_pass(w, n, p_min, c0, low_tabs, interpret)
    for (b, c), tabs in zip(groups, mid_tabs):
        w = _run_mid_pass(w, n, b, c, tabs, interpret)
    return w
