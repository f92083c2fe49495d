"""Circle FFT (low-degree extension) as vectorized JAX stage loops.

Evaluates circle polynomials (basis y^{b0} x^{b1} prod pi^{j-2}(x)^{bj},
SURVEY.md A.4) over the canonic CircleDomain — the TPU-native equivalent of
stwo's `evaluate_with_twiddles` used at /root/reference/src/commit.rs:15-16
and src/proof.rs:47-50.

Layout (see core/circle.py): the device consumes coefficients in
*bit-reversed* order (a free host-side permutation fused into ingest) and
produces evaluations in *natural* domain order. With this choice every
butterfly stage reads and writes whole contiguous sub-blocks — the write of
stage depth d fills the two halves of each 2^(n-d)-element block — so no
stage performs a lane-level interleave, and conjugate/±x pairs land in array
halves for the Merkle/FRI consumers. The reference's bit-reversed storage
order is recovered purely by host index arithmetic (stored s = bitrev(j)).

Stage recurrence (depth d = n-1 ... 0, natural-order twiddle tables T_d from
core/circle.py, |T_d| = 2^(n-1-d)):

    out[.., 0, e] = g0[.., e] + T_d[e] * g1[.., e]
    out[.., 1, e] = g0[.., e] - T_d[e] * g1[.., e]

Each stage is one fused elementwise pass (1 M31 mul + add + sub per pair),
HBM-bandwidth-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import circle as hostcircle
from .field import m31_add, m31_mul, m31_sub


@functools.lru_cache(maxsize=16)
def _stage_twiddles_np(log_size: int) -> tuple:
    tw = hostcircle.get_twiddles(log_size)
    return tuple(
        np.asarray(tw.eval_stage_twiddle(d), np.uint32) for d in range(log_size)
    )


_stage_twiddles_dev: dict = {}


def stage_twiddles(log_size: int) -> tuple:
    """Device twiddle tables for `evaluate`, index d = depth (0 = y stage),
    natural order, sizes 2^(n-1-d). Cached per log_size.

    Safe to call inside a jit trace: the tables become trace constants there
    and are NOT cached (caching a tracer would leak it into later traces —
    jax.errors.UnexpectedTracerError); the device-array cache only ever holds
    concrete arrays."""
    cached = _stage_twiddles_dev.get(log_size)
    if cached is not None:
        return cached
    vals = tuple(jnp.asarray(t) for t in _stage_twiddles_np(log_size))
    if any(isinstance(v, jax.core.Tracer) for v in vals):
        return vals  # inside a trace: constants for this trace only
    _stage_twiddles_dev[log_size] = vals
    return vals


def bitrev_coeffs(coeffs: np.ndarray) -> np.ndarray:
    """Host-side: permute natural-order coefficients (C, 2^L) into the
    bit-reversed order `evaluate` consumes."""
    log_l = int(coeffs.shape[-1]).bit_length() - 1
    return np.ascontiguousarray(np.take(coeffs, hostcircle.bitrev_permutation(log_l), axis=-1))


_bitrev_perm_dev: dict = {}


def bitrev_perm_device(log_l: int) -> jnp.ndarray:
    """Device-resident bit-reversal index (int32), cached per log size.
    Single-chip hot paths upload NATURAL-order coefficients and apply the
    permutation as a device gather (XLA fuses it into the dilation
    broadcast) — ~100x cheaper than the host-side numpy gather at 2^20+.
    Trace-safe like stage_twiddles: tracers are never cached."""
    cached = _bitrev_perm_dev.get(log_l)
    if cached is not None:
        return cached
    val = jnp.asarray(hostcircle.bitrev_permutation(log_l).astype(np.int32))
    if isinstance(val, jax.core.Tracer):
        return val
    _bitrev_perm_dev[log_l] = val
    return val


def apply_bitrev(coeffs: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Device gather: natural-order (C, 2^L) -> bit-reversed order."""
    return jnp.take(coeffs, perm, axis=-1)


def evaluate(coeffs_rev: jnp.ndarray, twiddles) -> jnp.ndarray:
    """Evaluate C coordinate polynomials over the domain of log size n.

    coeffs_rev: (C, 2^L) uint32, *bit-reversed* coefficient order
    (bitrev_coeffs), L <= n; zero-extension to the domain (the Reed-Solomon
    blowup) happens here as a free dilation.
    twiddles: stage_twiddles(n). Returns (C, 2^n) uint32 evaluations in
    natural domain order.

    Four-step structure: the first k = n//2 stages touch only the low k index
    bits (sub-lane strides), so they run on a transposed (C, 2^k, 2^(n-k))
    view where those bits are the *major* axis — every op then has a long
    contiguous minor dimension. The remaining stages have block sizes
    >= 2^k and run in the flat layout. Two tiled transposes replace ~n/2
    lane-interleave relayouts (a huge win in both XLA compile time and HBM
    efficiency).
    """
    n = len(twiddles)
    C, L_len = coeffs_rev.shape
    N = 1 << n
    assert L_len <= N and N % L_len == 0
    log_l = L_len.bit_length() - 1
    # Zero-extension shortcut: the dilated vector's first (n - L) stages are
    # pure copies (the odd child polynomial is zero), so their composition is
    # exactly "broadcast each coefficient over its 2^(n-L) dilation block".
    if L_len < N:
        w = jnp.broadcast_to(
            coeffs_rev[:, :, None], (C, L_len, N // L_len)
        ).reshape(C, N)
    else:
        w = coeffs_rev
    start = min(n - 1, log_l - 1)  # log_l == 0: constant poly, no stages
    if n >= 10 and start > 0:
        k = n // 2
        blk = 1 << k
        nb = N // blk
        if start > n - 1 - k:
            wt = w.reshape(C, nb, blk).transpose(0, 2, 1)  # (C, blk, nb)
            for d in range(start, n - 1 - k, -1):
                e = 1 << (n - 1 - d)  # e < blk: within-block stage
                rows = blk // (2 * e)
                wv = wt.reshape(C, rows, 2, e, nb)
                g0 = wv[:, :, 0]
                g1 = wv[:, :, 1]
                t = m31_mul(twiddles[d][None, None, :, None], g1)
                wt = jnp.stack([m31_add(g0, t), m31_sub(g0, t)], axis=2).reshape(
                    C, blk, nb
                )
            w = wt.transpose(0, 2, 1).reshape(C, N)
        start = min(start, n - 1 - k)
    for d in range(start, -1, -1):
        e = 1 << (n - 1 - d)  # block (and twiddle) size
        wv = w.reshape(C, 1 << d, 2, e)
        g0 = wv[:, :, 0, :]
        g1 = wv[:, :, 1, :]
        t = m31_mul(twiddles[d][None, None, :], g1)
        w = jnp.stack([m31_add(g0, t), m31_sub(g0, t)], axis=2).reshape(C, N)
    return w


def evaluate_auto(coeffs_rev: jnp.ndarray, twiddles) -> jnp.ndarray:
    """evaluate(), but on TPU use the fused Pallas kernels
    (ops/fft_pallas.py) when the shape allows — 4 HBM passes instead of ~n.
    Sharded/SPMD callers should use evaluate() (Pallas kernels don't
    auto-partition)."""
    n = len(twiddles)
    log_l = int(coeffs_rev.shape[-1]).bit_length() - 1
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        from ..ops import fft_pallas

        if fft_pallas.supported(n, log_l):
            # pass tables as runtime views of the twiddle args — staging them
            # as HLO constants breaks AOT compiles at n >= 24 (100s of MB)
            return fft_pallas.evaluate_fused(
                coeffs_rev, n, table_for_bit=lambda p: twiddles[n - 1 - p]
            )
    return evaluate(coeffs_rev, twiddles)


def evaluate_jit(coeffs_rev: jnp.ndarray, log_domain_size: int) -> jnp.ndarray:
    """Jitted evaluate; twiddles passed as runtime args (not baked-in consts)
    so one executable per (shape, log size) stays small."""
    return _evaluate_jitted(coeffs_rev, stage_twiddles(log_domain_size))


@jax.jit
def _evaluate_jitted(coeffs_rev, twiddles):
    return evaluate(coeffs_rev, twiddles)
