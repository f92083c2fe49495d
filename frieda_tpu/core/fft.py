"""Circle FFT (low-degree extension) as vectorized JAX stage loops.

Evaluates circle polynomials (natural-order coefficients, basis
y^{b0} x^{b1} prod pi^{j-2}(x)^{bj}, SURVEY.md A.4) over the canonic
CircleDomain, producing bit-reversed storage order (SURVEY.md A.5) — the
TPU-native equivalent of stwo's `evaluate_with_twiddles` used at
/root/reference/src/commit.rs:15-16 and src/proof.rs:47-50.

Each stage is one fused elementwise pass over the full table
(1 M31 mul + 1 add + 1 sub per butterfly pair), so the whole transform is
HBM-bandwidth-bound; XLA fuses the reshape/stack shuffles into the pass.
Twiddles are precomputed host-side (core/circle.py) and passed as device
arrays so the jitted function is reusable across inputs of the same shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import circle as hostcircle
from .field import m31_add, m31_mul, m31_sub


def stage_twiddles(log_size: int) -> list[jnp.ndarray]:
    """Device twiddle list for `evaluate`: index d = depth (0 = y stage),
    sizes 2^(n-1-d). Cached per log_size."""
    return _stage_twiddles_cached(log_size)


@functools.lru_cache(maxsize=16)
def _stage_twiddles_cached(log_size: int):
    tw = hostcircle.get_twiddles(log_size)
    return [
        jnp.asarray(tw.eval_stage_twiddle(d), jnp.uint32)
        for d in range(log_size)
    ]


def evaluate(coeffs: jnp.ndarray, twiddles: list[jnp.ndarray]) -> jnp.ndarray:
    """Evaluate C coordinate polynomials over the domain of log size n.

    coeffs: (C, 2^L) uint32, natural coefficient order, L <= n. Coefficients
    are zero-extended to the domain size (the Reed-Solomon blowup).
    twiddles: stage_twiddles(n).
    Returns (C, 2^n) uint32 evaluations in bit-reversed storage order.
    """
    n = len(twiddles)
    C, L = coeffs.shape[0], coeffs.shape[1]
    N = 1 << n
    assert L <= N
    w = jnp.zeros((C, N), jnp.uint32).at[:, :L].set(coeffs)
    # Invariant before stage d: w has shape (C, 2^(d+1), 2^(n-1-d)) flattened;
    # axis-1 rows are sub-polynomials indexed by low coefficient bits with
    # bit i_d leading, axis-2 is the evaluated index of the child layer.
    for d in range(n - 1, -1, -1):
        k = 1 << (n - 1 - d)
        win = w.reshape(C, 2, 1 << d, k)
        g0 = win[:, 0]
        g1 = win[:, 1]
        t = m31_mul(twiddles[d][None, None, :], g1)
        out = jnp.stack([m31_add(g0, t), m31_sub(g0, t)], axis=-1)
        w = out.reshape(C, 1 << d, 2 * k)
    return w.reshape(C, N)


def evaluate_jit(coeffs: jnp.ndarray, log_domain_size: int) -> jnp.ndarray:
    """Jitted evaluate; twiddles passed as runtime args (not baked-in consts)
    so one executable per (shape, log size) stays small."""
    return _evaluate_jitted(coeffs, tuple(stage_twiddles(log_domain_size)))


@functools.partial(jax.jit, static_argnums=())
def _evaluate_jitted(coeffs, twiddles):
    return evaluate(coeffs, list(twiddles))
