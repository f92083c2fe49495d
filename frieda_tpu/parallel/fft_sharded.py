"""Element-sharded circle FFT via shard_map: fused local passes + explicit
ppermute exchanges for the cross-shard stages.

The auto-sharded path (jit + with_sharding_constraint, parallel/sharding.py)
is bit-correct but falls back to the XLA stage loop — one HBM pass per
butterfly stage — because the fused Pallas kernels (ops/fft_pallas.py) do not
auto-partition. This module is the SPMD-native fast path (VERDICT r1 item 9):

  * The array is contiguously sharded over the mesh's "elem" axis, so the
    stage at bit p pairs j with j ^ 2^p — shard-LOCAL for every p below
    m = n - log2(S). Those stages run per-shard as the fused bounded-VMEM
    Pallas passes on TPU (the XLA stage loop elsewhere), with the FULL
    domain's twiddle tables: T_p is indexed j mod 2^p and shard offsets are
    multiples of 2^m >= 2^p, so every shard uses the same table slice.
  * The top log2(S) stages pair shard s with shard s ^ 2^i — one
    jax.lax.ppermute block swap per stage (the classic distributed-FFT
    exchange; rides ICI on a real slice), then one elementwise butterfly:
        low  shard (bit i of s = 0): out = x_self  + t * x_partner
        high shard (bit i of s = 1): out = x_partner - t * x_self
    The twiddle slice t is identical on both partners (offsets differ by
    exactly 2^p). Per-shard slices of the top tables are fed in pre-sharded
    as (S, N/S) arrays — no replicated 2^(n-1)-element table on any device.

Bit-exact with core/fft.evaluate on every mesh shape (tests/test_sharding.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6: top-level export (the experimental path warns on 0.8+)
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        # The top-level API renamed check_rep -> check_vma.
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core import circle as hostcircle
from ..core import fft
from ..core.field import m31_add, m31_mul, m31_sub


@functools.lru_cache(maxsize=32)
def _top_tables(n: int, log_s: int):
    """Pre-sharded twiddle slices for the cross-shard stages: for stage
    i (global bit p = n - log_s + i) an (S, N/S) uint32 array whose row s is
    T_p[(s mod 2^i) * N/S : +N/S] — placed with P("elem", None) each shard
    receives exactly its slice."""
    S = 1 << log_s
    nl = 1 << (n - log_s)
    tw = hostcircle.get_twiddles(n)
    tabs = []
    for i in range(log_s):
        p = n - log_s + i
        t_full = np.asarray(tw.eval_stage_twiddle(n - 1 - p))  # (2^p,)
        rows = np.empty((S, nl), np.uint32)
        for s in range(S):
            off = (s % (1 << i)) * nl
            rows[s] = t_full[off : off + nl]
        tabs.append(rows)
    return tuple(tabs)


def _supported(n: int, log_l: int, log_s: int) -> bool:
    """Shapes the shard_map path handles: every shard must hold >= 1
    coefficient and >= 2 elements, and the local transform must be
    non-degenerate."""
    return log_l >= log_s and n - log_s >= 1 and log_s >= 0


def sharded_evaluate(coeffs_rev: jnp.ndarray, n: int, mesh: Mesh,
                     interpret: bool = False) -> jnp.ndarray:
    """Evaluate (C, 2^L) bit-reversed-order coefficients onto the 2^n domain,
    element-sharded over mesh axis "elem". Drop-in for fft.evaluate under
    SPMD; returns (C, 2^n) natural order, sharded P(None, "elem").

    On TPU the local stages use the fused Pallas kernels when the local shape
    qualifies (ops/fft_pallas.supported); elsewhere the XLA stage loop. Both
    are bit-exact, so CPU-mesh tests validate the shard_map structure the TPU
    runs."""
    C, L_len = coeffs_rev.shape
    log_l = L_len.bit_length() - 1
    S = mesh.shape["elem"]
    log_s = S.bit_length() - 1
    assert S == 1 << log_s, "elem axis must be a power of two"
    if not _supported(n, log_l, log_s):
        return fft.evaluate(coeffs_rev, fft.stage_twiddles(n))
    m = n - log_s
    # Local-stage twiddles: global tables for depths >= log_s (bit < m).
    local_tw = fft.stage_twiddles(n)[log_s:]
    top_tabs = _top_tables(n, log_s)

    try:
        use_pallas = jax.default_backend() == "tpu" or interpret
    except Exception:  # pragma: no cover
        use_pallas = False

    def local_fn(w, *tops):
        # w: (C, L/S) — this shard's contiguous chunk of bit-reversed coeffs.
        # Local stages (bits [n - log_l, m)), dilation included:
        if use_pallas:
            from ..ops import fft_pallas

            if fft_pallas.supported(m, log_l - log_s) or interpret:
                # local_tw[i] = full-domain stage table at depth log_s + i,
                # i.e. bit p = n - 1 - (log_s + i) => i = m - 1 - p.
                w = fft_pallas.evaluate_fused(
                    w, m, interpret=interpret, n_tw=n,
                    table_for_bit=lambda p: local_tw[m - 1 - p],
                )
            else:
                w = fft.evaluate(w, local_tw)
        else:
            w = fft.evaluate(w, local_tw)
        # Cross-shard stages: one block ppermute + elementwise butterfly each.
        axis_idx = jax.lax.axis_index("elem")
        for i in range(log_s):
            t = tops[i]  # (1, N/S): this shard's twiddle slice
            perm = [(s, s ^ (1 << i)) for s in range(S)]
            other = jax.lax.ppermute(w, "elem", perm=perm)
            is_high = ((axis_idx >> i) & 1).astype(jnp.uint32)
            u_self = m31_mul(t, w)
            u_other = m31_mul(t, other)
            w = jnp.where(
                is_high == 1, m31_sub(other, u_self), m31_add(w, u_other)
            )
        return w

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, "elem"),) + (P("elem", None),) * log_s,
        out_specs=P(None, "elem"),
        check_rep=False,
    )
    return fn(coeffs_rev, *(jnp.asarray(t) for t in top_tabs))
