"""Phase spans + per-kernel roofline counters.

The reference's only perf tooling is inert `tracing` spans inside stwo and a
criterion harness (SURVEY.md §5); this module is the TPU-native replacement:

  * `span(name)` — wall-clock phase timer that doubles as a
    `jax.profiler.TraceAnnotation`, so phases show up in XLA profiler traces
    (`jax.profiler.trace(dir)`) and in plain stderr timing.
  * roofline models for the two hot kernel families (BASELINE.json demands
    per-kernel speed-of-light accounting). The commit pipeline is a MIXED
    roofline: the FFT butterfly passes are VPU-int-multiply-bound (measured
    ~127 GB/s-equivalent vs a 579 GB/s measured pure-copy stream on the same
    chip) and the blake2s Merkle levels are pure VPU-compute-bound (measured
    at the VPU ceiling), so speed-of-light is
        max(bytes / HBM_BW,  (fft_ops + blake_ops) / VPU_throughput)
    — an HBM-only model would report a misleading ~15% "SoL" for a pipeline
    that is actually near its compute ceiling.

Calibration (round 4, single v5e via the tunnel, chained-pass timing with
dispatch overhead subtracted): copy pass 579 GB/s; 8-stage fused butterfly
pass 16.8 ms at 2^28 elements; leaf+2-level fused blake pass 38.6 ms at
2^26 leaves. The VPU constant and per-op counts below reproduce those.

Numbers returned are *model* vs *measured*: `sol_fraction` ~1.0 means the
kernel saturates the binding hardware ceiling; no constant here affects
correctness.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

import jax

# Per-chip HBM bandwidth ceilings (GB/s). Used only for reporting.
_HBM_GBPS = {
    "v5e": 819.0,  # TPU v5e (v5 lite)
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6e": 1640.0,
    "cpu": 50.0,  # order-of-magnitude placeholder for the CPU backend
}


def hbm_gbps() -> float:
    """Best-effort HBM bandwidth of the attached device for roofline ratios."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return _HBM_GBPS["cpu"]
    for key, bw in _HBM_GBPS.items():
        if key in kind:
            return bw
    return _HBM_GBPS["v5e"]


_SENTINEL = object()


def spans_enabled() -> bool:
    """Stderr span printing is opt-in (FRIEDA_SPANS=1); TraceAnnotations are
    always emitted (they're free unless a jax.profiler trace is active)."""
    return os.environ.get("FRIEDA_SPANS", "") not in ("", "0")


@contextlib.contextmanager
def span(name: str, out=_SENTINEL):
    """Wall-clock + profiler-trace span around a phase. Prints to stderr when
    FRIEDA_SPANS=1 (or an explicit `out` stream is passed); always annotates
    the XLA profiler timeline."""
    if out is _SENTINEL:
        out = sys.stderr if spans_enabled() else None
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if out is not None:
                print(f"[span] {name}: {dt * 1e3:.2f} ms", file=out, flush=True)


# VPU integer throughput (ops/s) used by the compute side of the roofline:
# ~4 ALUs x (8, 128) lanes x 0.94 GHz for v5e. Per-op counts calibrated
# against measured chained-pass timings (module docstring).
_VPU_OPS = {"v5e": 3.9e12, "v5p": 15.6e12, "v4": 7.8e12, "v6e": 7.8e12,
            "cpu": 1e11}

# ---------------------------------------------------------------------------
# Analytic per-op derivations (VERDICT r4 item 4) — counts a reviewer can
# re-derive from the kernel source, independent of our own measurements.
#
# BLAKE2s compression (ops/merkle_pallas._compress16, 10 rounds x 8 G):
#   one G (RFC 7693): 6 adds, 4 xors, 4 rotates. The VPU has no rotate
#   instruction, so ror r = shr + shl + or = 3 ops — EXCEPT that ror16/ror8
#   are byte-aligned and can lower to a single byte-shuffle op. Two bounds:
#     rotate=3 ops each : G = 6 + 4 + 4*3        = 22 -> 10*8*22 + 16 = 1776
#     ror16/8 single-op : G = 6 + 4 + (3+3+1+1)  = 18 -> 10*8*18 + 16 = 1456
#   (+16 is the final v[i]^v[i+8] feed-forward xor over 8 output words.)
#   Leaf compressions constant-fold further (12 of 16 message words are the
#   literal 0, and the all-constant state makes ~6 of round-0's G's free):
#   ~120 skipped zero-adds + ~120 folded round-0 ops => leaf ~= inner - 240.
#   A tree hashes ~N leaves + ~N inner nodes, so the mixed average is
#     lower bound: ((1456-240) + 1456)/2 = 1336
#     upper bound: ((1776-240) + 1776)/2 = 1656
#   The CALIBRATED 1300 (chained leaf+2-level passes, dispatch subtracted)
#   sits ~3% below the byte-shuffle-rotate bound — i.e. the measured kernel
#   is consistent with Mosaic emitting single-op byte-aligned rotates; under
#   the 3-op-rotate model it would imply the VPU sustains ~1.27x the 4-ALU
#   issue model, which we consider less likely.
#
# FFT butterfly (ops/fft_pallas._butterfly_halves): per PAIR of elements one
# m31_mul + m31_add + m31_sub (core/field.py):
#   m31_mul : 4 limb splits + 4 multiplies + 1 add + 2 (lo) + 2 (carry)
#             + 3 (hi) + 5 (fold 2^32) + 3 (fold 2^31) + 3 (canonicalize)
#           = 27 ops at 1-op multiplies
#   m31_add : add + cmp + select + sub = 4;   m31_sub: 5
#   => per element-stage (pair/2): (27+4+5)/2 = 18 at mul=1 op,
#      20 at mul=2, 24 at mul=4.
#   The CALIBRATED 28 says the real pass runs at ~64% of the mul=1 analytic
#   floor — the gap is the VPU's true multiply latency plus the pass's
#   non-butterfly work (twiddle limb splits, tile realignment copies), which
#   the floor deliberately excludes.
# ---------------------------------------------------------------------------
BLAKE_OPS_PER_COMPRESS = 1300  # calibrated; analytic bounds [1336, 1656]
BLAKE_OPS_ANALYTIC_FLOOR = 1336
FFT_OPS_PER_ELEMENT_STAGE = 28  # calibrated; analytic floor 18
FFT_OPS_ANALYTIC_FLOOR = 18


def vpu_ops() -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return _VPU_OPS["cpu"]
    for key, v in _VPU_OPS.items():
        if key in kind:
            return v
    return _VPU_OPS["v5e"]


def _fused_fft_passes(log_domain: int, log_l: int) -> int:
    """HBM pass count of the fused Pallas path, derived from its actual pass
    plan (ops/fft_pallas._pass_plan): 2 transposes around the low pass (when
    one exists) + 1 low pass + one pass per mid group."""
    from ..ops import fft_pallas

    p_min, c0, groups = fft_pallas._pass_plan(log_domain, log_l)
    has_low = c0 > p_min
    return (3 if has_low else 0) + len(groups)


def fft_roofline(log_domain: int, seconds: float, columns: int = 4,
                 fused: bool = True, log_l: int | None = None) -> dict:
    """Roofline for the low-degree extension of `columns` polys to 2^log_domain.

    Fused bounded-VMEM path (ops/fft_pallas.py): 2 transposes + 1 low pass +
    one pass per mid stage-group — derived from the real pass plan so the
    byte accounting tracks the kernel (log_l = log coefficient count;
    defaults to log_domain - 4, the reference blowup).
    XLA stage-loop path: one read+write pass per butterfly stage.
    """
    n_bytes_pass = columns * (1 << log_domain) * 4 * 2  # read + write
    if fused:
        ll = log_l if log_l is not None else max(log_domain - 4, 1)
        passes = max(_fused_fft_passes(log_domain, ll), 1)
    else:
        passes = max(log_domain, 1)
    bytes_moved = n_bytes_pass * passes
    achieved = bytes_moved / seconds / 1e9
    ceiling = hbm_gbps()
    butterflies = columns * log_domain * (1 << log_domain) // 2
    return {
        "kernel": "circle_fft",
        "bytes_moved": bytes_moved,
        "achieved_gbps": achieved,
        "hbm_gbps": ceiling,
        "sol_fraction": achieved / ceiling,
        "butterflies_per_s": butterflies / seconds,
    }


def merkle_roofline(log_leaves: int, seconds: float, fused: bool = True) -> dict:
    """Roofline for a full tree over 2^log_leaves leaves (4 u32 columns).

    fused=True (the deployed root/prover path, 3 levels per HBM pass —
    ops/merkle_pallas.leaf3/inner3): leaf pass reads 16 B/leaf and writes
    one 32 B node per 8 leaves (20 N); each inner3 pass reads 32 B/node over
    N/8^k nodes and writes N/8^(k+1) => ~32N*(1/8+1/64+..)*(1+1/8) ~= 5 N.
    Total ~= 25 N bytes.
    fused=False (2-at-a-time, every level in HBM): 48 N + 96 (N-1).
    Hash count is 2N - 1 raw-blake2s compressions either way."""
    n = 1 << log_leaves
    bytes_moved = 25 * n if fused else 48 * n + 96 * (n - 1)
    hashes = 2 * n - 1
    achieved = bytes_moved / seconds / 1e9
    ceiling = hbm_gbps()
    return {
        "kernel": "merkle_blake2s",
        "bytes_moved": bytes_moved,
        "hashes": hashes,
        "hashes_per_s": hashes / seconds,
        "achieved_gbps": achieved,
        "hbm_gbps": ceiling,
        "sol_fraction": achieved / ceiling,
    }


def commit_roofline(log_domain: int, seconds: float, log_l: int | None = None,
                    columns: int = 4) -> dict:
    """End-to-end commit = LDE + Merkle over the same table, as the MIXED
    compute+bandwidth roofline (module docstring): speed-of-light seconds =
    max(HBM time, VPU time); sol_fraction = that floor / measured."""
    fft = fft_roofline(log_domain, seconds, log_l=log_l)
    mk = merkle_roofline(log_domain, seconds)
    bytes_moved = fft["bytes_moved"] + mk["bytes_moved"]
    ll = log_l if log_l is not None else max(log_domain - 4, 1)
    n = 1 << log_domain
    # executed butterfly stages = log_l (bits [log_domain - log_l, log_domain))
    fft_ops = columns * n * ll * FFT_OPS_PER_ELEMENT_STAGE
    blake_ops = mk["hashes"] * BLAKE_OPS_PER_COMPRESS
    fft_ops_floor = columns * n * ll * FFT_OPS_ANALYTIC_FLOOR
    blake_ops_floor = mk["hashes"] * BLAKE_OPS_ANALYTIC_FLOOR
    t_hbm = bytes_moved / (hbm_gbps() * 1e9)
    t_vpu = (fft_ops + blake_ops) / vpu_ops()
    t_vpu_floor = (fft_ops_floor + blake_ops_floor) / vpu_ops()
    t_sol = max(t_hbm, t_vpu)
    return {
        "kernel": "commit_e2e",
        "bytes_moved": bytes_moved,
        "achieved_gbps": bytes_moved / seconds / 1e9,
        "hbm_gbps": hbm_gbps(),
        "hbm_seconds_at_sol": t_hbm,
        "vpu_seconds_at_sol": t_vpu,
        "bound": "vpu" if t_vpu >= t_hbm else "hbm",
        "min_seconds_at_sol": t_sol,
        "sol_fraction": t_sol / seconds,
        # model-vs-measured (VERDICT r4 item 4): the calibrated fraction
        # above grades against constants fit to our own kernels; this one
        # grades against the re-derivable analytic op-count floor
        # (BLAKE_OPS_ANALYTIC_FLOOR / FFT_OPS_ANALYTIC_FLOOR derivations).
        "min_seconds_analytic": max(t_hbm, t_vpu_floor),
        "sol_fraction_analytic": max(t_hbm, t_vpu_floor) / seconds,
    }
