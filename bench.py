"""Benchmark harness: commit/prove throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric (BASELINE.json north star, VERDICT r3 item 1): sustained
commit throughput in M31 felts/sec/chip at a 2^24-felt blob (per-coordinate
polys 2^22, eval domain 2^26 at blowup 2^4) — the size the >=10x target is
stated at — measured with the input DEVICE-RESIDENT (`bench_device_sustained`).

Why device-resident is the honest headline here, not a dodge:
  * The baseline it is compared against is the reference's criterion bench
    of stwo's CpuBackend (/root/reference/benches/commit.rs), which times
    compute on RAM-resident input — no transport either. Like for like.
  * This box reaches its TPU through a REMOTE DEBUG TUNNEL whose effective
    bandwidth fluctuates ~40x (measured 25..1600 MB/s across a day); a
    production v5e host feeds its chips over PCIe at tens of GB/s. The
    tunnel-inclusive end-to-end number measures the tunnel, not the
    framework, so it is REPORTED (e2e fields in the JSON + stderr) but not
    the headline.
vs_baseline divides by a documented estimate of stwo's single-threaded
scalar commit throughput, ~2.5e6 felts/s (derivation in BASELINE.md:
O(N log N) scalar circle FFT at ~2ns/butterfly + ~100ns/blake2s-compress
x 2N Merkle hashes).

Methodology notes:
  * Every timing is a MEDIAN over several iterations; the tunnel-riding
    e2e sweeps additionally take the best of several batches against
    tunnel weather. The per-phase breakdown separates host ingest /
    upload / device compute so the tunnel is visible in the stderr log.
  * Regression gates (VERDICT r1 item 3 / r3 item 8): if BENCH_MATRIX.json
    exists, fail if device-compute sustained falls below
    DEVICE_FLOOR_FRACTION of its recorded value (tight: no tunnel excuse
    for device regressions), or if the e2e sweep falls below
    FLOOR_FRACTION of its recorded value (loose: tunnel slack).
  * Every run appends its numbers to BENCH_HISTORY.jsonl so cross-round
    drift is visible (r3 item 8).

Extra context (per-phase breakdown, roofline fractions, proof gen/verify
timings) goes to stderr.
"""

import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

# A sitecustomize hook pins JAX_PLATFORMS=axon on this box; honor an explicit
# CPU request (CI smoke runs) by forcing it through jax.config as well.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

RUST_SINGLE_CORE_FELTS_PER_SEC = 2.5e6  # documented estimate, see BASELINE.md
FLOOR_FRACTION = 0.25  # e2e gate vs BENCH_MATRIX.json (tunnel-weather slack)
DEVICE_FLOOR_FRACTION = 0.7  # device-compute gate (tunnel-insensitive)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def synthetic_data(n_bytes: int, seed: int = 0) -> bytes:
    return ((np.arange(n_bytes, dtype=np.uint32) + seed) % 256).astype(np.uint8).tobytes()


def median_time(fn, iters: int):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), out


def bench_commit(log_felts: int, log_blowup: int = 4, iters: int = 5):
    """End-to-end commit (bytes -> root) median wall time; returns felts/sec.

    Also logs a phase breakdown (host ingest / upload+device pipeline) and
    the HBM roofline fraction of the device-resident portion."""
    import jax.numpy as jnp

    from frieda_tpu import api
    from frieda_tpu.core import fft
    from frieda_tpu.utils.packing import log_total_for, pad_to_words
    from frieda_tpu.utils.profiling import commit_roofline

    n_bytes = (1 << log_felts) * 30 // 8
    data = synthetic_data(n_bytes)
    n_felts = 1 << log_felts

    api.commit(data, log_blowup)  # warm up / compile
    dt, _ = median_time(lambda: api.commit(data, log_blowup), iters)

    # phase breakdown (separate pass; informational only): host memcpy,
    # then dispatch -> 2KB top fetch with the input already device-resident
    # (device compute + one round trip), minus a measured trivial-dispatch
    # round trip so the tunnel latency doesn't masquerade as kernel time.
    log_total = log_total_for(len(data))
    n = log_total - 2 + log_blowup
    t0 = time.perf_counter()
    words = pad_to_words(data, log_total)
    t_host = time.perf_counter() - t0
    tw = fft.stage_twiddles(n)
    words_d = jax.device_put(words)
    words_d.block_until_ready()
    trivial = jax.jit(lambda w: w[:8])
    jax.device_get(trivial(words_d))
    t_rtt, _ = median_time(lambda: jax.device_get(trivial(words_d)), 5)
    jax.device_get(api._commit_root_pipeline(words_d, tw, log_total))  # warm
    t_dev, _ = median_time(
        lambda: jax.device_get(api._commit_root_pipeline(words_d, tw, log_total)), 3
    )
    t_kern = max(t_dev - t_rtt, 1e-9)
    rf = commit_roofline(n, t_kern)
    log(
        f"  breakdown 2^{log_felts}: host ingest (memcpy) {t_host*1e3:.1f} ms, "
        f"dispatch->root fetch {t_dev*1e3:.1f} ms of which tunnel round trip "
        f"{t_rtt*1e3:.1f} ms => device compute {t_kern*1e3:.1f} ms "
        f"({rf['achieved_gbps']:.0f} GB/s moved, {rf['sol_fraction']*100:.0f}% "
        f"of {rf['bound']}-bound SoL floor {rf['min_seconds_at_sol']*1e3:.1f} ms "
        f"calibrated / {rf['sol_fraction_analytic']*100:.0f}% of analytic-floor "
        f"{rf['min_seconds_analytic']*1e3:.1f} ms); "
        f"residual vs e2e = raw word upload (tunnel)"
    )
    return n_felts / dt, dt


def bench_commit_pipelined(log_felts: int, log_blowup: int = 4, k: int = 6,
                           batches: int = 3):
    """Sustained commit throughput with k blobs in flight: dispatches are
    async, so uploads overlap device compute — this is the felts/sec/chip a
    production ingest pipeline sees (the sequential bench above pays upload +
    compute + fetch serially per blob). Best of `batches` batches: the
    tunnel's minute-scale weather makes single batches unrepresentative."""
    import jax.numpy as jnp

    from frieda_tpu import api
    from frieda_tpu.core import fft
    from frieda_tpu.utils.packing import log_total_for, pad_to_words

    n_bytes = (1 << log_felts) * 30 // 8
    log_total = log_total_for(n_bytes)
    wordss = [pad_to_words(synthetic_data(n_bytes, seed=i), log_total) for i in range(k)]
    tw = fft.stage_twiddles(log_total - 2 + log_blowup)
    jax.device_get(api._commit_root_pipeline(jnp.asarray(wordss[0]), tw, log_total))
    best = None
    for _ in range(batches):
        t0 = time.perf_counter()
        futs = [api._commit_root_pipeline(jnp.asarray(w), tw, log_total) for w in wordss]
        roots = jax.device_get(futs)
        dt = (time.perf_counter() - t0) / k
        assert len({bytes(np.asarray(r)) for r in roots}) == k  # distinct blobs
        best = dt if best is None else min(best, dt)
    return (1 << log_felts) / best, best


def bench_device_sustained(log_felts: int, log_blowup: int = 4, k: int | None = None):
    """Tunnel-insensitive sustained commit throughput: same pipelined root
    dispatch, but the input words are already device-resident, so the number
    reflects only what the chip does (ingest unpack + LDE + Merkle). This is
    the primary regression-gate metric — the e2e numbers above ride on
    tunnel weather.

    k (blobs per timed batch) defaults high enough that the ONE tunnel round
    trip per batch is amortized below ~5% of the number: at small sizes
    RTT/k otherwise dominates (RTT ~28 ms / 8 = 3.5 ms vs ~1 ms of 2^16
    compute — the k=5 form overstated small-blob cost ~4x)."""
    if k is None:
        k = 64 if log_felts <= 20 else 8
    import jax.numpy as jnp

    from frieda_tpu import api
    from frieda_tpu.core import fft
    from frieda_tpu.utils.packing import log_total_for, pad_to_words

    n_bytes = (1 << log_felts) * 30 // 8
    log_total = log_total_for(n_bytes)
    words_d = jax.device_put(pad_to_words(synthetic_data(n_bytes), log_total))
    words_d.block_until_ready()
    tw = fft.stage_twiddles(log_total - 2 + log_blowup)
    jax.device_get(api._commit_root_pipeline(words_d, tw, log_total))  # warm
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        futs = [api._commit_root_pipeline(words_d, tw, log_total) for _ in range(k)]
        jax.device_get(futs)
        dts.append((time.perf_counter() - t0) / k)
    dt = statistics.median(dts)
    return (1 << log_felts) / dt, dt


def bench_commit_many(log_felts: int, k: int = 64):
    """Many-small-blob DAS serving shape: k equal-sized blobs committed in
    ONE vmapped dispatch (api.commit_many's device path), device-resident.
    Small blobs are dispatch-bound when issued one-by-one (~0.5 ms tunnel
    dispatch overhead vs ~0.8 ms of 2^16 device compute); batching removes
    that entirely. The residual vs the SoL floor (~0.28 ms at 2^16, ~35%)
    is per-grid-step overhead of the ~8 kernels at tiny widths — further
    fusion would trade the shared kernel bodies for shape-specialized ones."""
    import jax.numpy as jnp

    from frieda_tpu import api
    from frieda_tpu.core import fft
    from frieda_tpu.utils.packing import log_total_for, pad_to_words

    n_bytes = (1 << log_felts) * 30 // 8
    log_total = log_total_for(n_bytes)
    tw = fft.stage_twiddles(log_total - 2 + 4)
    words = np.stack([
        pad_to_words(synthetic_data(n_bytes, seed=i), log_total) for i in range(k)
    ])
    words_d = jax.device_put(words)
    words_d.block_until_ready()
    jax.device_get(api._commit_root_pipeline_batch(words_d, tw, log_total))
    dts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(api._commit_root_pipeline_batch(words_d, tw, log_total))
        dts.append((time.perf_counter() - t0) / k)
    dt = statistics.median(dts)
    return (1 << log_felts) / dt, dt


def bench_prove_device(log_felts: int, n_queries: int = 20, window: int = 4):
    """Device-sustained proof generation (VERDICT r4 item 3): raw words
    pre-staged on device, up to `window` commit phases in flight ahead of the
    finish cursor (clamped to the HBM-safe window), so compute overlaps the
    small packed decommit fetches. Excludes the raw-word upload exactly like
    the commit headline (and for the same reason: the remote tunnel otherwise
    dominates — a production host feeds chips over PCIe); includes the
    transcript, grind, decommit gathers, packed fetch, and host assembly.
    Returns (ms_per_proof, proofs verified ok)."""
    from frieda_tpu import api
    from frieda_tpu.config import FriConfig, PcsConfig
    from frieda_tpu.core import fri
    from frieda_tpu.utils.packing import log_total_for, pad_to_words

    cfg = PcsConfig(pow_bits=20, fri_config=FriConfig(4, 0, n_queries))
    n_bytes = (1 << log_felts) * 30 // 8
    log_total = log_total_for(n_bytes)
    words_d = jax.device_put(pad_to_words(synthetic_data(n_bytes), log_total))
    words_d.block_until_ready()
    _, proof = fri.finish_proof(
        fri.dispatch_commit_phase_staged(words_d, log_total, 7, cfg)
    )  # warm / compile
    window = max(1, min(window, fri.safe_in_flight(log_total - 2, cfg.fri_config)))
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        ctxs = [fri.dispatch_commit_phase_staged(words_d, log_total, 7, cfg)
                for _ in range(window)]
        proofs = [fri.finish_proof(c) for c in ctxs]
        dts.append((time.perf_counter() - t0) / window)
    ok = api.verify(proofs[-1][1], 7)
    return statistics.median(dts) * 1e3, ok


def main():
    # FRIEDA_TRACE_DIR=/path: capture a jax.profiler trace of the bench run
    # (phase spans from utils/profiling.span appear as trace annotations).
    trace_dir = os.environ.get("FRIEDA_TRACE_DIR")
    if trace_dir:
        import contextlib

        ctx = jax.profiler.trace(trace_dir)
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        _main_inner()


def _main_inner():
    log(f"devices: {jax.devices()}")
    # FRIEDA_BENCH_SMOKE=1: tiny sizes for CI schema checks on CPU runners.
    smoke = os.environ.get("FRIEDA_BENCH_SMOKE", "") not in ("", "0")
    commit_sizes = (10, 12) if smoke else (16, 20, 22)
    pipe_sizes = (12,) if smoke else (20, 22, 24)
    results = {}
    for log_felts in commit_sizes:
        try:
            tput, dt = bench_commit(log_felts)
            results[log_felts] = (tput, dt)
            log(f"commit 2^{log_felts} felts (domain 2^{log_felts+4-2} per col): "
                f"{dt*1e3:.1f} ms, {tput/1e6:.1f} M felts/s")
        except Exception as e:  # noqa: BLE001
            log(f"commit 2^{log_felts} failed: {e}")
    pipelined = {}
    for log_felts in pipe_sizes:
        try:
            tput, dt = bench_commit_pipelined(log_felts)
            pipelined[log_felts] = (tput, dt)
            log(f"pipelined commit 2^{log_felts} felts: {dt*1e3:.1f} ms/blob, "
                f"{tput/1e6:.1f} M felts/s sustained")
        except Exception as e:  # noqa: BLE001
            log(f"pipelined commit 2^{log_felts} failed: {e}")
    device_sustained = {}
    for log_felts in ((12,) if smoke else (22, 24)):
        try:
            tput, dt = bench_device_sustained(log_felts)
            device_sustained[log_felts] = (tput, dt)
            log(f"device-compute sustained 2^{log_felts} felts: "
                f"{dt*1e3:.1f} ms/blob, {tput/1e6:.1f} M felts/s "
                f"({tput/RUST_SINGLE_CORE_FELTS_PER_SEC:.1f}x baseline, "
                f"tunnel-insensitive)")
        except Exception as e:  # noqa: BLE001
            log(f"device sustained 2^{log_felts} failed: {e}")

    if not smoke:
        try:
            tput, dt = bench_commit_many(16, k=64)
            log(f"batched small-blob commit (64 x 2^16 felts, ONE dispatch): "
                f"{dt*1e3:.2f} ms/blob, {tput/1e6:.1f} M felts/s "
                f"({tput/RUST_SINGLE_CORE_FELTS_PER_SEC:.1f}x baseline)")
        except Exception as e:  # noqa: BLE001
            log(f"batched small-blob commit failed: {e}")

    # Proof generation + verification timing at the reference bench config.
    try:
        from frieda_tpu import api
        from frieda_tpu.config import DEFAULT_CONFIG

        data = synthetic_data(4096 if smoke else 262146)
        api.commit_and_prove(data, len(data), DEFAULT_CONFIG)  # warm up / compile
        t_prove, (_, proof) = median_time(
            lambda: api.commit_and_prove(data, len(data), DEFAULT_CONFIG), 5
        )
        t_verify, ok = median_time(lambda: api.verify(proof, len(data)), 3)
        log(f"blob prove: {t_prove*1e3:.0f} ms, verify: {t_verify*1e3:.0f} ms, ok={ok}")
        k = 8
        datas = [synthetic_data(262146, seed=i) for i in range(k)]
        t0 = time.perf_counter()
        batch = api.prove_many(datas, list(range(k)))
        t_batch = (time.perf_counter() - t0) / k
        assert all(api.verify(p, s) for s, (_, p) in enumerate(batch))
        log(f"pipelined blob prove ({k} in flight): {t_batch*1e3:.0f} ms/proof, "
            f"{1/t_batch:.1f} proofs/s")
        # batch verification (the DAS light-client's many-samples shape)
        vb = [p for _, p in batch] * 8  # 64 same-shape proofs
        vs = [s % k for s in range(len(vb))]
        assert all(api.verify_many(vb, vs))
        t0 = time.perf_counter()
        api.verify_many(vb, vs)
        t_vm = (time.perf_counter() - t0) / len(vb)
        log(f"verify_many ({len(vb)} blob proofs): {t_vm*1e3:.2f} ms/proof "
            f"({t_verify/t_vm:.1f}x looped verify)")
    except Exception as e:  # noqa: BLE001
        log(f"prove/verify bench failed: {e}")

    # Proof generation at the BASELINE.md sizes (VERDICT r4 item 3):
    # device-sustained (tunnel-insensitive, like the commit headline) plus a
    # tunnel-inclusive e2e single-proof latency for the record.
    prove_rows = {}
    for log_felts, nq in (() if smoke else ((20, 64), (24, 20))):
        try:
            dev_ms, ok = bench_prove_device(log_felts, nq)
            assert ok
            from frieda_tpu.config import FriConfig, PcsConfig

            cfg = PcsConfig(pow_bits=20, fri_config=FriConfig(4, 0, nq))
            data = synthetic_data((1 << log_felts) * 30 // 8)
            t_e2e, (_, proof) = median_time(
                lambda: api.commit_and_prove(data, 7, cfg), 2
            )
            prove_rows[f"2^{log_felts}_{nq}q"] = {
                "device_sustained_ms": round(dev_ms, 1),
                "e2e_ms": round(t_e2e * 1e3, 1),
            }
            log(f"prove 2^{log_felts} felts ({nq}q): {dev_ms:.0f} ms/proof "
                f"device-sustained, {t_e2e*1e3:.0f} ms e2e (tunnel-inclusive)")
        except Exception as e:  # noqa: BLE001
            log(f"prove bench 2^{log_felts} failed: {e}")

    # Headline: device-resident sustained commit at the largest size
    # (apples-to-apples with the reference's RAM-resident CPU bench — see
    # module docstring). Falls back to the e2e sweeps if the device metric
    # failed for some reason.
    if device_sustained:
        headline = max(device_sustained)
        tput, _ = device_sustained[headline]
        tag = "device_sustained"
    elif pipelined or results:
        source = pipelined if pipelined else results
        headline = max(source)
        tput, _ = source[headline]
        tag = "e2e_pipelined" if pipelined else "e2e_latency"
    else:
        print(json.dumps({"metric": "commit_throughput", "value": 0.0,
                          "unit": "M31 felts/sec/chip", "vs_baseline": 0.0}))
        sys.exit(1)
    out = {
        "metric": f"commit_throughput_{tag}_2^{headline}_felts_blowup16",
        "value": round(tput, 1),
        "unit": "M31 felts/sec/chip",
        "vs_baseline": round(tput / RUST_SINGLE_CORE_FELTS_PER_SEC, 2),
    }
    if pipelined:  # tunnel-inclusive e2e, for the record (see docstring)
        e2e = max(pipelined)
        out["e2e_with_tunnel_upload_felts_per_s"] = round(pipelined[e2e][0], 1)
        out["e2e_log_felts"] = e2e
    if prove_rows:
        out["prove"] = prove_rows
    print(json.dumps(out))

    if smoke:
        return  # schema checked; gates/history are real-TPU-only

    # Per-round history (VERDICT r3 item 8): append so drift is visible.
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as f:
            f.write(json.dumps({
                "ts": round(time.time(), 1),
                # pre-round-4 lines carried the e2e headline in this field;
                # the tag disambiguates the two semantics (ADVICE r4).
                "headline_kind": tag,
                "headline_log_felts": headline,
                "e2e_felts_per_s": {str(kk): round(v[0], 1)
                                    for kk, v in (pipelined or results).items()},
                "device_felts_per_s": {str(kk): round(v[0], 1)
                                       for kk, v in device_sustained.items()},
                "prove": prove_rows,
            }) + "\n")
    except OSError as e:
        log(f"history append failed: {e}")

    # Regression gates vs the committed matrix (VERDICT r1 item 3 / r3 item 8).
    matrix_path = os.path.join(here, "BENCH_MATRIX.json")
    if os.path.exists(matrix_path):
        try:
            with open(matrix_path) as f:
                matrix = json.load(f)
        except Exception:  # noqa: BLE001
            matrix = {}
        recorded = matrix.get("headline_felts_per_s")
        e2e_best = max((v[0] for v in (pipelined or results).values()), default=None)
        if recorded and e2e_best is not None and e2e_best < FLOOR_FRACTION * recorded:
            log(f"REGRESSION: e2e sweep {e2e_best:.3g} < {FLOOR_FRACTION} x "
                f"recorded {recorded:.3g} felts/s (BENCH_MATRIX.json)")
            sys.exit(2)
        rec_dev = matrix.get("device_sustained_felts_per_s", {})
        for kk, (tp, _) in device_sustained.items():
            rec = rec_dev.get(str(kk))
            if rec and tp < DEVICE_FLOOR_FRACTION * rec:
                log(f"REGRESSION (device): 2^{kk} sustained {tp:.3g} < "
                    f"{DEVICE_FLOOR_FRACTION} x recorded {rec:.3g} felts/s")
                sys.exit(2)


if __name__ == "__main__":
    main()
