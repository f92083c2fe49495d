"""Full benchmark matrix on the attached TPU chip.

Covers BOTH benchmark definitions (values for the reference are unpublished —
BASELINE.md — so ours are the recorded numbers):

1. The reference's criterion matrix (/root/reference/benches/commit.rs:4-17,
   benches/proof.rs:5-61): inputs 1 KiB / 4 KiB / 16 KiB / 64 KiB / blob
   (262,146 B), at the reference default config (blowup 2^4, last-layer
   bound 0, 20 queries, 20 PoW bits, seed = input length), measuring
   commit / generate_proof / commit_and_generate_proof / verify_proof wall
   time per op. Synthetic inputs are `(i % 256) as u8` like the reference's;
   the blob row uses the real fixture when present.

2. BASELINE.md's config sweep: 2^12-felt round-trip, 2^16-felt commit at
   blowups 2/4/8, 2^20-felt 64-query proof, and 2^24-felt commit + prove
   (domain 2^26 per coordinate — the memory-lean decommit path's reason to
   exist).

Writes BENCH_MATRIX.json at the repo root (committed artifact; bench.py uses
its headline rows as the regression floor) and prints a human table to stderr.

Usage: python tools/bench_matrix.py [--quick]
  --quick: fewer iters + skip the 2^24 row (CI smoke).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLOB_PATH = "/root/reference/blob"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def synthetic_data(n_bytes: int, seed: int = 0) -> bytes:
    return ((np.arange(n_bytes, dtype=np.uint32) + seed) % 256).astype(np.uint8).tobytes()


def timed(fn, iters: int, warmups: int = 1):
    """Median-of-iters wall time (the TPU tunnel's bandwidth fluctuates; a
    single slow transfer would skew a mean)."""
    import statistics

    for _ in range(warmups):
        out = fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), out


def reference_matrix(quick: bool):
    """Reference criterion matrix: 5 inputs x 4 ops, default config."""
    from frieda_tpu import api
    from frieda_tpu.config import DEFAULT_CONFIG

    blob = None
    if os.path.exists(BLOB_PATH):
        with open(BLOB_PATH, "rb") as f:
            blob = f.read()
    inputs = [
        ("1KiB", synthetic_data(1024)),
        ("4KiB", synthetic_data(4096)),
        ("16KiB", synthetic_data(16384)),
        ("64KiB", synthetic_data(65536)),
        ("blob", blob if blob is not None else synthetic_data(262146)),
    ]
    iters = 2 if quick else 5
    rows = []
    for name, data in inputs:
        seed = len(data)  # reference: seed = input length (benches/proof.rs:18)
        t_commit, _ = timed(lambda: api.commit(data, 4), iters)
        t_prove, _ = timed(lambda: api.generate_proof(data, seed, DEFAULT_CONFIG), iters)
        t_cap, (_, proof) = timed(
            lambda: api.commit_and_prove(data, seed, DEFAULT_CONFIG), iters
        )
        t_verify, ok = timed(lambda: api.verify(proof, seed), iters)
        assert ok, f"verify failed for {name}"
        rows.append({
            "input": name,
            "bytes": len(data),
            "commit_ms": round(t_commit * 1e3, 2),
            "generate_proof_ms": round(t_prove * 1e3, 2),
            "commit_and_generate_proof_ms": round(t_cap * 1e3, 2),
            "verify_proof_ms": round(t_verify * 1e3, 2),
        })
        log(f"  {name:>6} ({len(data)} B): commit {rows[-1]['commit_ms']} ms, "
            f"prove {rows[-1]['generate_proof_ms']} ms, "
            f"commit+prove {rows[-1]['commit_and_generate_proof_ms']} ms, "
            f"verify {rows[-1]['verify_proof_ms']} ms")
    return rows


def baseline_sweep(quick: bool):
    """BASELINE.md config sweep (felt-count scale axis)."""
    from frieda_tpu import api
    from frieda_tpu.config import FriConfig, PcsConfig

    rows = []

    # 2^12 felts: full round-trip at the default config.
    data = synthetic_data((1 << 12) * 30 // 8)
    cfg = PcsConfig(pow_bits=20, fri_config=FriConfig(4, 0, 20))
    t_cap, (com, proof) = timed(lambda: api.commit_and_prove(data, 12, cfg), 3)
    t_ver, ok = timed(lambda: api.verify(proof, 12), 3)
    assert ok and com == proof.first_layer_commitment
    rows.append({"config": "2^12 felts round-trip (blowup 16, q20, pow20)",
                 "prove_ms": round(t_cap * 1e3, 2), "verify_ms": round(t_ver * 1e3, 2)})
    log(f"  2^12 round-trip: prove {rows[-1]['prove_ms']} ms, verify {rows[-1]['verify_ms']} ms")

    # 2^16 felts: commit at blowups 2/4/8.
    data16 = synthetic_data((1 << 16) * 30 // 8)
    for lb in (1, 2, 3):
        t, _ = timed(lambda: api.commit(data16, lb), 3)
        rows.append({"config": f"2^16 felts commit, blowup 2^{lb}",
                     "commit_ms": round(t * 1e3, 2),
                     "felts_per_s": round((1 << 16) / t)})
        log(f"  2^16 commit blowup 2^{lb}: {t*1e3:.2f} ms")

    # 2^20 felts: 64-query proof.
    data20 = synthetic_data((1 << 20) * 30 // 8)
    cfg64 = PcsConfig(pow_bits=20, fri_config=FriConfig(4, 0, 64))
    t, (_, proof) = timed(lambda: api.commit_and_prove(data20, 7, cfg64), 1 if quick else 2)
    tv, ok = timed(lambda: api.verify(proof, 7), 2)
    assert ok
    rows.append({"config": "2^20 felts, 64-query proof (blowup 16, pow20)",
                 "prove_ms": round(t * 1e3, 2), "verify_ms": round(tv * 1e3, 2)})
    log(f"  2^20 64-query: prove {t*1e3:.1f} ms, verify {tv*1e3:.1f} ms")

    # 2^24 felts: commit + prove (domain 2^26/col at blowup 16) — memory-lean path.
    if not quick:
        data24 = synthetic_data((1 << 24) * 30 // 8)
        t, _ = timed(lambda: api.commit(data24, 4), 2)
        rows.append({"config": "2^24 felts commit (domain 2^26/col, blowup 16)",
                     "commit_ms": round(t * 1e3, 2),
                     "felts_per_s": round((1 << 24) / t)})
        log(f"  2^24 commit: {t*1e3:.1f} ms ({(1 << 24)/t/1e6:.1f} M felts/s)")
        t, (_, proof) = timed(lambda: api.commit_and_prove(data24, 9, DEFAULT_LIKE), 1)
        tv, ok = timed(lambda: api.verify(proof, 9), 1)
        assert ok
        rows.append({"config": "2^24 felts prove (blowup 16, q20, pow20)",
                     "prove_ms": round(t * 1e3, 2), "verify_ms": round(tv * 1e3, 2)})
        log(f"  2^24 prove: {t*1e3:.0f} ms, verify {tv*1e3:.1f} ms")
    return rows


DEFAULT_LIKE = None  # set in main (import order)


def pipelined_headline():
    """Sustained 2^22-felt e2e commit throughput (tunnel-inclusive);
    recorded as the loose regression floor bench.py checks against."""
    import jax.numpy as jnp

    from frieda_tpu import api
    from frieda_tpu.core import fft
    from frieda_tpu.utils.packing import log_total_for, pad_to_words

    k = 8
    n_bytes = (1 << 22) * 30 // 8
    log_total = log_total_for(n_bytes)
    wordss = [pad_to_words(synthetic_data(n_bytes, seed=i), log_total) for i in range(k)]
    tw = fft.stage_twiddles(log_total - 2 + 4)
    jax.device_get(api._commit_root_pipeline(jnp.asarray(wordss[0]), tw, log_total))
    t0 = time.perf_counter()
    futs = [api._commit_root_pipeline(jnp.asarray(w), tw, log_total) for w in wordss]
    jax.device_get(futs)
    dt = (time.perf_counter() - t0) / k
    return (1 << 22) / dt


def device_sustained_rows(quick: bool):
    """Device-resident sustained commit at 2^22/2^24 — bench.py's headline
    metric and its TIGHT regression-gate values."""
    import bench as bench_mod

    out = {}
    for lf in (12,) if quick else (22, 24):
        tput, dt = bench_mod.bench_device_sustained(lf)
        out[str(lf)] = round(tput)
        log(f"  device sustained 2^{lf}: {dt*1e3:.1f} ms/blob, {tput/1e6:.1f} M felts/s")
    return out


def commit_2pow26(quick: bool):
    """BASELINE.md's largest config on ONE chip (VERDICT r3 item 3): a
    2^26-felt commit (per-coordinate polys 2^24, eval domain 2^28 ~ 4 GiB of
    evaluations). Device-resident sustained timing like the headline; on HBM
    exhaustion the OOM is recorded instead of crashing the matrix."""
    if quick:
        return {"skipped": "quick mode"}
    import jax.numpy as jnp

    from frieda_tpu import api
    from frieda_tpu.core import fft
    from frieda_tpu.utils.packing import log_total_for, pad_to_words

    n_bytes = (1 << 26) * 30 // 8
    log_total = log_total_for(n_bytes)
    try:
        words_d = jax.device_put(pad_to_words(synthetic_data(n_bytes), log_total))
        words_d.block_until_ready()
        tw = fft.stage_twiddles(log_total - 2 + 4)
        jax.device_get(api._commit_root_pipeline(words_d, tw, log_total))  # warm
        t0 = time.perf_counter()
        for _ in range(2):
            jax.device_get(api._commit_root_pipeline(words_d, tw, log_total))
        dt = (time.perf_counter() - t0) / 2
        tput = (1 << 26) / dt
        log(f"  2^26 commit (device-resident): {dt*1e3:.0f} ms, {tput/1e6:.1f} M felts/s")
        return {"commit_ms_device": round(dt * 1e3, 1),
                "felts_per_s_device": round(tput)}
    except Exception as e:  # noqa: BLE001 — record OOM/compile failure as data
        msg = str(e).split("\n")[0][:300]
        log(f"  2^26 commit failed: {msg}")
        return {"failed": msg}


def main():
    global DEFAULT_LIKE
    from frieda_tpu.config import DEFAULT_CONFIG

    DEFAULT_LIKE = DEFAULT_CONFIG
    quick = "--quick" in sys.argv
    log(f"devices: {jax.devices()}")
    t_start = time.time()
    log("reference criterion matrix (5 inputs x 4 ops, default config):")
    ref_rows = reference_matrix(quick)
    log("BASELINE.md config sweep:")
    sweep_rows = baseline_sweep(quick)
    headline = pipelined_headline()
    log(f"e2e floor: sustained 2^22-felt commit {headline/1e6:.1f} M felts/s (tunnel-inclusive)")
    log("device-resident sustained (bench.py headline + tight gate):")
    dev_rows = device_sustained_rows(quick)
    log("2^26 single-chip attempt (BASELINE.md largest config):")
    row26 = commit_2pow26(quick)
    out = {
        "hardware": str(jax.devices()[0]),
        "config": "blowup 2^4, last-layer bound 0, 20 queries, 20 PoW bits (reference default)",
        "headline_felts_per_s": round(headline),
        "device_sustained_felts_per_s": dev_rows,
        "commit_2pow26": row26,
        "reference_matrix": ref_rows,
        "baseline_sweep": sweep_rows,
        "total_wall_s": round(time.time() - t_start, 1),
    }
    path = os.path.join(REPO, "BENCH_MATRIX.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps({"metric": "bench_matrix_rows",
                      "value": len(ref_rows) + len(sweep_rows), "unit": "rows"}))


if __name__ == "__main__":
    main()
