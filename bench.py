"""Benchmark harness: commit throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): commit throughput in M31 felts/sec/chip at a
2^22-felt blob (per-coordinate polys 2^20, eval domain 2^24 at blowup 2^4 —
the "2^20-2^24 blob" regime). The Rust reference publishes no numbers
(BASELINE.md); vs_baseline is measured against a documented estimate of
stwo's single-threaded scalar CpuBackend commit throughput, ~2.5e6 felts/s
(O(N log N) scalar circle FFT + ~100ns/blake2s-compress Merkle; the
BASELINE.json target is >= 10x that at 2^24-element scale).

Extra context (per-phase breakdown, roofline fractions, proof gen/verify
timings) goes to stderr.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

RUST_SINGLE_CORE_FELTS_PER_SEC = 2.5e6  # documented estimate, see module docstring


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def synthetic_data(n_bytes: int, seed: int = 0) -> bytes:
    return ((np.arange(n_bytes, dtype=np.uint32) + seed) % 256).astype(np.uint8).tobytes()


def bench_commit(log_felts: int, log_blowup: int = 4, iters: int = 5):
    """End-to-end commit (bytes -> root) wall time; returns felts/sec.

    Also logs a phase breakdown (host ingest / device pipeline / tree top)
    and the HBM roofline fraction of the device portion.
    """
    import jax.numpy as jnp

    from frieda_tpu import api
    from frieda_tpu.core import fft
    from frieda_tpu.utils.packing import log_total_for, pad_to_blocks
    from frieda_tpu.utils.profiling import commit_roofline

    n_bytes = (1 << log_felts) * 30 // 8
    data = synthetic_data(n_bytes)
    n_felts = 1 << log_felts

    api.commit(data, log_blowup)  # warm up / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        api.commit(data, log_blowup)
    dt = (time.perf_counter() - t0) / iters

    # phase breakdown (separate pass; informational only). NB on the
    # remote-attached chip block_until_ready does not actually block, so the
    # device phase is timed dispatch -> 32-byte root fetch (a true sync).
    t0 = time.perf_counter()
    raw = pad_to_blocks(data)
    t_host = time.perf_counter() - t0
    log_total = log_total_for(len(data))
    log_size = log_total - 2
    n = log_size + log_blowup
    tw = fft.stage_twiddles(n)
    perm = fft.bitrev_perm_device(log_size)
    raw_d = jnp.asarray(raw)
    jax.device_get(api._commit_root_pipeline(raw_d, perm, tw, log_total))  # warm
    t0 = time.perf_counter()
    jax.device_get(api._commit_root_pipeline(raw_d, perm, tw, log_total))
    t_dev = time.perf_counter() - t0
    rf = commit_roofline(n, t_dev)
    log(
        f"  breakdown 2^{log_felts}: host ingest (memcpy) {t_host*1e3:.1f} ms, "
        f"device dispatch->root fetch {t_dev*1e3:.1f} ms ({rf['achieved_gbps']:.0f} "
        f"GB/s, {rf['sol_fraction']*100:.0f}% of HBM SoL incl. round trip); "
        f"residual = raw byte upload"
    )
    return n_felts / dt, dt


def bench_commit_pipelined(log_felts: int, log_blowup: int = 4, k: int = 8):
    """Sustained commit throughput with k blobs in flight: dispatches are
    async, so coefficient uploads overlap device compute — this is the
    felts/sec/chip a production ingest pipeline sees (the sequential bench
    above pays upload + compute + fetch serially per blob)."""
    import jax.numpy as jnp

    from frieda_tpu import api
    from frieda_tpu.core import fft
    from frieda_tpu.utils.packing import log_total_for, pad_to_blocks

    n_bytes = (1 << log_felts) * 30 // 8
    raws = [pad_to_blocks(synthetic_data(n_bytes, seed=i)) for i in range(k)]
    log_total = log_total_for(n_bytes)
    log_size = log_total - 2
    tw = fft.stage_twiddles(log_size + log_blowup)
    perm = fft.bitrev_perm_device(log_size)
    jax.device_get(api._commit_root_pipeline(jnp.asarray(raws[0]), perm, tw, log_total))
    t0 = time.perf_counter()
    futs = [
        api._commit_root_pipeline(jnp.asarray(r), perm, tw, log_total) for r in raws
    ]
    roots = jax.device_get(futs)
    dt = (time.perf_counter() - t0) / k
    assert len({bytes(np.asarray(r)) for r in roots}) == k  # distinct blobs
    return (1 << log_felts) / dt, dt


def main():
    log(f"devices: {jax.devices()}")
    results = {}
    for log_felts in (16, 20, 22):
        try:
            tput, dt = bench_commit(log_felts)
            results[log_felts] = (tput, dt)
            log(f"commit 2^{log_felts} felts (domain 2^{log_felts+4-2} per col): "
                f"{dt*1e3:.1f} ms, {tput/1e6:.1f} M felts/s")
        except Exception as e:  # noqa: BLE001
            log(f"commit 2^{log_felts} failed: {e}")
    pipelined = {}
    for log_felts in (20, 22):
        try:
            tput, dt = bench_commit_pipelined(log_felts)
            pipelined[log_felts] = (tput, dt)
            log(f"pipelined commit 2^{log_felts} felts: {dt*1e3:.1f} ms/blob, "
                f"{tput/1e6:.1f} M felts/s sustained")
        except Exception as e:  # noqa: BLE001
            log(f"pipelined commit 2^{log_felts} failed: {e}")

    # Proof generation + verification timing at the reference bench config.
    try:
        from frieda_tpu import api
        from frieda_tpu.config import DEFAULT_CONFIG

        data = synthetic_data(262146)
        api.commit_and_prove(data, len(data), DEFAULT_CONFIG)  # warm up / compile
        t0 = time.perf_counter()
        _, proof = api.commit_and_prove(data, len(data), DEFAULT_CONFIG)
        t_prove = time.perf_counter() - t0
        t0 = time.perf_counter()
        ok = api.verify(proof, len(data))
        t_verify = time.perf_counter() - t0
        log(f"blob prove: {t_prove*1e3:.0f} ms, verify: {t_verify*1e3:.0f} ms, ok={ok}")
        k = 8
        datas = [synthetic_data(262146, seed=i) for i in range(k)]
        t0 = time.perf_counter()
        batch = api.prove_many(datas, list(range(k)))
        t_batch = (time.perf_counter() - t0) / k
        assert all(api.verify(p, s) for s, (_, p) in enumerate(batch))
        log(f"pipelined blob prove ({k} in flight): {t_batch*1e3:.0f} ms/proof, "
            f"{1/t_batch:.1f} proofs/s")
    except Exception as e:  # noqa: BLE001
        log(f"prove/verify bench failed: {e}")

    source = pipelined if pipelined else results
    tag = "sustained" if pipelined else "latency"
    headline = max(source) if source else None
    if headline is None:
        print(json.dumps({"metric": "commit_throughput", "value": 0.0,
                          "unit": "M31 felts/sec/chip", "vs_baseline": 0.0}))
        return
    tput, _ = source[headline]
    print(json.dumps({
        "metric": f"commit_throughput_{tag}_2^{headline}_felts_blowup16",
        "value": round(tput, 1),
        "unit": "M31 felts/sec/chip",
        "vs_baseline": round(tput / RUST_SINGLE_CORE_FELTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
