"""One-off microbenchmarks on the real TPU: tunnel bandwidth + per-phase
device compute at the headline sizes. Informational only (not part of CI)."""

import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def med(fn, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    print(f"devices: {jax.devices()}", flush=True)

    # --- tunnel upload bandwidth vs transfer size ---
    for mb in (4, 16, 64, 128):
        x = np.random.randint(0, 2**31, size=(mb * 1024 * 1024 // 4,), dtype=np.uint32)
        def up():
            jax.device_put(x).block_until_ready()
        up()
        dt = med(up, 3)
        print(f"upload {mb:4d} MB: {dt*1e3:8.1f} ms  -> {mb/dt:7.1f} MB/s", flush=True)

    # --- concurrent uploads: do 4 in-flight device_puts beat serial? ---
    xs = [np.random.randint(0, 2**31, size=(16 * 1024 * 1024 // 4,), dtype=np.uint32)
          for _ in range(4)]
    def up4():
        bufs = [jax.device_put(x) for x in xs]
        for b in bufs:
            b.block_until_ready()
    up4()
    dt = med(up4, 3)
    print(f"upload 4x16 MB concurrent: {dt*1e3:.1f} ms -> {64/dt:.1f} MB/s", flush=True)

    # --- per-phase device compute (input device-resident) ---
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from frieda_tpu.core import fft, merkle
    from frieda_tpu.utils.packing import device_ingest_rev

    trivial = jax.jit(lambda w: w[:8])

    for log_felts in (22, 24):
        log_total = log_felts
        log_size = log_total - 2
        n = log_size + 4
        words = np.random.randint(0, 2**30, size=(1 << log_felts,), dtype=np.uint32)
        words_d = jax.device_put(jnp.asarray(words))
        words_d.block_until_ready()
        t_rtt = med(lambda: jax.device_get(trivial(words_d)), 5)

        tw = fft.stage_twiddles(n)

        ingest = jax.jit(lambda w: device_ingest_rev(w, log_size))
        coeffs = ingest(words_d); coeffs.block_until_ready()
        t_ing = med(lambda: jax.device_get(trivial(ingest(words_d).reshape(-1)))) - t_rtt

        lde = jax.jit(lambda c, tw: fft.evaluate_auto(c, tw))
        evals = lde(coeffs, tw); evals.block_until_ready()
        t_fft = med(lambda: jax.device_get(trivial(lde(coeffs, tw).reshape(-1)))) - t_rtt

        leaf = jax.jit(lambda e: merkle.device_levels(e, cutoff_log=0)[0])
        lv0 = leaf(evals); lv0.block_until_ready()
        t_leaf = med(lambda: jax.device_get(trivial(leaf(evals).reshape(-1)))) - t_rtt

        tree = jax.jit(lambda e: merkle.device_levels(e, cutoff_log=0)[-1])
        tree(evals).block_until_ready()
        t_tree = med(lambda: jax.device_get(trivial(tree(evals).reshape(-1)))) - t_rtt

        print(f"2^{log_felts} felts (domain 2^{n}/col): rtt {t_rtt*1e3:.1f} ms | "
              f"ingest {t_ing*1e3:.1f} | fft {t_fft*1e3:.1f} | "
              f"leaf {t_leaf*1e3:.1f} | full tree {t_tree*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
