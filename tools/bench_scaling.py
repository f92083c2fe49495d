"""Scaling-efficiency benchmark over a (data, elem) device mesh.

BASELINE.json asks for ops/s + scaling efficiency at 1 chip / 1 host /
N hosts. With one real chip attached, this harness demonstrates the scaling
methodology on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_
device_count=N) — the identical `jax.sharding` program runs unchanged on a
real multi-chip slice, where the same measurement gives real efficiency.

Results are persisted to SCALING.json at the repo root (committed artifact;
VERDICT r1 item 5) with one record per (log_felts, n_elem).

NB on interpreting virtual-mesh numbers: all N "devices" share the same host
CPU cores, so elem=N wall time measures the SPMD program's *overhead*
(collectives, partitioning) on a fixed compute budget, not a speedup. The
honest efficiency metric on this rig is therefore
  eff(N) = t(elem=1) / t(elem=N)   (1.0 = sharding adds zero overhead),
and that is what we record; on real chips the same program's eff would be
measured as t(1) / (N * t(N)).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/bench_scaling.py [log_felts ...]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# This tool demonstrates scaling on a virtual CPU mesh; force the platform
# (the environment pins JAX_PLATFORMS=axon via sitecustomize — the env var
# alone does not stick, set jax.config too).
os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def log(msg):
    print(msg, flush=True)


def main():
    from frieda_tpu.core import fft
    from frieda_tpu.parallel import sharding

    log_felts_list = [int(a) for a in sys.argv[1:]] or [16, 20]
    log_blowup = 4
    n_dev_total = len(jax.devices())
    log(f"devices: {n_dev_total} x {jax.devices()[0].platform}")

    records = []
    for log_felts in log_felts_list:
        rng = np.random.default_rng(0)
        coeffs = rng.integers(0, (1 << 31) - 1, (4, 1 << (log_felts - 2)),
                              dtype=np.uint32)
        coeffs_rev = fft.bitrev_coeffs(coeffs)
        log_domain = (log_felts - 2) + log_blowup
        log(f"-- {1 << log_felts} felts (domain 2^{log_domain}/col) --")
        results = {}
        n_elem = 1
        while n_elem <= n_dev_total:
            try:
                t = _bench_elem_sharded(sharding, coeffs_rev, log_domain, n_elem)
                results[n_elem] = t
                eff = results[1] / t
                log(f"elem={n_elem}: {t*1e3:.1f} ms/blob  "
                    f"overhead-efficiency {eff*100:.0f}%")
                records.append({
                    "log_felts": log_felts,
                    "n_elem": n_elem,
                    "ms_per_blob": round(t * 1e3, 2),
                    "felts_per_s": round((1 << log_felts) / t),
                    "overhead_efficiency": round(results[1] / t, 3),
                })
            except Exception as e:  # noqa: BLE001
                log(f"elem={n_elem} failed: {e}")
            n_elem *= 2

    cluster = None
    if "--no-cluster" not in sys.argv:
        try:
            cluster = _bench_cluster_2proc(log_felts_list[-1])
            log(f"2-process cluster (log_felts {cluster['log_felts']}): "
                f"{cluster['ms_per_blob']} ms/blob vs local "
                f"{cluster['ms_per_blob_local']} ms, overhead-efficiency "
                f"{cluster['overhead_efficiency']*100:.0f}%")
        except Exception as e:  # noqa: BLE001
            log(f"cluster row failed: {e}")

    out = {
        "platform": f"{n_dev_total}x virtual {jax.devices()[0].platform} mesh",
        "note": ("virtual devices share host cores; overhead_efficiency = "
                 "t(elem=1)/t(elem=N), 1.0 = sharding adds zero overhead. "
                 "On a real slice the same program measures true scaling."),
        "records": records,
    }
    if cluster is not None:
        out["cluster_2proc"] = cluster
        out["cluster_note"] = (
            "2 separate OS processes forming a jax.distributed cluster "
            "(1 device each, collectives through the distributed runtime) — "
            "the closest single-box stand-in for BASELINE.md's N-host row; "
            "same caveat: both processes share this host's cores, so the "
            "ratio measures distributed-runtime overhead, not speedup."
        )
    path = os.path.join(REPO, "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")


def _bench_cluster_2proc(log_felts: int):
    """Spawn the 2-process jax.distributed cluster (tools/_scaling_worker.py)
    and collect its timing row (VERDICT r4 item 7)."""
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_scaling_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pin their own 1-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(pid), str(log_felts)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for pid, (p, (so, se)) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or f"WORKER_{pid}_OK" not in se:
            raise RuntimeError(f"worker {pid} failed:\n{so}\n{se}")
    row = json.loads(outs[0][0].strip().splitlines()[-1])
    return {
        "log_felts": row["log_felts"],
        "n_processes": 2,
        "ms_per_blob": round(row["t_cluster_s"] * 1e3, 2),
        "ms_per_blob_local": round(row["t_local_s"] * 1e3, 2),
        "felts_per_s": round((1 << row["log_felts"]) / row["t_cluster_s"]),
        "overhead_efficiency": round(row["t_local_s"] / row["t_cluster_s"], 3),
    }


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


if __name__ == "__main__":
    main()
