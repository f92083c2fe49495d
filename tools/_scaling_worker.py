"""Worker process for tools/bench_scaling.py's 2-process cluster row
(not a pytest module; pattern shared with tests/_multihost_worker.py).

Forms one half of a jax.distributed cluster (1 CPU device per process, 2
global devices), times the element-sharded commit over the GLOBAL mesh —
collectives crossing the process boundary through the distributed runtime —
and, on process 0, also times the unsharded single-device commit as the
efficiency denominator. Process 0 prints one JSON line:

  {"t_cluster_s": ..., "t_local_s": ..., "log_felts": ..., "root": hex}

argv: coordinator_address process_id log_felts
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator, pid, log_felts = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from frieda_tpu.core import fft  # noqa: E402
from frieda_tpu.parallel import multihost, sharding  # noqa: E402

LOG_BLOWUP = 4
ITERS = 3


def main() -> None:
    assert multihost.initialize(coordinator, 2, pid) is True
    assert jax.process_count() == 2 and len(jax.devices()) == 2

    rng = np.random.default_rng(0)
    coeffs_rev = jnp.asarray(
        rng.integers(0, (1 << 31) - 1, (4, 1 << (log_felts - 2)), dtype=np.uint32)
    )
    log_domain = (log_felts - 2) + LOG_BLOWUP

    mesh = multihost.global_mesh(n_data=1, n_elem=2)
    words = sharding.sharded_commit_root(coeffs_rev, log_domain, mesh)
    jax.block_until_ready(words)  # warm / compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        words = sharding.sharded_commit_root(coeffs_rev, log_domain, mesh)
        jax.block_until_ready(words)
    t_cluster = (time.perf_counter() - t0) / ITERS
    local_words = np.asarray(jax.device_get(words))
    root = b"".join(int(w).to_bytes(4, "little") for w in local_words[:8])
    multihost.assert_same_across_hosts(root, "cluster scaling root")

    if pid == 0:
        # denominator: the same commit on ONE local device, no distributed
        # collectives (a local 1x1 mesh over this process's device)
        from jax.sharding import Mesh

        local_mesh = Mesh(
            np.array(jax.local_devices()[:1]).reshape(1, 1), ("data", "elem")
        )
        w1 = sharding.sharded_commit_root(coeffs_rev, log_domain, local_mesh)
        jax.block_until_ready(w1)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            w1 = sharding.sharded_commit_root(coeffs_rev, log_domain, local_mesh)
            jax.block_until_ready(w1)
        t_local = (time.perf_counter() - t0) / ITERS
        assert np.asarray(jax.device_get(w1))[:8].tobytes() == root
        print(json.dumps({
            "t_cluster_s": round(t_cluster, 6),
            "t_local_s": round(t_local, 6),
            "log_felts": log_felts,
            "root": root.hex(),
        }), flush=True)
    print(f"WORKER_{pid}_OK", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
