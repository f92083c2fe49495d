"""Worker process for tests/test_multihost.py (not a pytest module).

Runs as one of two cooperating processes: initializes the jax.distributed
runtime against a localhost coordinator, then exercises the multi-process
branches of frieda_tpu.parallel.multihost plus a real 2-process SPMD commit.

argv: coordinator_address process_id
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator, pid = sys.argv[1], int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
# one CPU device per process -> two global devices
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from frieda_tpu.parallel import multihost, sharding  # noqa: E402


def main() -> None:
    assert multihost.initialize(coordinator, 2, pid) is True
    assert jax.process_count() == 2
    assert jax.process_index() == pid
    assert len(jax.devices()) == 2  # global devices across both processes

    # host-0 broadcast: bytes (length differs per process pre-broadcast)
    payload = b"seed-0042-from-host0" if pid == 0 else b""
    got = multihost.broadcast_from_host0(payload)
    assert got == b"seed-0042-from-host0", got

    # host-0 broadcast: ndarray
    arr = np.arange(7, dtype=np.int64) * (1 if pid == 0 else -1)
    got_arr = multihost.broadcast_from_host0(arr)
    assert (got_arr == np.arange(7, dtype=np.int64)).all(), got_arr

    # determinism guard: identical bytes pass ...
    multihost.assert_same_across_hosts(b"same-on-both", "probe")
    # ... divergent bytes raise on the non-0 process
    try:
        multihost.assert_same_across_hosts(
            b"host0-version" if pid == 0 else b"host1-version", "probe"
        )
        diverged_raised = False
    except AssertionError:
        diverged_raised = True
    assert diverged_raised == (pid != 0), diverged_raised

    # real 2-process SPMD commit over the global (1, 2) mesh: every FFT
    # stage/Merkle collective crosses the process boundary; both processes
    # must see the replicated root words and agree with the local oracle.
    from frieda_tpu.core import fft
    from frieda_tpu.spec import commit as sc
    from frieda_tpu.utils.packing import ceil_log2, polynomial_from_bytes

    data = bytes((7 * i + 1) % 256 for i in range(2048))
    log_blowup = 2
    coeffs = polynomial_from_bytes(data)
    n = ceil_log2(coeffs.shape[1]) + log_blowup
    coeffs_rev = jnp.asarray(fft.bitrev_coeffs(coeffs))
    mesh = multihost.global_mesh(n_data=1, n_elem=2)
    words = sharding.sharded_commit_root(coeffs_rev, n, mesh)
    local_words = np.asarray(jax.device_get(words))  # fully replicated
    root = b"".join(int(w).to_bytes(4, "little") for w in local_words[:8])
    assert root == sc.commit(data, log_blowup), root.hex()
    multihost.assert_same_across_hosts(root, "sharded root")

    print(f"WORKER_{pid}_OK", flush=True)


if __name__ == "__main__":
    main()
