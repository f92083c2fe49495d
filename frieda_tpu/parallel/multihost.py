"""Multi-host topology: jax.distributed runtime + host-0 challenge broadcast.

The reference has no distributed communication of any kind (SURVEY.md §2.3 —
no NCCL/MPI/Gloo in Cargo.lock); this module is the TPU-native equivalent
mandated by SURVEY.md §5 "Distributed communication backend": the
`jax.distributed` runtime carries control-plane coordination, XLA-scheduled
collectives over ICI/DCN carry the data plane, and the strictly sequential
Fiat-Shamir channel is handled by DESIGN rather than by messaging:

  * The transcript runs ON DEVICE as the replicated device-channel twin
    (core/device_channel.py): every chip on every host folds the same roots
    into the same digest, so challenges (alphas, PoW target, query positions)
    are computed redundantly-but-identically everywhere. No host-0 broadcast
    is needed inside the jitted prover — XLA's SPMD model already guarantees
    replicated values are consistent.
  * The only places a host-0 decision must reach other processes are OUTSIDE
    jit: picking seeds / job assignment, and publishing assembled proof bytes.
    `broadcast_from_host0` covers those with one psum-based collective.

Single-process sessions (the common case, and this repo's CI) work unchanged:
`initialize()` is a no-op without coordinator info, and every helper falls
back to process-local behavior.

Launch pattern on a real multi-host slice (one process per host):

    from frieda_tpu.parallel import multihost, sharding
    multihost.initialize()                      # env-driven (TPU pods: automatic)
    mesh = multihost.global_mesh(n_data=..., n_elem=...)
    com, proof = sharding.sharded_commit_and_prove(data, seed, cfg, mesh)

For `sharded_commit_and_prove` across hosts, proof assembly fetches only
replicated/small outputs (roots, last layer, nonce, queries) plus decommit
gathers whose outputs are replicated by construction, so every process
assembles the same proof bytes locally — assembly needs no cross-host
traffic at all.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize the jax.distributed runtime if (and only if) this looks
    like a multi-process launch. Returns True if the runtime is (now) live.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/
    PROCESS_ID env vars > TPU-pod auto-detection (jax.distributed.initialize
    with no args works on Cloud TPU pods) > single-process no-op.

    NB: must run before anything that initializes the XLA backend — so the
    already-initialized probe is jax.distributed.is_initialized(), NOT
    jax.process_count() (which would itself initialize the backend and make
    a subsequent distributed initialize impossible)."""
    if jax.distributed.is_initialized():
        return True  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process session: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(n_data: int | None = None, n_elem: int | None = None):
    """(data, elem) mesh over ALL global devices (every host's chips).

    Shardings should put the `elem` axis within a host's ICI domain where
    possible: jax.devices() enumerates devices grouped by process, so an
    `n_elem` that divides the per-host device count keeps every FFT/Merkle
    collective on ICI and only the (rare, tiny) replicated-value traffic on
    DCN."""
    from .sharding import make_mesh

    return make_mesh(n_data=n_data, n_elem=n_elem, devices=jax.devices())


def broadcast_from_host0(value: np.ndarray | bytes) -> np.ndarray | bytes:
    """Broadcast a host-side value from process 0 to all processes (the
    "host-0 challenge broadcast" of SURVEY.md §5: seeds, job assignments,
    assembled proof bytes). Single-process: identity.

    Implemented as a replicated-sum collective over the process axis (the
    canonical multihost_utils pattern): non-zero contribution only from
    process 0."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    if isinstance(value, bytes):
        n = np.zeros(1, np.int64)
        if jax.process_index() == 0:
            n[0] = len(value)
        n = int(multihost_utils.broadcast_one_to_all(n)[0])
        buf = np.zeros(n, np.uint8)
        if jax.process_index() == 0:
            buf[:] = np.frombuffer(value, np.uint8)
        return multihost_utils.broadcast_one_to_all(buf).tobytes()
    return multihost_utils.broadcast_one_to_all(np.asarray(value))


def assert_same_across_hosts(value: bytes, what: str = "value") -> None:
    """Determinism guard: every process must have assembled identical bytes
    (proofs are replicated computations — divergence means a bug, not a race).
    Single-process: no-op."""
    if jax.process_count() == 1:
        return
    ref = broadcast_from_host0(value)
    if ref != value:
        raise AssertionError(
            f"{what} diverged on process {jax.process_index()} "
            f"(len {len(value)} vs host-0 len {len(ref)})"
        )
