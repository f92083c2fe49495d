"""Multi-chip sharding for the DAS pipeline (jax.sharding + jit SPMD).

The reference has zero parallelism (SURVEY.md §2.3) — this module is the new
capability: a `(data, elem)` device mesh where

  * `data` — batch-of-blobs axis (embarrassingly parallel commits/proofs);
  * `elem` — the element axis of one blob's evaluation table (the "long
    context" axis, SURVEY.md §5): FFT butterflies and Merkle layers are
    sharded over it, with XLA's SPMD partitioner inserting the all-to-all /
    collective-permute exchanges for the stages whose stride crosses the
    shard boundary (classic distributed-FFT transpose) and the all-gather
    for the Merkle tree top.

Everything here works identically on a virtual CPU mesh
(--xla_force_host_platform_device_count) and a real TPU slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import fft, merkle


def make_mesh(n_data: int | None = None, n_elem: int | None = None, devices=None) -> Mesh:
    """Build a (data, elem) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None and n_elem is None:
        n_data = 1
        n_elem = n
    elif n_data is None:
        n_data = n // n_elem
    elif n_elem is None:
        n_elem = n // n_data
    assert n_data * n_elem <= n
    # NB: np.asarray(device_list) mis-collapses Device objects; fill explicitly.
    devs = np.empty(n_data * n_elem, dtype=object)
    for i, d in enumerate(devices[: n_data * n_elem]):
        devs[i] = d
    return Mesh(devs.reshape(n_data, n_elem), axis_names=("data", "elem"))


def _root_words(evals):
    """Device-only Merkle root words (8,) of a (4, N) evaluation table."""
    levels = merkle.device_levels(evals, cutoff_log=0)
    return levels[-1][:, 0]


def sharded_commit_and_prove(data: bytes, seed, pcs_config, mesh: Mesh):
    """Full end-to-end FRI proof generation SPMD over the mesh's "elem" axis:
    LDE, every per-layer Merkle tree, the device-channel transcript, the PoW
    grind, query draws and the decommitment gathers all run under the real
    sharding (reference behavior: /root/reference/src/proof.rs:28-77).
    Returns (commitment, Proof), bit-identical to the single-device
    core.fri.commit_and_generate_proof (tests/test_sharding.py)."""
    from ..core import fri

    return fri._finish_proof(
        fri._dispatch_commit_phase(data, seed, pcs_config, mesh=mesh)
    )


def prove_many_sharded(datas, seeds, pcs_config, mesh: Mesh):
    """Data-parallel + element-parallel batch proving: ONE SPMD dispatch of
    the full FRI commit phase vmapped over the "data" mesh axis, each blob's
    element axis sharded over "elem". Blobs must share a padded size; each
    blob gets its own transcript/seed. Returns [(commitment, Proof)] in input
    order, bit-identical to per-blob single-device proofs."""
    from ..core import fri
    from ..utils.packing import ceil_log2, polynomial_from_bytes

    datas = list(datas)
    seeds = list(seeds)
    if len(datas) != len(seeds):
        raise ValueError(f"{len(datas)} blobs but {len(seeds)} seeds")
    has_seed = [s is not None for s in seeds]
    if any(has_seed) != all(has_seed):
        raise ValueError("seeds must be all None or all set in one batch")
    coeffs = [polynomial_from_bytes(d) for d in datas]
    if len({c.shape for c in coeffs}) != 1:
        raise ValueError("batch must share a padded size")

    fri_cfg = pcs_config.fri_config
    log_size = ceil_log2(coeffs[0].shape[1])
    n = log_size + fri_cfg.log_blowup_factor
    last_log = fri_cfg.log_last_layer_degree_bound + fri_cfg.log_blowup_factor
    n_inner = n - 1 - last_log
    if n_inner < 0:
        raise ValueError("config unsatisfiable for this blob size")

    fn, tables = fri._fri_commit_fn(
        log_size,
        fri_cfg.log_blowup_factor,
        fri_cfg.log_last_layer_degree_bound,
        fri_cfg.n_queries,
        pcs_config.pow_bits,
        all(has_seed),
        mesh,
        batched=True,
    )
    coeffs_b = jax.device_put(
        jnp.asarray(np.stack(coeffs)), NamedSharding(mesh, P("data", None, "elem"))
    )
    seed_vals = [0 if s is None else int(s) & ((1 << 64) - 1) for s in seeds]
    outs = fn(
        coeffs_b,
        fft.bitrev_perm_device(log_size),
        jnp.asarray([s & 0xFFFFFFFF for s in seed_vals], jnp.uint32),
        jnp.asarray([s >> 32 for s in seed_vals], jnp.uint32),
        *tables,
    )
    return [
        fri._finish_proof((outs[i], pcs_config, log_size, n, n_inner))
        for i in range(len(datas))
    ]


def commit_roots_batch(datas, log_blowup_factor: int, mesh: Mesh) -> list:
    """Data-parallel commit of a batch of equal-shaped blobs. One device
    dispatch, one fetch; returns a list of 32-byte roots (bit-exact with
    api.commit per blob)."""
    from ..utils.packing import ceil_log2, polynomial_from_bytes

    coeffs = [polynomial_from_bytes(d) for d in datas]
    shapes = {c.shape for c in coeffs}
    assert len(shapes) == 1, "batch must share a padded size"
    log_domain = ceil_log2(coeffs[0].shape[1]) + log_blowup_factor
    coeffs_rev = jnp.asarray(
        np.stack([fft.bitrev_coeffs(c) for c in coeffs])
    )
    twiddles = fft.stage_twiddles(log_domain)
    sharding = NamedSharding(mesh, P("data", None, "elem"))
    coeffs_rev = jax.device_put(coeffs_rev, sharding)

    @functools.partial(jax.jit, static_argnums=())
    def run(c, tw):
        return jax.vmap(lambda cc: _root_words(fft.evaluate(cc, tw)))(c)

    words = np.asarray(jax.device_get(run(coeffs_rev, twiddles)))
    return [
        b"".join(int(w).to_bytes(4, "little") for w in words[i])
        for i in range(words.shape[0])
    ]


def sharded_commit_root(coeffs: jnp.ndarray, log_domain: int, mesh: Mesh):
    """Element-axis-sharded commit of a single blob (4, 2^L) -> (8,) root
    words, matching the single-chip root bit-exactly. The LDE runs as the
    shard_map fused path (local fused Pallas passes on TPU + ppermute for the
    cross-shard stages, parallel/fft_sharded.py); the Merkle reduction stays
    auto-sharded (XLA inserts the tree-top collectives)."""
    from .fft_sharded import sharded_evaluate

    sharding = NamedSharding(mesh, P(None, "elem"))
    coeffs = jax.device_put(coeffs, sharding)

    @jax.jit
    def run(c):
        evals = sharded_evaluate(c, log_domain, mesh)
        evals = jax.lax.with_sharding_constraint(
            evals, NamedSharding(mesh, P(None, "elem"))
        )
        # replicate the root words so EVERY process of a multi-host mesh can
        # read them directly (device_get of a fully-replicated global array)
        return jax.lax.with_sharding_constraint(
            _root_words(evals), NamedSharding(mesh, P())
        )

    return run(coeffs)
