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
from ..core.field import qm31_add, qm31_mul, qm31_mul_m31, qm31_sub


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


def das_prover_step(coeffs, twiddles, ys_inv, xs_inv0, alpha0, alpha1):
    """One full DAS prover device step for a single blob: low-degree extend,
    Merkle-commit, circle->line FRI fold, commit the folded layer, line fold.
    Returns (commit_root_words, layer1_root_words, folded_layer).

    This is the "training step" analogue the multi-chip dry-run exercises —
    it touches every sharded kernel family (butterfly stages, batched hashing,
    tree reduction, pairwise folds)."""
    evals = fft.evaluate(coeffs, twiddles)
    root0 = _root_words(evals)
    a0 = tuple(alpha0[i] for i in range(4))
    a1 = tuple(alpha1[i] for i in range(4))
    half = evals.shape[1] // 2
    fp = tuple(evals[i, :half] for i in range(4))
    fm = tuple(evals[i, half:] for i in range(4))
    f1 = qm31_mul_m31(qm31_sub(fp, fm), ys_inv)
    g = jnp.stack(qm31_add(qm31_add(fp, fm), qm31_mul(a0, f1)))
    root1 = _root_words(g)
    quarter = half // 2
    g0 = tuple(g[i, :quarter] for i in range(4))
    g1 = tuple(g[i, quarter:] for i in range(4))
    h1 = qm31_mul_m31(qm31_sub(g0, g1), xs_inv0)
    g2 = jnp.stack(qm31_add(qm31_add(g0, g1), qm31_mul(a1, h1)))
    return root0, root1, g2


@functools.partial(jax.jit, static_argnums=(2,))
def _batched_step(coeffs_b, consts, mesh: Mesh):
    twiddles, ys_inv, xs_inv0, alpha0, alpha1 = consts
    step = lambda c: das_prover_step(c, twiddles, ys_inv, xs_inv0, alpha0, alpha1)
    r0, r1, g2 = jax.vmap(step)(coeffs_b)
    # Keep the folded layer element-sharded, roots replicated per data shard.
    g2 = jax.lax.with_sharding_constraint(
        g2, NamedSharding(mesh, P("data", None, "elem"))
    )
    return r0, r1, g2


def batched_prover_step(coeffs_b: jnp.ndarray, log_domain: int, mesh: Mesh):
    """Batch of blobs (B, 4, 2^L) -> sharded full prover device step over the
    (data, elem) mesh. Returns (roots0 (B, 8), roots1 (B, 8), folded)."""
    from ..core.circle import get_twiddles

    tw = get_twiddles(log_domain)
    consts = (
        tuple(fft.stage_twiddles(log_domain)),
        jnp.asarray(tw.ys_inv),
        jnp.asarray(tw.xs_layers_inv[0]),
        jnp.arange(1, 5, dtype=jnp.uint32),
        jnp.arange(5, 9, dtype=jnp.uint32),
    )
    sharding = NamedSharding(mesh, P("data", None, "elem"))
    coeffs_b = jax.device_put(coeffs_b, sharding)
    return _batched_step(coeffs_b, consts, mesh)


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
    words, matching the single-chip root bit-exactly."""
    twiddles = tuple(fft.stage_twiddles(log_domain))
    sharding = NamedSharding(mesh, P(None, "elem"))
    coeffs = jax.device_put(coeffs, sharding)

    @jax.jit
    def run(c, tw):
        evals = fft.evaluate(c, tw)
        evals = jax.lax.with_sharding_constraint(
            evals, NamedSharding(mesh, P(None, "elem"))
        )
        return _root_words(evals)

    return run(coeffs, twiddles)
