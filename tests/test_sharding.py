"""Multi-device sharding: bit-exactness across mesh shapes (virtual CPU mesh).

The conformance rule from SURVEY.md §4: sharded commit == single-chip commit
== oracle, for every mesh factorization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frieda_tpu import api
from frieda_tpu.config import FriConfig, PcsConfig
from frieda_tpu.core import fft, fri
from frieda_tpu.parallel import sharding
from frieda_tpu.spec import commit as sc
from frieda_tpu.utils.packing import ceil_log2, polynomial_from_bytes

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

DATA = bytes((7 * i + 1) % 256 for i in range(2048))
LOG_BLOWUP = 2


def _root_bytes(words) -> bytes:
    return b"".join(int(w).to_bytes(4, "little") for w in np.asarray(words))


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_commit_root_matches_oracle(mesh_shape):
    coeffs = polynomial_from_bytes(DATA)
    n = ceil_log2(coeffs.shape[1]) + LOG_BLOWUP
    coeffs_rev = jnp.asarray(fft.bitrev_coeffs(coeffs))
    mesh = sharding.make_mesh(*mesh_shape)
    words = sharding.sharded_commit_root(coeffs_rev, n, mesh)
    assert _root_bytes(words) == sc.commit(DATA, LOG_BLOWUP)
    assert _root_bytes(words) == api.commit(DATA, LOG_BLOWUP)


PROVE_CFG = PcsConfig(pow_bits=5, fri_config=FriConfig(2, 0, 8))


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_prove_end_to_end_bit_identical(mesh_shape):
    """The real FRI prover — transcript, per-layer Merkle, grind, decommit —
    under SPMD must produce a byte-identical proof that verifies
    (reference behavior: src/proof.rs:28-77)."""
    seed = 42
    c_single, p_single = fri.commit_and_generate_proof(DATA, seed, PROVE_CFG)
    mesh = sharding.make_mesh(*mesh_shape)
    c_sh, p_sh = sharding.sharded_commit_and_prove(DATA, seed, PROVE_CFG, mesh)
    assert c_sh == c_single
    assert p_sh.to_bytes() == p_single.to_bytes()
    assert fri.verify_proof(p_sh, seed)


def test_prove_many_sharded_data_parallel():
    """Batched DP+SP proving: one SPMD dispatch over the (data, elem) mesh,
    each blob bit-identical to its single-device proof."""
    mesh = sharding.make_mesh(2, 4)
    datas = [bytes((i * 13 + s) % 256 for i in range(2048)) for s in range(4)]
    seeds = [10, 11, 12, 13]
    batch = sharding.prove_many_sharded(datas, seeds, PROVE_CFG, mesh)
    for (cb, pb), d, s in zip(batch, datas, seeds):
        c_single, p_single = fri.commit_and_generate_proof(d, s, PROVE_CFG)
        assert cb == c_single
        assert pb.to_bytes() == p_single.to_bytes()
        assert fri.verify_proof(pb, s)


def test_commit_batch_api():
    datas = [bytes((i * 31 + s) % 256 for i in range(1024)) for s in range(4)]
    mesh = sharding.make_mesh(2, 4)
    roots = sharding.commit_roots_batch(datas, LOG_BLOWUP, mesh)
    for d, r in zip(datas, roots):
        assert r == api.commit(d, LOG_BLOWUP)


@pytest.mark.parametrize("n_elem", [1, 2, 4, 8])
def test_shard_map_fft_bit_exact(n_elem):
    """The shard_map fused-FFT path (parallel/fft_sharded.py: local passes +
    ppermute cross-shard stages) must be bit-exact with the XLA stage loop
    for every shard count, including with the Reed-Solomon dilation."""
    from frieda_tpu.parallel import fft_sharded

    rng = np.random.default_rng(3)
    for log_l, n in [(8, 12), (5, 9)]:
        coeffs = rng.integers(0, (1 << 31) - 1, (4, 1 << log_l), dtype=np.uint32)
        cr = jnp.asarray(fft.bitrev_coeffs(coeffs))
        ref = np.asarray(fft.evaluate(cr, fft.stage_twiddles(n)))
        mesh = sharding.make_mesh(n_data=1, n_elem=n_elem)
        out = np.asarray(fft_sharded.sharded_evaluate(cr, n, mesh))
        assert (out == ref).all(), (log_l, n, n_elem)


def test_shard_map_fft_pallas_interpret():
    """Fused Pallas kernels INSIDE shard_map (interpret mode on CPU) — the
    exact program a real multi-chip TPU slice runs — stay bit-exact."""
    from frieda_tpu.parallel import fft_sharded

    rng = np.random.default_rng(4)
    log_l, n = 12, 15
    coeffs = rng.integers(0, (1 << 31) - 1, (4, 1 << log_l), dtype=np.uint32)
    cr = jnp.asarray(fft.bitrev_coeffs(coeffs))
    ref = np.asarray(fft.evaluate(cr, fft.stage_twiddles(n)))
    mesh = sharding.make_mesh(n_data=1, n_elem=2)
    out = np.asarray(fft_sharded.sharded_evaluate(cr, n, mesh, interpret=True))
    assert (out == ref).all()


@pytest.mark.parametrize("n_elem", [2, 8])
def test_sharded_commit_root_large_domain(n_elem):
    """Mesh-shape sweep at a 2^20 domain (VERDICT r1 item 5): the sharded
    commit pipeline stays bit-exact at BASELINE-scale shapes, not just the
    small conformance sizes."""
    rng = np.random.default_rng(5)
    log_l, n = 16, 20
    coeffs = rng.integers(0, (1 << 31) - 1, (4, 1 << log_l), dtype=np.uint32)
    cr = jnp.asarray(fft.bitrev_coeffs(coeffs))
    mesh = sharding.make_mesh(n_data=1, n_elem=n_elem)
    words = sharding.sharded_commit_root(cr, n, mesh)
    ref = sharding.sharded_commit_root(
        cr, n, sharding.make_mesh(n_data=1, n_elem=1)
    )
    assert _root_bytes(words) == _root_bytes(ref)


@pytest.mark.slow
def test_sharded_prove_production_shape_bit_identical():
    """VERDICT r3 item 4: the full SPMD prover at a PRODUCTION shape —
    2^18 felts, per-coordinate polys 2^16, eval domain 2^20 — on a (1, 8)
    mesh must be byte-identical to single-device. At this size the element
    axis is genuinely sharded through every wide layer and the tail-layer
    replication boundaries (core/fri.py shard_elem) actually bite, unlike
    the 2^10-domain conformance cases above."""
    n_bytes = 983040  # ceil(8*n/30) = 2^18 felts exactly
    data = bytes((5 * i + 11) % 256 for i in range(n_bytes))
    cfg = PcsConfig(pow_bits=5, fri_config=FriConfig(4, 0, 20))
    seed = 7
    c_single, p_single = fri.commit_and_generate_proof(data, seed, cfg)
    mesh = sharding.make_mesh(1, 8)
    c_sh, p_sh = sharding.sharded_commit_and_prove(data, seed, cfg, mesh)
    assert c_sh == c_single
    assert p_sh.to_bytes() == p_single.to_bytes()
    assert fri.verify_proof(p_sh, seed)


def test_multihost_helpers_single_process():
    """multihost module: single-process fallbacks are exact no-ops and the
    mesh helper builds over all devices."""
    from frieda_tpu.parallel import multihost

    assert multihost.initialize() is False  # no coordinator info: no-op
    assert multihost.broadcast_from_host0(b"abc") == b"abc"
    arr = np.arange(5)
    assert (multihost.broadcast_from_host0(arr) == arr).all()
    multihost.assert_same_across_hosts(b"xyz")  # must not raise
    mesh = multihost.global_mesh(n_data=2, n_elem=4)
    assert mesh.shape == {"data": 2, "elem": 4}
