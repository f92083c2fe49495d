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
