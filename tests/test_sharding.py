"""Multi-device sharding: bit-exactness across mesh shapes (virtual CPU mesh).

The conformance rule from SURVEY.md §4: sharded commit == single-chip commit
== oracle, for every mesh factorization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frieda_tpu import api
from frieda_tpu.core import fft
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


def test_batched_prover_step_consistent_across_meshes():
    rng = np.random.default_rng(5)
    coeffs_b = jnp.asarray(rng.integers(0, (1 << 31) - 1, (4, 4, 1 << 7), dtype=np.uint32))
    outs = []
    for mesh_shape in [(1, 8), (2, 4), (4, 2)]:
        mesh = sharding.make_mesh(*mesh_shape)
        r0, r1, folded = sharding.batched_prover_step(coeffs_b, 9, mesh)
        outs.append((np.asarray(r0), np.asarray(r1), np.asarray(folded)))
    for other in outs[1:]:
        for a, b in zip(outs[0], other):
            assert np.array_equal(a, b)


def test_commit_batch_api():
    datas = [bytes((i * 31 + s) % 256 for i in range(1024)) for s in range(4)]
    mesh = sharding.make_mesh(2, 4)
    roots = sharding.commit_roots_batch(datas, LOG_BLOWUP, mesh)
    for d, r in zip(datas, roots):
        assert r == api.commit(d, LOG_BLOWUP)
