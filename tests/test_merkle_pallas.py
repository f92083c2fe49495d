"""Pallas Merkle kernels vs the jnp/oracle path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from frieda_tpu.ops import merkle_pallas as mp
from frieda_tpu.spec import blake2s as sb

P = (1 << 31) - 1


def test_leaf_level_matches_oracle():
    rng = np.random.default_rng(0)
    cols = rng.integers(0, P, (4, 256), dtype=np.uint32)
    got = np.asarray(mp.leaf_level(jnp.asarray(cols), block=128, interpret=True))
    msg = np.zeros((16, 256), np.uint32)
    msg[:4] = cols
    expect = sb.compress_batch(msg)
    assert np.array_equal(got, expect)


def test_inner_level_matches_oracle():
    rng = np.random.default_rng(1)
    level = rng.integers(0, 1 << 32, (8, 512), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(mp.inner_level(jnp.asarray(level), block=128, interpret=True))
    half = 256
    msg = np.concatenate([level[:, :half], level[:, half:]], axis=0)
    expect = sb.compress_batch(np.ascontiguousarray(msg))
    assert np.array_equal(got, expect)
