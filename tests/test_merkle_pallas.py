"""Pallas Merkle kernels: body + block-plumbing bit-exactness on CPU.

`pallas_call(interpret=True)` over the fully-unrolled blake2s body is
pathologically slow to compile on the CPU backend (the 560-op graph hits an
XLA-CPU compile blowup), so these tests verify the two pieces separately and
cheaply:

  * the kernel BODY (`_compress16`) against the numpy spec oracle — the
    compression math itself, bit-exact;
  * the BlockSpec index maps by emulating the grid/blocking in numpy and
    comparing each emulated block against the whole-level oracle result —
    the pairing/offset arithmetic, which is the only other thing the kernels
    contain.

Real compiled execution of the kernels is exercised on TPU: bench.py commits
reproduce the golden blob root through `merkle_pallas`, and the driver's
`__graft_entry__.entry()` compile check includes `merkle.device_levels`.
"""

import jax.numpy as jnp
import numpy as np

from frieda_tpu.ops import merkle_pallas as mp
from frieda_tpu.spec import blake2s as sb

P = (1 << 31) - 1


def test_compress16_body_matches_oracle():
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 1 << 32, (16, 256), dtype=np.uint64).astype(np.uint32)
    got = np.stack([np.asarray(w) for w in mp._compress16(
        [jnp.asarray(msg[i]) for i in range(16)]
    )])
    expect = sb.compress_batch(msg)
    assert np.array_equal(got, expect)


def test_leaf_kernel_blocking_matches_oracle():
    """Emulate leaf_level's grid/BlockSpecs in numpy; each block must equal
    the corresponding slice of the whole-level oracle result."""
    rng = np.random.default_rng(1)
    n, block = 512, 128
    cols = rng.integers(0, P, (4, n), dtype=np.uint32)
    msg = np.zeros((16, n), np.uint32)
    msg[:4] = cols
    expect = sb.compress_batch(msg)
    for i in range(n // block):
        blk = cols[:, i * block : (i + 1) * block]  # in_spec (4, block), (0, i)
        m = [jnp.asarray(blk[j]) for j in range(4)]
        m += [jnp.zeros(block, jnp.uint32)] * 12
        got = np.stack([np.asarray(w) for w in mp._compress16(m)])
        assert np.array_equal(got, expect[:, i * block : (i + 1) * block])


def test_inner_kernel_blocking_matches_oracle():
    """inner_level pairs node j with j + M/2: lo blocks at index i, hi blocks
    at index i + half/block (the `i + _n` index map)."""
    rng = np.random.default_rng(2)
    m_nodes, block = 1024, 128
    level = rng.integers(0, 1 << 32, (8, m_nodes), dtype=np.uint64).astype(np.uint32)
    half = m_nodes // 2
    msg = np.concatenate([level[:, :half], level[:, half:]], axis=0)
    expect = sb.compress_batch(np.ascontiguousarray(msg))
    for i in range(half // block):
        lo = level[:, i * block : (i + 1) * block]
        hi = level[:, half + i * block : half + (i + 1) * block]
        m = [jnp.asarray(lo[w]) for w in range(8)] + [jnp.asarray(hi[w]) for w in range(8)]
        got = np.stack([np.asarray(w) for w in mp._compress16(m)])
        assert np.array_equal(got, expect[:, i * block : (i + 1) * block])
