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


def test_compress16_constant_folding_matches_oracle():
    """Python-int message constants (the leaf kernel's 12 zero words and any
    folded round-0 state) must fold to the exact same bits as arrays."""
    rng = np.random.default_rng(7)
    cols = rng.integers(0, P, (4, 128), dtype=np.uint32)
    msg = np.zeros((16, 128), np.uint32)
    msg[:4] = cols
    expect = sb.compress_batch(msg)
    got = np.stack([np.asarray(w) for w in mp._compress16(
        [jnp.asarray(cols[i]) for i in range(4)] + [0] * 12
    )])
    assert np.array_equal(got, expect)
    # non-zero constants fold identically too
    msg2 = np.tile(rng.integers(0, 1 << 32, (16, 1), dtype=np.uint64)
                   .astype(np.uint32), (1, 8))
    msg2[:4] = rng.integers(0, 1 << 32, (4, 8), dtype=np.uint64).astype(np.uint32)
    expect2 = sb.compress_batch(msg2)
    got2 = np.stack([np.asarray(w) for w in mp._compress16(
        [jnp.asarray(msg2[i]) for i in range(4)]
        + [int(msg2[i, 0]) for i in range(4, 16)]
    )])
    assert np.array_equal(got2, expect2)


def _oracle_levels(cols):
    """All tree levels of a (4, n) column array (natural halves pairing)."""
    n = cols.shape[1]
    msg = np.zeros((16, n), np.uint32)
    msg[:4] = cols
    level = sb.compress_batch(msg)
    levels = [level]
    while level.shape[1] > 1:
        half = level.shape[1] // 2
        level = sb.compress_batch(
            np.ascontiguousarray(
                np.concatenate([level[:, :half], level[:, half:]], axis=0)
            )
        )
        levels.append(level)
    return levels


def test_leaf3_kernel_blocking_matches_oracle():
    """Emulate leaf3_level's 8 eighth-offset BlockSpecs in numpy; each output
    block must equal the level-3 slice of the whole-tree oracle."""
    rng = np.random.default_rng(8)
    n, block = 2048, 128
    cols = rng.integers(0, P, (4, n), dtype=np.uint32)
    expect = _oracle_levels(cols)[3]  # (8, n/8)
    eighth = n // 8
    nb = eighth // block
    for i in range(nb):
        blocks = [
            cols[:, (i + t * nb) * block : (i + t * nb + 1) * block]
            for t in range(8)
        ]
        l0 = [
            mp._compress16([jnp.asarray(b[r]) for r in range(4)] + [0] * 12)
            for b in blocks
        ]
        got = np.stack([np.asarray(w) for w in mp._combine3(l0)])
        assert np.array_equal(got, expect[:, i * block : (i + 1) * block])


def test_inner3_kernel_blocking_matches_oracle():
    rng = np.random.default_rng(9)
    m_nodes, block = 2048, 128
    level = rng.integers(0, 1 << 32, (8, m_nodes), dtype=np.uint64).astype(np.uint32)
    levels = [level]
    for _ in range(3):
        half = levels[-1].shape[1] // 2
        levels.append(sb.compress_batch(np.ascontiguousarray(
            np.concatenate([levels[-1][:, :half], levels[-1][:, half:]], axis=0)
        )))
    expect = levels[3]
    eighth = m_nodes // 8
    nb = eighth // block
    for i in range(nb):
        qs = [
            level[:, (i + t * nb) * block : (i + t * nb + 1) * block]
            for t in range(8)
        ]
        got = np.stack([np.asarray(w) for w in mp._combine3(
            [[jnp.asarray(q[w]) for w in range(8)] for q in qs]
        )])
        assert np.array_equal(got, expect[:, i * block : (i + 1) * block])


def test_device_root_level_matches_device_levels():
    """On CPU both take the jnp fallback, but device_root_level's shape
    plumbing (fused-width asserts, cutoff semantics) must agree with
    device_levels' top for the supported sizes."""
    import jax

    from frieda_tpu.core import merkle

    rng = np.random.default_rng(10)
    cols = jnp.asarray(rng.integers(0, P, (4, 1 << 12), dtype=np.uint32))
    top_a = np.asarray(jax.jit(merkle.device_root_level)(cols))
    top_b = np.asarray(jax.jit(lambda c: merkle.device_levels(c)[-1])(cols))
    assert np.array_equal(top_a, top_b)


def test_pruned_levels_and_auth_gathers_match_full_tree():
    """device_levels_pruned + fri._auth_sibling_nodes vs the full 2-at-a-time
    build: every stored level must equal the full build's level at the SAME
    index, and the recomputed auth-path nodes of every (missing or stored)
    level must equal a direct gather from the full tree. Runs at 2^15 leaves,
    the smallest width where the 3-level fused grouping engages (this is the
    shape class where an off-by-one in the grouped fallback once shifted
    every stored level by one — caught only at fused widths)."""
    import jax

    from frieda_tpu.core import merkle
    from frieda_tpu.core.fri import _auth_sibling_nodes, _dbitrev

    rng = np.random.default_rng(11)
    log_leaves = 15
    n = 1 << log_leaves
    cols = jnp.asarray(rng.integers(0, P, (4, n), dtype=np.uint32))
    full = merkle.device_levels(cols, cutoff_log=0)
    pruned = merkle.device_levels_pruned(cols)
    # every multiple-of-3 level + the root, nothing else
    assert [lv for lv, _ in pruned] == [3, 6, 9, 12, 15]
    assert pruned[-1][0] == log_leaves  # ends at the width-1 root level
    for lv, arr in pruned:
        assert np.array_equal(np.asarray(arr), np.asarray(full[lv])), lv
    stored = dict(pruned)
    pos = jnp.asarray(rng.integers(0, n, size=20, dtype=np.uint32))
    for k in range(log_leaves):
        got = np.asarray(_auth_sibling_nodes(stored, cols, log_leaves, pos, k))
        sidx = (np.asarray(pos) >> k) ^ 1
        nat = np.asarray(_dbitrev(jnp.asarray(sidx, jnp.uint32), log_leaves - k))
        assert np.array_equal(got, np.asarray(full[k])[:, nat]), k


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
