"""Merkle commitment over evaluation columns (device hashing + host top/openings).

TPU-native equivalent of stwo's vcs MerkleProver/MerkleVerifier as used by the
reference (/root/reference/src/commit.rs:17-21, src/proof.rs:14; spec:
SURVEY.md A.6, golden-verified):

  leaf i   = raw_compress(0, [c0[i], c1[i], c2[i], c3[i], 0 x 12])
  inner    = raw_compress(0, left(8 words) || right(8 words))
  root     = top node, serialized as 8 little-endian u32 words.

The wide levels are one fused device pass each (compress_batch); once a level
shrinks to <= 2^HOST_CUTOFF_LOG nodes the remainder is finished on host with
the numpy oracle kernel — tiny levels are pure dispatch overhead on TPU and
inflate compile time. Openings are planned with value-free host index math
and fetched with small device gathers (see core/fri.py).

Opening format (deterministic, mirrors stwo's hash_witness concept): walking
levels bottom-up over the sorted set of known node indices, every sibling
hash that cannot be derived from known nodes is appended to `hash_witness`
in encounter order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.blake2s import compress_batch as np_compress_batch
from ..spec.blake2s import raw_compress
from .blake2s import compress_batch

HOST_CUTOFF_LOG = 6  # finish the tree on host once a level has <= 64 nodes


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def device_levels(columns: jnp.ndarray, cutoff_log: int = HOST_CUTOFF_LOG):
    """Wide hash levels on device. columns: (4, N) uint32 in NATURAL domain
    order (core/circle.py layout note). In natural order the reference's
    sibling leaves (stored 2k, 2k+1) sit at positions (j, j + N/2), so every
    level combines its two contiguous halves — no strided access. Node j of
    the produced level is the stored-order node bitrev(j) (pure host index
    math; see CommitTree.gather_nodes).

    Wide levels use the Pallas kernels (ops/merkle_pallas.py) on TPU; narrow
    levels and other backends use the fori-loop jnp compression.

    Returns levels leaves-first as (8, m) uint32 arrays, stopping once a
    level has <= 2^cutoff_log nodes."""
    from ..ops import merkle_pallas
    from .blake2s import compress_rows

    assert columns.shape[0] == 4
    n = columns.shape[1]
    pallas_ok = _use_pallas()
    block = merkle_pallas.BLOCK
    if pallas_ok and n % block == 0:
        level = merkle_pallas.leaf_level(columns, block)
    else:
        msg = jnp.concatenate([columns, jnp.zeros((12, n), jnp.uint32)], axis=0)
        level = compress_rows(msg)
    levels = [level]
    while level.shape[1] > max(1 << cutoff_log, 1):
        half = level.shape[1] // 2
        if pallas_ok and half % block == 0:
            level = merkle_pallas.inner_level(level, block)
        else:
            msg = jnp.concatenate([level[:, :half], level[:, half:]], axis=0)
            level = compress_rows(msg)
        levels.append(level)
    return levels


def device_root_level(columns: jnp.ndarray, cutoff_log: int = HOST_CUTOFF_LOG):
    """Top device level for ROOT-ONLY commits ((8, <= 2^cutoff_log)): same
    result as device_levels(...)[-1], but wide levels are hashed THREE at a
    time with the fused kernels (ops/merkle_pallas.leaf3_level/inner3_level)
    so intermediate levels never touch HBM — ~5x less Merkle HBM traffic —
    and the narrow remainder collapses to the cutoff width in ONE kernel
    with every intermediate level in VMEM (merkle_pallas.collapse_level;
    the per-level jnp fallback it replaces cost ~6-12 tiny dispatches that
    dominated small-blob commits). The prover uses device_levels_pruned
    (its decommit gathers need stored levels)."""
    from ..ops import merkle_pallas

    assert columns.shape[0] == 4
    n = columns.shape[1]
    block = merkle_pallas.BLOCK
    cut = max(1 << cutoff_log, 1)
    if not _use_pallas() or n % block != 0:
        return device_levels(columns, cutoff_log)[-1]
    if n % (8 * block) == 0:
        level = merkle_pallas.leaf3_level(columns, block)
        # Never fuse past the cutoff: device_levels stops at the first level
        # of width <= 2^cutoff_log (== exactly 2^cutoff_log for power-of-2
        # inputs), so an inner3 step is only valid while its output >= that.
        while level.shape[1] % (8 * block) == 0 and level.shape[1] // 8 >= cut:
            level = merkle_pallas.inner3_level(level, block)
    else:
        level = merkle_pallas.leaf_level(columns, block)
    # wide non-fusable remainder (large cutoff_log stops the fused loop
    # early): 2-at-a-time passes until the collapse fits in VMEM
    while level.shape[1] > max(cut, 8 * block) and (level.shape[1] // 2) % block == 0:
        level = merkle_pallas.inner_level(level, block)
    if level.shape[1] > cut:
        if level.shape[1] <= 8 * block:
            level = merkle_pallas.collapse_level(level, cut)
        else:  # unreachable for power-of-2 widths; keep a correct fallback
            from .blake2s import compress_rows

            while level.shape[1] > cut:
                half = level.shape[1] // 2
                msg = jnp.concatenate([level[:, :half], level[:, half:]], axis=0)
                level = compress_rows(msg)
    return level


def device_levels_pruned(columns: jnp.ndarray):
    """Pruned tree build for the PROVER's decommit gathers (VERDICT r4 item
    3): wide levels are hashed three at a time — on TPU via the fused Pallas
    kernels, so the two intermediate levels never touch HBM — and only every
    THIRD level is materialized. The decommit only ever gathers ~n_queries
    auth-path nodes per level, so the missing levels are recomputed at gather
    time from the stored level below (fri._auth_sibling_nodes): <= 4 node
    gathers + <= 3 tiny compressions per query per missing level. This cuts
    the prover's per-tree Merkle HBM traffic from ~2 full 2-at-a-time builds
    (~7 bytes/leaf-byte: one for the root, one re-build for the gathers) to
    the root-only commit path's ~1.1, and the resident tree storage from ~2N
    nodes to ~N/7.

    The 3-level grouping is decided by SHAPE ONLY (width % (8*BLOCK) == 0),
    not by backend, so the CPU test mesh exercises exactly the same stored-
    level structure and gather/recompute logic as the real TPU (computing the
    grouped levels with three jnp passes there).

    columns: (4, N) natural-order uint32. Returns a list of
    (level_index, (8, m) array) pairs, leaf level = 0, ending with the
    width-1 root level (level log2 N)."""
    from ..ops import merkle_pallas
    from .blake2s import compress_rows

    assert columns.shape[0] == 4
    n = columns.shape[1]
    pallas_ok = _use_pallas()
    block = merkle_pallas.BLOCK

    def one_level(level):
        half = level.shape[1] // 2
        if pallas_ok and half % block == 0:
            return merkle_pallas.inner_level(level, block)
        msg = jnp.concatenate([level[:, :half], level[:, half:]], axis=0)
        return compress_rows(msg)

    def leaf_once(cols):
        if pallas_ok and cols.shape[1] % block == 0:
            return merkle_pallas.leaf_level(cols, block)
        msg = jnp.concatenate(
            [cols, jnp.zeros((12, cols.shape[1]), jnp.uint32)], axis=0
        )
        return compress_rows(msg)

    stored = []
    lev = 0
    if n % (8 * block) == 0:
        if pallas_ok:
            level = merkle_pallas.leaf3_level(columns, block)
        else:
            # leaf hash (level 0, width N) + three pair-combines -> level 3
            level = one_level(one_level(one_level(leaf_once(columns))))
        lev = 3
        stored.append((lev, level))
        while level.shape[1] % (8 * block) == 0:
            if pallas_ok:
                level = merkle_pallas.inner3_level(level, block)
            else:
                level = one_level(one_level(one_level(level)))
            lev += 3
            stored.append((lev, level))
    else:
        level = leaf_once(columns)
        stored.append((0, level))
    # Narrow tail (below the fused-group width): still store only every
    # THIRD level, plus the width-1 root the transcript needs. The widths
    # are m/8^j (every third level down to width < 8), so together with the
    # fused region EVERY multiple-of-3 level of the tree is stored — which
    # is exactly the invariant fri._auth_sibling_nodes' base = 3*(k//3)
    # lookup relies on. Structure is shape-only; on TPU the whole tail is
    # ONE collapse kernel (all intermediates in VMEM), on other backends a
    # jnp loop computes the same stored set.
    m = level.shape[1]
    if m > 1:
        tail_widths = []
        w = m
        while w >= 8:
            w //= 8
            tail_widths.append(w)
        if not tail_widths or tail_widths[-1] != 1:
            tail_widths.append(1)
        if pallas_ok and m >= 128:
            outs = merkle_pallas.collapse_multi(level, tuple(tail_widths))
        else:
            outs = []
            cur = level
            for target in tail_widths:
                while cur.shape[1] > target:
                    cur = one_level(cur)
                outs.append(cur)
        for wdt, arr in zip(tail_widths, outs):
            stored.append((lev + (m // wdt).bit_length() - 1, arr))
    return stored


def host_levels_from(top: np.ndarray) -> list[np.ndarray]:
    """Finish the tree on host from the last device level ((8, m) uint32,
    natural order per level)."""
    levels = []
    level = top
    while level.shape[1] > 1:
        half = level.shape[1] // 2
        msg = np.concatenate([level[:, :half], level[:, half:]], axis=0)
        level = np_compress_batch(np.ascontiguousarray(msg))
        levels.append(level)
    return levels


class CommitTree:
    """Full Merkle tree: wide device levels + narrow host levels + root."""

    def __init__(self, dlevels, log_n_leaves: int):
        self.dlevels = dlevels
        self.log_n_leaves = log_n_leaves
        top = np.asarray(jax.device_get(dlevels[-1]))
        self.hlevels = host_levels_from(top)
        root_words = self.hlevels[-1][:, 0] if self.hlevels else top[:, 0]
        self.root = b"".join(int(w).to_bytes(4, "little") for w in root_words)

    @property
    def n_device_levels(self) -> int:
        return len(self.dlevels)

    def gather_nodes(self, level: int, stored_indices) -> list[bytes]:
        """Node hashes at a level (0 = leaves) by STORED (reference-order)
        node index; converts to the natural device layout internally."""
        if not stored_indices:
            return []
        log_m = self.log_n_leaves - level
        from .circle import bit_reverse_index

        nat = [bit_reverse_index(s, log_m) for s in stored_indices]
        if level < len(self.dlevels):
            idx = jnp.asarray(nat, jnp.int32)
            g = np.asarray(jax.device_get(self.dlevels[level][:, idx]))
        else:
            g = self.hlevels[level - len(self.dlevels)][:, nat]
        return [
            b"".join(int(g[w, j]).to_bytes(4, "little") for w in range(8))
            for j in range(len(stored_indices))
        ]


def build_tree(columns: jnp.ndarray) -> CommitTree:
    """Convenience non-fused build (the hot paths fuse device_levels into
    their own jitted pipelines and construct CommitTree from the result)."""
    log_n = int(columns.shape[1]).bit_length() - 1
    return CommitTree(_device_levels_jit(columns), log_n)


@jax.jit
def _device_levels_jit(columns):
    return device_levels(columns)


@dataclass
class MerkleDecommitment:
    """Hash witness for a multi-opening (counterpart of stwo's
    MerkleDecommitment.hash_witness; column values travel separately as the
    FRI layer's fri_witness — SURVEY.md B.4)."""

    hash_witness: list = field(default_factory=list)

    def to_dict(self):
        return {"hash_witness": [h.hex() for h in self.hash_witness]}

    @classmethod
    def from_dict(cls, d):
        return cls(hash_witness=[bytes.fromhex(h) for h in d["hash_witness"]])


def compress_rows_host(msgs: np.ndarray) -> np.ndarray:
    """(m, 16) uint32 messages -> (m, 8) zero-state compressions, batched
    through the native runtime (or the vectorized numpy spec kernel)."""
    nat = _native()
    msgs = np.ascontiguousarray(msgs, np.uint32)
    if nat is not None:
        return nat.raw_compress_batch(msgs)
    return np.ascontiguousarray(np_compress_batch(np.ascontiguousarray(msgs.T)).T)


def verify_openings_rows(
    root: bytes,
    log_n_leaves: int,
    idxs: list,
    rows: np.ndarray,
    hash_witness: list,
) -> bool:
    """Recompute the root from known leaf hashes + hash witness. Returns False
    on mismatch or malformed witness (never raises for bad proofs).

    idxs: sorted unique leaf indices; rows: matching (m, 8) uint32 hash words.
    Fully vectorized per level: pair grouping is numpy index math and hashing
    is ONE native call per level (the per-node Python walk + ctypes call it
    replaces dominated light-client verify time)."""
    try:  # single C-level join validates + packs in one pass
        joined = b"".join(hash_witness)
    except TypeError:
        return False
    if len(joined) != 32 * len(hash_witness):
        return False
    wit_rows = (
        np.frombuffer(joined, np.uint32).reshape(-1, 8)
        if joined
        else np.zeros((0, 8), np.uint32)
    )
    idxs = np.asarray(idxs, np.int64)
    nat = _native()
    if nat is not None:
        ok, got_root, consumed = nat.verify_openings(
            log_n_leaves, idxs, rows, wit_rows
        )
        return ok and consumed == wit_rows.shape[0] and got_root == root
    wi = 0
    for _ in range(log_n_leaves):
        if idxs.size == 0:
            break
        # sorted unique indices: element i starts a pair iff it is even and
        # the next element is its sibling (an odd element can only pair
        # backward, which the previous position already captured)
        is_start = np.zeros(idxs.size, bool)
        is_start[:-1] = (idxs[:-1] % 2 == 0) & (idxs[1:] == idxs[:-1] + 1)
        is_second = np.zeros(idxs.size, bool)
        is_second[1:] = is_start[:-1]
        lone = ~is_start & ~is_second
        n_lone = int(lone.sum())
        if wi + n_lone > wit_rows.shape[0]:
            return False
        keep = is_start | lone  # one output node per kept position, in order
        kidx = idxs[keep]
        krows = rows[keep]
        lone_k = lone[keep]
        lefts = krows.copy()
        rights = np.empty_like(krows)
        # paired: right = the following row; lone even: right = witness;
        # lone odd: left = witness, right = own row
        paired_k = ~lone_k
        pair_pos = np.flatnonzero(keep)[paired_k] + 1
        rights[paired_k] = rows[pair_pos]
        wslice = wit_rows[wi : wi + n_lone]
        wi += n_lone
        lone_even = lone_k & (kidx % 2 == 0)
        lone_odd = lone_k & (kidx % 2 == 1)
        rights[lone_even] = wslice[(kidx[lone_k] % 2 == 0).nonzero()[0]]
        lefts[lone_odd] = wslice[(kidx[lone_k] % 2 == 1).nonzero()[0]]
        rights[lone_odd] = krows[lone_odd]
        rows = compress_rows_host(np.concatenate([lefts, rights], axis=1))
        idxs = kidx >> 1
    if wi != wit_rows.shape[0]:  # leftover witness entries => malformed
        return False
    return idxs.size == 1 and int(idxs[0]) == 0 and rows[0].tobytes() == root


def verify_openings(
    root: bytes,
    log_n_leaves: int,
    leaf_hashes: dict,
    dec: MerkleDecommitment,
) -> bool:
    """Dict-of-bytes facade over verify_openings_rows (same semantics)."""
    items = sorted(leaf_hashes.items())
    if items:
        rows = np.stack([np.frombuffer(h, np.uint32) for _, h in items])
    else:
        rows = np.zeros((0, 8), np.uint32)
    return verify_openings_rows(
        root, log_n_leaves, [i for i, _ in items], rows, dec.hash_witness
    )


_NATIVE = False  # tri-state cache: False = unresolved, None = unavailable


def _native():
    """The C++ host runtime, or None (pure-Python spec fallback). The
    light-client verifier hashes thousands of nodes per proof; the Python
    spec compression costs ~200 us/node vs ~100 ns native. Resolved once —
    the import + availability probe used to run per hash call and dominated
    verify time."""
    global _NATIVE
    if _NATIVE is False:
        from .. import native

        _NATIVE = native if native.get_lib() else None
    return _NATIVE


def leaf_hash_host(column_values) -> bytes:
    """Host-side leaf hash: 4 column u32 values zero-padded to 16 words."""
    nat = _native()
    if nat is not None:
        msg = np.zeros((1, 16), np.uint32)
        msg[0, : len(column_values)] = [int(v) for v in column_values]
        return nat.raw_compress_batch(msg)[0].tobytes()
    m = [int(v) for v in column_values] + [0] * (16 - len(column_values))
    out = raw_compress(m)
    return b"".join(int(w).to_bytes(4, "little") for w in out)


def hash_pair(left: bytes, right: bytes) -> bytes:
    nat = _native()
    if nat is not None:
        return nat.hash_pair(left, right)
    m = [int.from_bytes(left[4 * i : 4 * i + 4], "little") for i in range(8)]
    m += [int.from_bytes(right[4 * i : 4 * i + 4], "little") for i in range(8)]
    out = raw_compress(m)
    return b"".join(int(w).to_bytes(4, "little") for w in out)
