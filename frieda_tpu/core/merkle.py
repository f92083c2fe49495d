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


def verify_openings(
    root: bytes,
    log_n_leaves: int,
    leaf_hashes: dict,
    dec: MerkleDecommitment,
) -> bool:
    """Recompute the root from known leaf hashes + hash witness. Returns False
    on mismatch or malformed witness (never raises for bad proofs)."""
    known = dict(sorted(leaf_hashes.items()))
    wit = iter(dec.hash_witness)
    try:
        for _ in range(log_n_leaves):
            nxt = {}
            idxs = sorted(known)
            i = 0
            while i < len(idxs):
                idx = idxs[i]
                sib = idx ^ 1
                if i + 1 < len(idxs) and idxs[i + 1] == sib:
                    left, right = known[idx], known[sib]
                    i += 2
                else:
                    sib_hash = next(wit)
                    if not isinstance(sib_hash, bytes) or len(sib_hash) != 32:
                        return False
                    left, right = (
                        (known[idx], sib_hash) if idx % 2 == 0 else (sib_hash, known[idx])
                    )
                    i += 1
                nxt[idx >> 1] = hash_pair(left, right)
            known = nxt
    except StopIteration:
        return False
    if any(True for _ in wit):  # leftover witness entries => malformed
        return False
    return known.get(0) == root


def _native():
    """The C++ host runtime, or None (pure-Python spec fallback). The
    light-client verifier hashes thousands of nodes per proof; the Python
    spec compression costs ~200 us/node vs ~100 ns native."""
    from .. import native

    return native.get_lib() and native


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
