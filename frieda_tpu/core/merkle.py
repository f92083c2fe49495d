"""Merkle commitment over evaluation columns (device hashing + host openings).

TPU-native equivalent of stwo's vcs MerkleProver/MerkleVerifier as used by the
reference (/root/reference/src/commit.rs:17-21, src/proof.rs:14; spec:
SURVEY.md A.6, golden-verified):

  leaf i   = raw_compress(0, [c0[i], c1[i], c2[i], c3[i], 0 x 12])
  inner    = raw_compress(0, left(8 words) || right(8 words))
  root     = top node, serialized as 8 little-endian u32 words.

Tree construction is a fully unrolled device pass (one compress_batch per
level). Multi-openings ("decommitments") are generated and verified host-side
from the level tables — the verifier is light-client-sized, the prover only
pays one device->host transfer of the queried paths.

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

from .blake2s import compress_batch


def tree_levels(columns: jnp.ndarray) -> list[list[jnp.ndarray]]:
    """Build all hash levels on device. columns: (4, N) uint32 (stored order).
    Returns levels leaves-first; each level is a list of 8 uint32 (n,) arrays.
    """
    assert columns.shape[0] == 4
    n = columns.shape[1]
    zero = jnp.zeros((n,), jnp.uint32)
    msg = [columns[i] for i in range(4)] + [zero] * 12
    level = compress_batch(msg)
    levels = [level]
    while level[0].shape[0] > 1:
        msg = [w[0::2] for w in level] + [w[1::2] for w in level]
        level = compress_batch(msg)
        levels.append(level)
    return levels


def root_words(levels) -> jnp.ndarray:
    return jnp.stack([w[0] for w in levels[-1]])


def root_to_bytes(words: np.ndarray) -> bytes:
    return b"".join(int(w).to_bytes(4, "little") for w in np.asarray(words))


def levels_to_host(levels) -> list[np.ndarray]:
    """Device levels -> list of (8, n) numpy arrays."""
    flat = jax.device_get(levels)
    return [np.stack(lv) for lv in flat]


@dataclass
class MerkleDecommitment:
    """Hash witness for a multi-opening (counterpart of stwo's
    MerkleDecommitment.hash_witness; column values travel separately as the
    FRI layer's fri_witness — SURVEY.md B.4)."""

    hash_witness: list[bytes] = field(default_factory=list)

    def to_dict(self):
        return {"hash_witness": [h.hex() for h in self.hash_witness]}

    @classmethod
    def from_dict(cls, d):
        return cls(hash_witness=[bytes.fromhex(h) for h in d["hash_witness"]])


def _node_bytes(level: np.ndarray, idx: int) -> bytes:
    return b"".join(int(w).to_bytes(4, "little") for w in level[:, idx])


def prove_openings(host_levels: list[np.ndarray], leaf_indices) -> MerkleDecommitment:
    """Generate the hash witness for the sorted, deduped set of leaf indices,
    assuming the verifier knows the leaf *values* at exactly those indices."""
    known = sorted(set(int(i) for i in leaf_indices))
    dec = MerkleDecommitment()
    for level in host_levels[:-1]:
        next_known = []
        i = 0
        while i < len(known):
            idx = known[i]
            sib = idx ^ 1
            if i + 1 < len(known) and known[i + 1] == sib:
                i += 2
            else:
                dec.hash_witness.append(_node_bytes(level, sib))
                i += 1
            next_known.append(idx >> 1)
        known = next_known
    return dec


def verify_openings(
    root: bytes,
    log_n_leaves: int,
    leaf_hashes: dict[int, bytes],
    dec: MerkleDecommitment,
) -> bool:
    """Recompute the root from known leaf hashes + hash witness. Returns False
    on mismatch or malformed witness (never raises for bad proofs)."""
    known = dict(sorted(leaf_hashes.items()))
    wit = iter(dec.hash_witness)
    try:
        for _ in range(log_n_leaves):
            nxt: dict[int, bytes] = {}
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
                    left, right = (
                        (known[idx], sib_hash) if idx % 2 == 0 else (sib_hash, known[idx])
                    )
                    i += 1
                nxt[idx >> 1] = _hash_pair(left, right)
            known = nxt
    except StopIteration:
        return False
    if any(True for _ in wit):  # leftover witness entries => malformed
        return False
    return known.get(0) == root


def leaf_hash_host(column_values) -> bytes:
    """Host-side leaf hash: 4 column u32 values zero-padded to 16 words."""
    from ..spec.blake2s import raw_compress

    m = [int(v) for v in column_values] + [0] * (16 - len(column_values))
    out = raw_compress(m)
    return b"".join(int(w).to_bytes(4, "little") for w in out)


def _hash_pair(left: bytes, right: bytes) -> bytes:
    from ..spec.blake2s import raw_compress

    m = [int.from_bytes(left[4 * i : 4 * i + 4], "little") for i in range(8)]
    m += [int.from_bytes(right[4 * i : 4 * i + 4], "little") for i in range(8)]
    out = raw_compress(m)
    return b"".join(int(w).to_bytes(4, "little") for w in out)
