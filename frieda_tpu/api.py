"""Public API: commit / generate_proof / verify.

TPU-native counterpart of the reference facade
/root/reference/src/lib.rs:22-44 (frieda::api). Same three operations, same
behavioral quirks (documented in SURVEY.md §3.3-3.4):
  * `verify` never receives the Commitment — binding requires the caller to
    compare proof.first_layer_commitment against it, exactly as in the
    reference.
  * empty input commits to the zero polynomial of log size 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import DEFAULT_CONFIG, PcsConfig  # noqa: F401  (re-export)
from .core import fft, merkle
from .utils.packing import device_ingest_rev, log_total_for, pad_to_words

Commitment = bytes  # 32-byte Merkle root ([u8; 32] in the reference)


@functools.partial(jax.jit, static_argnums=(2,))
def _commit_pipeline(words, twiddles, log_total):
    """Raw uint32 words (pad_to_words) -> (evals (4, 2^n), wide merkle
    levels). Byte->felt unpack + coefficient bit-reversal fuse into one
    gather (device_ingest_rev); LDE and hashing are ONE dispatch; the host
    uploads bytes, not felts."""
    evals = fft.evaluate_auto(device_ingest_rev(words, log_total - 2), twiddles)
    dlevels = merkle.device_levels(evals)
    return evals, dlevels


def _commit_root_impl(words, twiddles, log_total):
    evals = fft.evaluate_auto(device_ingest_rev(words, log_total - 2), twiddles)
    return merkle.device_root_level(evals)


@functools.partial(jax.jit, static_argnums=(2,))
def _commit_root_pipeline(words, twiddles, log_total):
    """Raw uint32 words -> (8, <=2^HOST_CUTOFF_LOG) top device level. One
    dispatch + one small fetch (<= 2 KB, still a single round trip); the last
    ~HOST_CUTOFF_LOG narrow tree levels are pure dispatch/compile overhead on
    TPU, so they finish on host via the native runtime (merkle.py:35).
    Root-only: wide levels use the fused 3-level kernels (no intermediate
    level ever hits HBM — merkle.device_root_level)."""
    return _commit_root_impl(words, twiddles, log_total)


@functools.partial(jax.jit, static_argnums=(2,))
def _commit_root_pipeline_batch(words_batch, twiddles, log_total):
    """vmapped _commit_root_pipeline over a leading blob axis: ONE dispatch
    commits a whole batch of equal-sized blobs. Small blobs are launch-bound,
    not compute-bound (a 2^16-felt commit is ~0.3 ms of device work behind
    ~3 ms of per-dispatch overhead on a remote-attached chip), so batching is
    how a many-small-blob DAS ingest pipeline reaches device speed-of-light;
    vmap lifts the Pallas kernels by prepending a batch grid dimension."""
    return jax.vmap(lambda w: _commit_root_impl(w, twiddles, log_total))(words_batch)


def commit_many(datas, log_blowup_factor: int) -> list:
    """Commit a batch of EQUAL-SIZED blobs in one device dispatch + one
    fetch; returns a list of 32-byte roots, each bit-exact with
    commit(data, log_blowup_factor). For the many-small-blob serving shape
    (DAS samples) this amortizes the per-dispatch launch overhead that
    dominates sub-2^18 commits."""
    datas = list(datas)
    if not datas:
        return []
    log_total = log_total_for(len(datas[0]))
    if any(log_total_for(len(d)) != log_total for d in datas):
        raise ValueError("commit_many requires equal padded sizes")
    n = log_total - 2 + log_blowup_factor
    twiddles = fft.stage_twiddles(n)
    words = np.stack([pad_to_words(d, log_total) for d in datas])
    tops = jax.device_get(
        _commit_root_pipeline_batch(jnp.asarray(words), twiddles, log_total)
    )
    return [_finish_root(np.asarray(t)) for t in tops]


def _finish_root(top_words) -> bytes:
    """(8, m) device-level fetch -> 32-byte root (host top levels)."""
    top = np.asarray(top_words)
    if top.shape[1] > 1:
        top = merkle.host_levels_from(top)[-1]
    return b"".join(int(w).to_bytes(4, "little") for w in top[:, 0])


def commit_with_tree(data: bytes, log_blowup_factor: int):
    """Full commit pipeline; returns (root_bytes, evals, CommitTree,
    log_domain_size). Shared by the FRI prover (the FRI first layer *is* the
    commitment — src/proof.rs:126-135)."""
    log_total = log_total_for(len(data))
    log_size = log_total - 2
    n = log_size + log_blowup_factor
    twiddles = fft.stage_twiddles(n)
    evals, dlevels = _commit_pipeline(
        jnp.asarray(pad_to_words(data, log_total)), twiddles, log_total
    )
    tree = merkle.CommitTree(dlevels, n)
    return tree.root, evals, tree, n


def commit(data: bytes, log_blowup_factor: int) -> Commitment:
    """Commit to a data blob (reference: src/commit.rs:11-22)."""
    from .utils.profiling import span

    with span("commit/ingest"):
        words = pad_to_words(data, log_total_for(len(data)))  # one memcpy
        log_total = log_total_for(len(data))
        n = log_total - 2 + log_blowup_factor
        twiddles = fft.stage_twiddles(n)
    with span("commit/device(unpack+lde+merkle)"):
        top = jax.device_get(
            _commit_root_pipeline(jnp.asarray(words), twiddles, log_total)
        )
    with span("commit/host_tree_top"):
        return _finish_root(top)


def generate_proof(data: bytes, seed, pcs_config: PcsConfig = DEFAULT_CONFIG):
    """Generate a FRIDA DAS proof (reference: src/proof.rs:28-77).
    seed: Optional[int] mixed into the Fiat-Shamir channel."""
    from .core.fri import commit_and_generate_proof

    _, proof = commit_and_generate_proof(data, seed, pcs_config)
    return proof


def commit_and_prove(data: bytes, seed, pcs_config: PcsConfig = DEFAULT_CONFIG):
    """Returns (commitment, proof) — reference commit_and_generate_proof."""
    from .core.fri import commit_and_generate_proof

    return commit_and_generate_proof(data, seed, pcs_config)


def prove_many(datas, seeds, pcs_config: PcsConfig = DEFAULT_CONFIG):
    """Pipelined batch proving: all commit phases are dispatched before any
    proof is finished, overlapping uploads and device compute across blobs.
    Returns a list of (commitment, Proof) in input order."""
    from .core.fri import prove_many as _pm

    return _pm(datas, seeds, pcs_config)


def verify(proof, seed) -> bool:
    """Verify a proof under the sampling seed (reference: src/proof.rs:79-101).
    NB: deliberately does not take the Commitment (reference API quirk) —
    compare proof.first_layer_commitment yourself for binding."""
    from .core.fri import verify_proof

    return verify_proof(proof, seed)


def verify_many(proofs, seeds) -> list:
    """Batch verification: semantically [verify(p, s) for ...] but several
    times faster for same-shaped batches — the DAS light-client's natural
    workload is many cheap samples, so the per-proof Python/native overhead
    is amortized by walking all proofs' FRI layers together on concatenated
    arrays (core/fri.verify_many)."""
    from .core.fri import verify_many as _vm

    return _vm(proofs, seeds)
