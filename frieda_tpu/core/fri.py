"""FRI prover and verifier (device folds + host transcript orchestration).

TPU-native counterpart of stwo's FriProver/FriVerifier as driven by the
reference (/root/reference/src/proof.rs:28-101; SURVEY.md B.4 — structure is
firm from frieda's use-sites, details reconstructed and kept self-consistent
between this prover and verifier).

Transcript order (per proof):
  mix_u64(seed)? -> mix first-layer Merkle root -> draw alpha0
  per inner layer: mix root -> draw alpha
  mix_felts(last layer coefficients) -> grind + mix_u64(nonce)
  -> sample query positions in the full domain.

Folds (stwo convention, no division by 2; verifier mirrors):
  circle->line: g[k] = (f(p) + f(-p)) + alpha * (f(p) - f(-p)) / y_p,
                p at stored index 2k
  line:         g'[k] = (g(x) + g(-x)) + alpha * (g(x) - g(-x)) / x,
                x at stored index 2k; next domain x -> pi(x) = 2x^2 - 1.

The prover folds on device (uint32 QM31 component arrays); the verifier is
light-client-sized pure host Python (per-query twiddles from core/circle.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, PcsConfig
from ..spec import field as sf
from ..utils.packing import ceil_log2, polynomial_from_bytes
from . import circle as hostcircle
from . import merkle
from .channel import Blake2sChannel, sample_query_positions
from .field import qm31_add, qm31_mul, qm31_mul_m31, qm31_sub
from .grind import grind
from .proof import FriLayerProof, FriProof, Proof

P = sf.P


# ---------------------------------------------------------------------------
# Device folds
# ---------------------------------------------------------------------------

@jax.jit
def _fold_circle(evals, alpha, ys_inv):
    """evals (4, N) natural order -> (4, N/2): circle->line fold. Conjugate
    pairs (stored 2k, 2k+1) are the two array halves in natural layout."""
    half = evals.shape[1] // 2
    fp = tuple(evals[i, :half] for i in range(4))
    fm = tuple(evals[i, half:] for i in range(4))
    a = tuple(alpha[i] for i in range(4))
    f0 = qm31_add(fp, fm)
    f1 = qm31_mul_m31(qm31_sub(fp, fm), ys_inv)
    return jnp.stack(qm31_add(f0, qm31_mul(a, f1)))


@jax.jit
def _fold_line(evals, alpha, xs_inv):
    """evals (4, M) natural order -> (4, M/2): line fold over ±x halves."""
    half = evals.shape[1] // 2
    g0 = tuple(evals[i, :half] for i in range(4))
    g1 = tuple(evals[i, half:] for i in range(4))
    a = tuple(alpha[i] for i in range(4))
    f0 = qm31_add(g0, g1)
    f1 = qm31_mul_m31(qm31_sub(g0, g1), xs_inv)
    return jnp.stack(qm31_add(f0, qm31_mul(a, f1)))


def _build_tree(cols, log_len: int) -> merkle.CommitTree:
    return merkle.CommitTree(merkle._device_levels_jit(cols), log_len)


# ---------------------------------------------------------------------------
# Pair grouping / witness planning (host index math, value-independent)
# ---------------------------------------------------------------------------

def _pair_groups(positions):
    """positions: sorted unique. Yields (pair_index, pos_in_set, lone) where
    lone is None if both elements of the pair are in the set, else the lone
    position present."""
    i = 0
    while i < len(positions):
        p = positions[i]
        if p % 2 == 0 and i + 1 < len(positions) and positions[i + 1] == p + 1:
            yield (p >> 1, (p, p + 1), None)
            i += 2
        else:
            yield (p >> 1, (p,), p)
            i += 1


def _sibling_indices(positions):
    """Witness value indices: sibling of every lone position, encounter order."""
    return [p ^ 1 for _, _, p in _pair_groups(positions) if p is not None]


def _all_leaf_indices(positions):
    out = []
    for k, _, _ in _pair_groups(positions):
        out.extend((2 * k, 2 * k + 1))
    return out


def _merkle_witness_plans(log_n: int, known_leaves):
    """Per-level sibling-hash indices needed for a multi-opening, walking
    bottom-up exactly like merkle.verify_openings."""
    plans = []
    known = list(known_leaves)
    for _ in range(log_n):
        sibs = []
        nxt = []
        i = 0
        while i < len(known):
            idx = known[i]
            if i + 1 < len(known) and known[i + 1] == (idx ^ 1):
                i += 2
            else:
                sibs.append(idx ^ 1)
                i += 1
            nxt.append(idx >> 1)
        plans.append(sibs)
        known = nxt
    return plans


def _gather_qm31(arr, stored_indices, log_len: int) -> list:
    """arr (4, 2^log_len) device, NATURAL layout; stored_indices are
    reference-order positions -> list of QM31 tuples."""
    if not stored_indices:
        return []
    nat = [hostcircle.bit_reverse_index(s, log_len) for s in stored_indices]
    g = np.asarray(jax.device_get(arr[:, jnp.asarray(nat, jnp.int32)]))
    return [tuple(int(g[c, j]) for c in range(4)) for j in range(len(stored_indices))]


def _layer_decommit(arr, tree: merkle.CommitTree, positions, log_len: int) -> FriLayerProof:
    fri_witness = _gather_qm31(arr, _sibling_indices(positions), log_len)
    leaves = _all_leaf_indices(positions)
    plans = _merkle_witness_plans(log_len, leaves)
    hashes = []
    for lvl, sibs in enumerate(plans):
        hashes.extend(tree.gather_nodes(lvl, sibs))
    return FriLayerProof(
        fri_witness=fri_witness,
        decommitment=merkle.MerkleDecommitment(hashes),
        commitment=tree.root,
    )


# ---------------------------------------------------------------------------
# Last-layer line interpolation / evaluation (host, tiny)
# ---------------------------------------------------------------------------

_INV2 = (P + 1) // 2


def _ifft_line(vals, tw: hostcircle.Twiddles, depth: int):
    """Exact inverse of the line-FFT stages: QM31 values in NATURAL order on
    line layer `depth` (±x pairs = halves) -> natural-order coefficients
    (basis bit k <-> pi^k(x))."""
    if len(vals) == 1:
        return [vals[0]]
    half = len(vals) // 2
    x_inv = tw.xs_layers_inv[depth]  # inverses of L_depth[:half]
    g0, g1 = [], []
    for t in range(half):
        v0, v1 = vals[t], vals[t + half]
        s = sf.qm31_mul_m31(sf.qm31_add(v0, v1), _INV2)
        d = sf.qm31_mul_m31(
            sf.qm31_mul_m31(sf.qm31_sub(v0, v1), _INV2), int(x_inv[t])
        )
        g0.append(s)
        g1.append(d)
    c0 = _ifft_line(g0, tw, depth + 1)
    c1 = _ifft_line(g1, tw, depth + 1)
    out = []
    for a, b in zip(c0, c1):
        out.extend((a, b))
    return out


def _eval_line_poly(coeffs, x: int):
    """Evaluate a line poly (natural order, basis bit k <-> pi^k(x)) at x."""
    acc = sf.QM31_ZERO
    # Horner over the pi-basis: process coefficients most-significant-bit-first.
    n = len(coeffs)
    if n == 1:
        return coeffs[0]
    log_n = (n - 1).bit_length()
    # basis values pi^k(x)
    basis = [x]
    for _ in range(log_n - 1):
        basis.append(hostcircle_pi(basis[-1]))
    for i, c in enumerate(coeffs):
        term = c
        for k in range(log_n):
            if (i >> k) & 1:
                term = sf.qm31_mul_m31(term, basis[k])
        acc = sf.qm31_add(acc, term)
    return acc


def hostcircle_pi(x: int) -> int:
    return (2 * x * x - 1) % P


def _line_x_at(n: int, layer: int, j: int) -> int:
    """X_layer[j]: x-twiddle of line layer `layer` (full domain log size n)
    at stored index j. X_0[j] = x(stored point 2j); X_l[j] = pi^l(X_0[j<<l])."""
    x, _ = hostcircle.domain_point_at_stored_index(n, 2 * (j << layer))
    for _ in range(layer):
        x = hostcircle_pi(x)
    return x


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

def commit_and_generate_proof(data: bytes, seed, pcs_config: PcsConfig = DEFAULT_CONFIG):
    """Returns (commitment_bytes, Proof). Reference: src/proof.rs:32-77."""
    from ..api import commit_with_tree  # lazy: api imports this module lazily too

    fri_cfg = pcs_config.fri_config
    coeffs_shape = polynomial_from_bytes(data)
    log_size = ceil_log2(coeffs_shape.shape[1])
    n = log_size + fri_cfg.log_blowup_factor
    last_log = fri_cfg.log_last_layer_degree_bound + fri_cfg.log_blowup_factor
    n_inner = n - 1 - last_log
    if n_inner < 0:
        raise ValueError(
            f"config unsatisfiable: log_last_layer_degree_bound "
            f"{fri_cfg.log_last_layer_degree_bound} >= poly log size {log_size}"
        )

    channel = Blake2sChannel()
    if seed is not None:
        channel.mix_u64(seed)

    root, evals, first_tree, _ = commit_with_tree(data, fri_cfg.log_blowup_factor)
    channel.mix_digest(root)
    alpha = channel.draw_felt()

    tw = hostcircle.get_twiddles(n)
    g = _fold_circle(evals, jnp.asarray(alpha, jnp.uint32), jnp.asarray(tw.ys_inv))

    inner_layers_state = []  # (array, tree)
    for l in range(n_inner):
        tree_l = _build_tree(g, n - 1 - l)
        channel.mix_digest(tree_l.root)
        alpha_l = channel.draw_felt()
        inner_layers_state.append((g, tree_l))
        g = _fold_line(
            g, jnp.asarray(alpha_l, jnp.uint32), jnp.asarray(tw.xs_layers_inv[l])
        )

    # Last layer: interpolate (natural order), check degree, truncate, mix.
    last_arr = np.asarray(jax.device_get(g))
    last_vals = [tuple(int(last_arr[c, j]) for c in range(4)) for j in range(last_arr.shape[1])]
    # (last_arr is already in the natural order _ifft_line consumes)
    coeffs_last = _ifft_line(last_vals, tw, n_inner)
    bound = 1 << fri_cfg.log_last_layer_degree_bound
    if any(c != sf.QM31_ZERO for c in coeffs_last[bound:]):
        raise AssertionError("FRI last layer exceeds degree bound (internal bug)")
    last_layer_poly = coeffs_last[:bound]
    channel.mix_felts(last_layer_poly)

    # Proof of work + query sampling.
    nonce = grind(channel, pcs_config.pow_bits)
    channel.mix_u64(nonce)
    queries = sample_query_positions(channel, n, fri_cfg.n_queries)

    # Queried evaluations (the DAS payload; src/proof.rs:63-66).
    evaluations = _gather_qm31(evals, queries, n)

    # Decommitments.
    first_layer = _layer_decommit(evals, first_tree, queries, n)
    pos = sorted({q >> 1 for q in queries})
    inner_layers = []
    for l, (arr, tree_l) in enumerate(inner_layers_state):
        inner_layers.append(_layer_decommit(arr, tree_l, pos, n - 1 - l))
        pos = sorted({p >> 1 for p in pos})

    proof = Proof(
        proof=FriProof(first_layer, inner_layers, last_layer_poly),
        proof_of_work=nonce,
        pcs_config=pcs_config,
        log_size_bound=log_size,
        evaluations=evaluations,
    )
    return root, proof


# ---------------------------------------------------------------------------
# Verifier (host-only, light-client-sized)
# ---------------------------------------------------------------------------

def _verify_layer_merkle(root, log_len, positions, values, fri_witness_iter, dec):
    """Group pairs, fill sibling values from the witness, check the Merkle
    multi-opening. Returns dict of complete pair values {pair_idx: (v_even,
    v_odd)} or None on failure."""
    pair_values = {}
    leaf_hashes = {}
    for k, present, lone in _pair_groups(positions):
        if lone is None:
            v0, v1 = values[present[0]], values[present[1]]
        else:
            try:
                sib_val = next(fri_witness_iter)
            except StopIteration:
                return None
            if lone % 2 == 0:
                v0, v1 = values[lone], sib_val
            else:
                v0, v1 = sib_val, values[lone]
        pair_values[k] = (v0, v1)
        leaf_hashes[2 * k] = merkle.leaf_hash_host(v0)
        leaf_hashes[2 * k + 1] = merkle.leaf_hash_host(v1)
    if not merkle.verify_openings(root, log_len, leaf_hashes, dec):
        return None
    return pair_values


def verify_proof(proof: Proof, seed) -> bool:
    """Replay the transcript and check every decommitment/fold. Returns False
    for invalid proofs; raises (reference panic-parity, src/proof.rs:166-173)
    when `evaluations` is shorter than the sampled query set."""
    cfg = proof.pcs_config
    fri_cfg = cfg.fri_config
    log_size = proof.log_size_bound
    n = log_size + fri_cfg.log_blowup_factor
    last_log = fri_cfg.log_last_layer_degree_bound + fri_cfg.log_blowup_factor
    n_inner = n - 1 - last_log
    # --- FriVerifier::commit equivalent: shape checks + transcript replay ---
    if n_inner < 0:
        return False
    if len(proof.proof.inner_layers) != n_inner:
        return False
    if len(proof.proof.last_layer_poly) != (1 << fri_cfg.log_last_layer_degree_bound):
        return False
    if any(
        not (isinstance(c, tuple) and len(c) == 4 and all(0 <= int(v) < P for v in c))
        for c in proof.proof.last_layer_poly
    ):
        return False

    channel = Blake2sChannel()
    if seed is not None:
        channel.mix_u64(seed)
    channel.mix_digest(proof.proof.first_layer.commitment)
    alpha0 = channel.draw_felt()
    alphas = []
    for layer in proof.proof.inner_layers:
        channel.mix_digest(layer.commitment)
        alphas.append(channel.draw_felt())
    channel.mix_felts(proof.proof.last_layer_poly)

    channel.mix_u64(proof.proof_of_work)
    if channel.trailing_zeros() < cfg.pow_bits:
        return False
    queries = sample_query_positions(channel, n, fri_cfg.n_queries)

    # Deliberate reference quirk: missing evaluations panic, extras are invalid.
    values = {q: proof.evaluations[i] for i, q in enumerate(queries)}
    if len(proof.evaluations) > len(queries):
        return False
    if any(
        not (isinstance(v, tuple) and len(v) == 4 and all(0 <= int(c) < P for c in v))
        for v in values.values()
    ):
        return False

    # --- first layer: Merkle + circle->line fold ---
    wit = iter(proof.proof.first_layer.fri_witness)
    pair_values = _verify_layer_merkle(
        proof.proof.first_layer.commitment, n, queries, values, wit,
        proof.proof.first_layer.decommitment,
    )
    if pair_values is None or any(True for _ in wit):
        return False
    folded = {}
    for k, (vp, vm) in pair_values.items():
        _, y = hostcircle.domain_point_at_stored_index(n, 2 * k)
        y_inv = sf.m31_inv(y)
        f0 = sf.qm31_add(vp, vm)
        f1 = sf.qm31_mul_m31(sf.qm31_sub(vp, vm), y_inv)
        folded[k] = sf.qm31_add(f0, sf.qm31_mul(alpha0, f1))

    # --- inner layers: Merkle + line folds ---
    for l, layer in enumerate(proof.proof.inner_layers):
        positions = sorted(folded)
        wit = iter(layer.fri_witness)
        pair_values = _verify_layer_merkle(
            layer.commitment, n - 1 - l, positions, folded, wit, layer.decommitment
        )
        if pair_values is None or any(True for _ in wit):
            return False
        nxt = {}
        for k, (v0, v1) in pair_values.items():
            x = _line_x_at(n, l, 2 * k)
            f0 = sf.qm31_add(v0, v1)
            f1 = sf.qm31_mul_m31(sf.qm31_sub(v0, v1), sf.m31_inv(x))
            nxt[k] = sf.qm31_add(f0, sf.qm31_mul(alphas[l], f1))
        folded = nxt

    # --- last layer: evaluate the claimed polynomial ---
    for p, v in folded.items():
        x = _line_x_at(n, n_inner, p)
        if _eval_line_poly(proof.proof.last_layer_poly, x) != v:
            return False
    return True
