"""FRI prover and verifier.

TPU-native counterpart of stwo's FriProver/FriVerifier as driven by the
reference (/root/reference/src/proof.rs:28-101; SURVEY.md B.4 — structure is
firm from frieda's use-sites, details reconstructed and kept self-consistent
between this prover and verifier).

Transcript order (per proof):
  mix_u64(seed)? -> mix first-layer Merkle root -> draw alpha0
  per inner layer: mix root -> draw alpha
  mix_felts(last layer coefficients) -> grind + mix_u64(nonce)
  -> sample query positions in the full domain.

Folds (stwo convention, no division by 2; verifier mirrors), in stored-index
terms — on device the pairs are array halves (natural layout, core/circle.py):
  circle->line: g[k] = (f(p) + f(-p)) + alpha * (f(p) - f(-p)) / y_p,
                p at stored index 2k
  line:         g'[k] = (g(x) + g(-x)) + alpha * (g(x) - g(-x)) / x,
                x at stored index 2k; next domain x -> pi(x) = 2x^2 - 1.

Architecture: the ENTIRE commit phase — low-degree extension, every Merkle
tree, the sequential Fiat-Shamir transcript (core/device_channel.py), all
folds, the last-layer interpolation, the PoW grind and the query draws — runs
as ONE jitted device dispatch; the host only dedups queries and assembles the
proof from one batched decommitment gather. This matters because each
host<->device round-trip costs milliseconds on remote-attached TPUs, and the
transcript serializes the layers. The verifier is light-client-sized pure
host Python (per-query twiddles from core/circle.py).
"""

from __future__ import annotations

import functools

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
from .proof import FriLayerProof, FriProof, Proof

P = sf.P


# ---------------------------------------------------------------------------
# Device folds
# ---------------------------------------------------------------------------

def _dbitrev(x, bits: int):
    """Bit-reverse of dynamic uint32 values over `bits` (static) bits —
    converts stored (reference) indices to the natural device layout
    (core/circle.py) inside a trace."""
    r = jnp.zeros_like(x)
    for i in range(bits):
        r = r | (((x >> i) & jnp.uint32(1)) << (bits - 1 - i))
    return r


_INV2_M31 = (P + 1) // 2


def _auth_sibling_nodes(stored: dict, cols, log_leaves: int, pos, k: int):
    """(8, nq) hash words of the level-`k` auth-path nodes (the sibling of
    each raw query's ancestor) for a PRUNED tree (merkle.device_levels_pruned).

    stored: {level: (8, m) natural-order hash array}; cols: the (4, N) leaf
    columns; pos: (nq,) uint32 query positions in STORED leaf order. Levels
    missing from `stored` (the two intermediates of each fused 3-level group)
    are recomputed from the nearest stored level below — or from the leaf
    columns for levels 0..2 — by gathering the <= 2^r base nodes of each
    needed subtree and compressing up: per query that is <= 4 gathered nodes
    and <= 3 compressions, vs materializing the whole level to HBM."""
    from .blake2s import compress_rows

    sidx = (pos >> jnp.uint32(k)) ^ jnp.uint32(1)
    if k in stored:
        return stored[k][:, _dbitrev(sidx, log_leaves - k)]
    nq = pos.shape[0]
    base = 3 * (k // 3)
    if base == 0 or base not in stored:
        # rebuild from the leaf columns: r levels above the leaves. Only
        # levels 1-2 of a fused tree land here — device_levels_pruned stores
        # EVERY multiple-of-3 level, so any k >= 3 has its base below it (a
        # <= 4-node rebuild); a 2^k-node rebuild from the leaves would be a
        # structural bug, not a fallback.
        assert k <= 2, (k, sorted(stored))
        r = k
        u = jnp.arange(1 << r, dtype=jnp.uint32)
        leaf_idx = (sidx[:, None] << jnp.uint32(r)) | u[None, :]
        nat = _dbitrev(leaf_idx.reshape(-1), log_leaves)
        vals = cols[:, nat]  # (4, nq * 2^r)
        msg = jnp.concatenate(
            [vals, jnp.zeros((12, vals.shape[1]), jnp.uint32)], axis=0
        )
        h = compress_rows(msg)
    else:
        r = k - base
        u = jnp.arange(1 << r, dtype=jnp.uint32)
        child_idx = (sidx[:, None] << jnp.uint32(r)) | u[None, :]
        nat = _dbitrev(child_idx.reshape(-1), log_leaves - base)
        h = stored[base][:, nat]  # (8, nq * 2^r)
    # combine stored-order sibling pairs upward r times: parent = H(2s, 2s+1)
    h = h.reshape(8, nq, 1 << r)
    for _ in range(r):
        left = h[:, :, 0::2].reshape(8, -1)
        right = h[:, :, 1::2].reshape(8, -1)
        h = compress_rows(jnp.concatenate([left, right], axis=0))
        h = h.reshape(8, nq, -1)
    return h[:, :, 0]


def _device_ifft_line(comps, xs_invs, depth: int):
    """Device last-layer interpolation: natural-order QM31 components
    (4-tuple of (M,) arrays) -> (M, 4) natural-order coefficients. Exact
    inverse of the line-FFT stages.

    Iterative and vectorized: level d processes all 2^d sub-problems at once
    as a (4, 2^d, M/2^d) array, so the trace is O(log M) ops — the recursive
    form stacked O(M) leaves and stopped compiling near the config ceiling
    (log_last_layer_degree_bound + log_blowup ~ 2^26 unrolled ops).

    Output index bit k is the s(0)/d(1) branch choice at level depth+k, and
    branch results are appended along the block axis, so block index r holds
    output index r after all log M levels."""
    from .field import qm31_add as ja, qm31_mul_m31 as jm, qm31_sub as js

    m = comps[0].shape[0]
    log_m = m.bit_length() - 1
    inv2 = jnp.uint32(_INV2_M31)
    x = tuple(c.reshape(1, m) for c in comps)  # (blocks, block_len)
    for d in range(log_m):
        blk = x[0].shape[1]
        half = blk // 2
        v0 = tuple(c[:, :half] for c in x)
        v1 = tuple(c[:, half:] for c in x)
        s = jm(ja(v0, v1), inv2)
        dd = jm(jm(js(v0, v1), inv2), xs_invs[depth + d][:half][None, :])
        # s -> output bit d = 0, dd -> output bit d = 1; concatenating along
        # the block axis keeps block index == little-endian branch bits.
        x = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(s, dd))
    return jnp.stack([c[:, 0] for c in x], axis=1)  # (M, 4)


@functools.lru_cache(maxsize=8)
def _fri_commit_fn(log_size: int, log_blowup: int, llb: int, n_queries: int,
                   pow_bits: int, has_seed: bool, mesh=None,
                   batched: bool = False, device_ingest: bool = False):
    """Build + jit the single-dispatch FRI commit phase for one config.
    Returns (fn, tables): call fn(coeffs, perm, seed_lo, seed_hi, *tables).
    The twiddle/fold tables ride as RUNTIME arguments — closed-over device
    arrays would be staged as HLO constants, whose size (3 x 2^(n-1) words)
    breaks the remote AOT compile at n >= 24.

    With `mesh` (a jax.sharding.Mesh with an "elem" axis) the SAME program is
    compiled SPMD: every layer keeps its element axis sharded over the mesh
    while it is wide enough, XLA inserts the collectives for the FFT stages /
    Merkle tops / folds whose stride crosses the shard boundary, and the
    (tiny, replicated) device channel serializes the transcript exactly as on
    one chip — so the sharded proof is bit-identical to the single-chip one
    (tests/test_sharding.py). Single-blob sharded dispatches route the LDE
    through the shard_map fused path (parallel/fft_sharded.py: local fused
    Pallas passes + ppermute for the cross-shard stages); batched (vmapped)
    dispatches keep the auto-sharded XLA stage loop."""
    from . import device_channel as dc
    from . import fft

    n = log_size + log_blowup
    last_log = llb + log_blowup
    n_inner = n - 1 - last_log
    bound = 1 << llb
    twiddles = fft.stage_twiddles(n)
    tw = hostcircle.get_twiddles(n)
    ys_inv = jnp.asarray(tw.ys_inv)
    xs_invs = tuple(jnp.asarray(x) for x in tw.xs_layers_inv)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_elem = mesh.shape["elem"]
        elem_sharding = NamedSharding(mesh, PartitionSpec(None, "elem"))

        replicated = NamedSharding(mesh, PartitionSpec(None, None))

        def shard_elem(x):
            # Keep the element axis sharded while every shard still holds a
            # whole number of halves-pairs; tiny tail layers replicate.
            if x.shape[-1] % (2 * n_elem) == 0:
                return jax.lax.with_sharding_constraint(x, elem_sharding)
            return jax.lax.with_sharding_constraint(x, replicated)

        def replicate(x):
            return jax.lax.with_sharding_constraint(x, replicated)

        if not batched:
            from ..parallel.fft_sharded import sharded_evaluate

            evaluate = lambda c, tw: sharded_evaluate(c, n, mesh)  # noqa: E731
        else:
            evaluate = fft.evaluate
    else:
        shard_elem = lambda x: x  # noqa: E731
        replicate = lambda x: x  # noqa: E731
        evaluate = fft.evaluate_auto

    def fold_c(evals, alpha, ys_inv):
        half = evals.shape[1] // 2
        fp = tuple(evals[i, :half] for i in range(4))
        fm = tuple(evals[i, half:] for i in range(4))
        a = tuple(alpha[i] for i in range(4))
        f1 = qm31_mul_m31(qm31_sub(fp, fm), ys_inv)
        return jnp.stack(qm31_add(qm31_add(fp, fm), qm31_mul(a, f1)))

    def fold_l(g, alpha, xs_inv):
        half = g.shape[1] // 2
        g0 = tuple(g[i, :half] for i in range(4))
        g1 = tuple(g[i, half:] for i in range(4))
        a = tuple(alpha[i] for i in range(4))
        f1 = qm31_mul_m31(qm31_sub(g0, g1), xs_inv)
        return jnp.stack(qm31_add(qm31_add(g0, g1), qm31_mul(a, f1)))

    sizes = [n] + [n - 1 - l for l in range(n_inner)]

    def run(coeffs, perm, seed_lo, seed_hi, twiddles, ys_inv, xs_invs):
        if device_ingest:
            # `coeffs` is the raw uint32 word stream (pad_to_words); the
            # byte->felt unpack and the coefficient bit-reversal fuse into
            # one device gather (VERDICT r1 item 2).
            from ..utils.packing import device_ingest_rev

            coeffs_rev = device_ingest_rev(coeffs, log_size)
        else:
            coeffs_rev = fft.apply_bitrev(coeffs, perm)
        digest = dc.fresh_digest()
        if has_seed:
            digest = dc.dc_mix_u64(digest, seed_lo, seed_hi)
        evals = shard_elem(evaluate(coeffs_rev, twiddles))
        # PRUNED tree builds (merkle.device_levels_pruned): wide levels are
        # hashed 3-at-a-time and only every third level is kept; the decommit
        # gathers below recompute the missing levels' few auth-path nodes on
        # the fly (_auth_sibling_nodes). One build serves both the transcript
        # root and the gathers — the 2-at-a-time full build this replaces ran
        # once for the root and again (levels transient) for the gathers.
        st0 = merkle.device_levels_pruned(evals)
        root0 = st0[-1][1][:, 0]
        digest = dc.dc_mix_digest(digest, root0)
        alpha, _ = dc.dc_draw_felt(digest, jnp.uint32(0))
        g = shard_elem(fold_c(evals, alpha, ys_inv))
        roots = [root0]
        layer_arrays = [evals]
        tree_stores = [dict(st0)]
        for l in range(n_inner):
            st = merkle.device_levels_pruned(g)
            root_l = st[-1][1][:, 0]
            digest = dc.dc_mix_digest(digest, root_l)
            alpha, _ = dc.dc_draw_felt(digest, jnp.uint32(0))
            roots.append(root_l)
            layer_arrays.append(g)
            tree_stores.append(dict(st))
            g = shard_elem(fold_l(g, alpha, xs_invs[l]))
        # The last layer is tiny (<= 2^(llb+blowup) values): replicate it so
        # the recursive interpolation below runs locally on every device.
        g = replicate(g)
        coeffs_last = _device_ifft_line(
            tuple(g[i] for i in range(4)), xs_invs, n_inner
        )  # (2^last_log, 4)
        last_poly = coeffs_last[:bound]
        degree_ok = (
            jnp.all(coeffs_last[bound:] == 0)
            if coeffs_last.shape[0] > bound
            else jnp.asarray(True)
        )
        digest = dc.dc_mix_felts(digest, last_poly)
        nonce = dc.dc_grind(digest, pow_bits)
        digest = dc.dc_mix_u64(digest, nonce, jnp.uint32(0))
        qpos, _ = dc.dc_sample_query_words(digest, jnp.uint32(0), n_queries, n)

        # --- oblivious decommit gathers (VERDICT r1 items 1/4 + the r2
        # transfer-storm fix): with qpos now known ON DEVICE, gather the FULL
        # per-raw-query data — evaluation values, both elements of each
        # queried pair per layer, and the complete Merkle authentication path
        # per layer. Every value/hash the deduped proof encoding needs is a
        # subset (each hash witness of a multi-opening is the sibling of an
        # ancestor of a queried leaf = an auth-path node), so the host
        # assembles the proof from this ONE packed fetch with zero further
        # device traffic. Trees are PRUNED (every 3rd level stored, ~N/7
        # nodes per tree — device_levels_pruned above), so keeping them
        # resident from transcript time to gather time costs far less HBM
        # than one full tree (2^24-felt proofs must fit one v5e).
        packed = [
            jnp.stack(roots).reshape(-1),
            last_poly.reshape(-1),
            degree_ok.astype(jnp.uint32).reshape(1),
            jnp.reshape(nonce, (1,)),
            qpos,
            replicate(evals[:, _dbitrev(qpos, n)]).reshape(-1),  # (4, nq)
        ]
        for t, log_leaves in enumerate(sizes):
            cols = layer_arrays[t]
            pos = qpos >> t  # query positions in this layer (stored order)
            base = pos & ~jnp.uint32(1)
            nat0 = _dbitrev(base, log_leaves)
            nat1 = _dbitrev(base | jnp.uint32(1), log_leaves)
            # both elements of each queried pair: (4, nq, 2)
            pv = jnp.stack([cols[:, nat0], cols[:, nat1]], axis=2)
            packed.append(replicate(pv).reshape(-1))
            stored = tree_stores[t]
            for k in range(log_leaves):
                nodes = _auth_sibling_nodes(stored, cols, log_leaves, pos, k)
                packed.append(replicate(nodes).reshape(-1))  # (8, nq)
        return jnp.concatenate(packed)

    tables = (twiddles, ys_inv, xs_invs)
    if batched:
        # Data-parallel batch of independent transcripts: vmap over a leading
        # blob axis; spmd_axis_name threads the mesh's "data" axis through
        # every with_sharding_constraint inside.
        return jax.jit(
            jax.vmap(
                run,
                in_axes=(0, None, 0, 0, None, None, None),
                spmd_axis_name="data" if mesh is not None else None,
            )
        ), tables
    return jax.jit(run), tables


@functools.lru_cache(maxsize=32)
def _packed_layout(n: int, n_inner: int, bound: int, nq: int):
    """Static layout of the single packed uint32 vector the commit-phase
    dispatch returns. Mirrors the packing order in _fri_commit_fn.run —
    keep the two in sync."""
    sizes = [n] + [n - 1 - l for l in range(n_inner)]
    T = n_inner + 1
    off = {}
    o = 0
    for key, count in (
        ("roots", T * 8),
        ("last", bound * 4),
        ("degree_ok", 1),
        ("nonce", 1),
        ("qpos", nq),
        ("evalvals", 4 * nq),
    ):
        off[key] = (o, count)
        o += count
    pair_off = []
    auth_off = []
    for log_leaves in sizes:
        pair_off.append(o)
        o += 4 * nq * 2
        lv = []
        for _ in range(log_leaves):
            lv.append(o)
            o += 8 * nq
        auth_off.append(lv)
    return off, pair_off, auth_off, o, sizes


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


def _eval_line_poly_batch(coeffs, xs: np.ndarray) -> np.ndarray:
    """Vectorized _eval_line_poly: evaluate at an array of points at once.
    coeffs: list of QM31 tuples (natural order, basis bit k <-> pi^k(x));
    xs: (m,) uint64. Returns (m, 4) uint64. Bit-exact with the scalar form
    (tests/test_proof.py cross-check)."""
    from . import npfield

    m = xs.shape[0]
    n_c = len(coeffs)
    if n_c == 1:
        return np.broadcast_to(npfield.qm31_arr([coeffs[0]]), (m, 4)).copy()
    log_n = (n_c - 1).bit_length()
    basis = [np.asarray(xs, np.uint64)]
    for _ in range(log_n - 1):
        b = basis[-1]
        basis.append((2 * b % P * b + (P - 1)) % P)  # pi(x) = 2x^2 - 1
    acc = np.zeros((m, 4), np.uint64)
    for i, c in enumerate(coeffs):
        term = np.broadcast_to(npfield.qm31_arr([c]), (m, 4))
        for k in range(log_n):
            if (i >> k) & 1:
                term = npfield.qm31_mul_m31(term, basis[k])
        acc = npfield.qm31_add(acc, term)
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

def dispatch_commit_phase_staged(words_dev, log_total: int, seed,
                                 pcs_config: PcsConfig = DEFAULT_CONFIG):
    """_dispatch_commit_phase for an ALREADY-DEVICE-RESIDENT raw word stream
    (pad_to_words layout): skips host ingest + upload. Returns the same
    opaque context (finish with finish_proof). This is the path a production
    serving pipeline with device-side ingest uses, and what
    bench.py's device-sustained prove metric times (the remote tunnel's
    upload bandwidth otherwise dominates large-blob prove latency)."""
    return _dispatch_commit_phase(None, seed, pcs_config,
                                  _staged=(words_dev, log_total))


def finish_proof(ctx):
    """Public alias of _finish_proof (pairs with dispatch_commit_phase_staged)."""
    return _finish_proof(ctx)


def _dispatch_commit_phase(data, seed, pcs_config: PcsConfig, mesh=None,
                           _staged=None):
    """Async half of proving: one device dispatch of the full FRI commit
    phase. Returns an opaque context consumed by _finish_proof; dispatching
    several blobs before finishing any overlaps their uploads/compute.

    With `mesh` the dispatch is SPMD over the mesh's "elem" axis (coefficients
    element-sharded, collectives inserted by XLA); the proof bytes are
    bit-identical to the unsharded dispatch."""
    from ..utils.profiling import span
    from . import fft

    from ..utils.packing import log_total_for, pad_to_words

    fri_cfg = pcs_config.fri_config
    device_ingest = mesh is None
    with span("prove/ingest"):
        if _staged is not None:
            coeffs, log_total = _staged
            log_size = log_total - 2
        elif device_ingest:
            log_size = log_total_for(len(data)) - 2
            coeffs = pad_to_words(data, log_size + 2)  # raw words; unpack on device
        else:
            coeffs = polynomial_from_bytes(data)
            log_size = ceil_log2(coeffs.shape[1])
    n = log_size + fri_cfg.log_blowup_factor
    last_log = fri_cfg.log_last_layer_degree_bound + fri_cfg.log_blowup_factor
    n_inner = n - 1 - last_log
    if n_inner < 0:
        raise ValueError(
            f"config unsatisfiable: log_last_layer_degree_bound "
            f"{fri_cfg.log_last_layer_degree_bound} >= poly log size {log_size}"
        )

    fn, tables = _fri_commit_fn(
        log_size,
        fri_cfg.log_blowup_factor,
        fri_cfg.log_last_layer_degree_bound,
        fri_cfg.n_queries,
        pcs_config.pow_bits,
        seed is not None,
        mesh,
        device_ingest=device_ingest,
    )
    coeffs_dev = jnp.asarray(coeffs)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if coeffs.shape[1] % mesh.shape["elem"] == 0:
            coeffs_dev = jax.device_put(
                coeffs_dev, NamedSharding(mesh, PartitionSpec(None, "elem"))
            )
        else:
            coeffs_dev = jax.device_put(
                coeffs_dev, NamedSharding(mesh, PartitionSpec())
            )
    seed_val = 0 if seed is None else int(seed) & ((1 << 64) - 1)
    with span("prove/device_dispatch(lde+merkle+transcript+grind)"):
        outs = fn(
            coeffs_dev,
            fft.bitrev_perm_device(log_size),
            jnp.uint32(seed_val & 0xFFFFFFFF),
            jnp.uint32(seed_val >> 32),
            *tables,
        )
    return (outs, pcs_config, log_size, n, n_inner)


def _blob_hbm_footprint_bytes(log_size: int, fri_cfg) -> int:
    """Peak HBM bytes ONE in-flight commit-phase dispatch holds at domain
    2^n (n = log_size + log_blowup). Additive model of what the dispatch
    keeps resident from transcript time to gather time:
      evaluations          4 cols x 4 B x N          = 16 N
      folded layers        QM31 x (N/2 + N/4 + ...) ~= 16 N
      pruned trees         ~N/7 nodes x 32 B over layers (N + N/2 + ...)
                          ~=  9 N
      FFT/ingest transients (double-buffered passes)  ~= 16 N
    => ~57 N; rounded up to 64 N for headroom."""
    n = log_size + fri_cfg.log_blowup_factor
    return 64 * (1 << n)


def _device_hbm_bytes() -> int:
    """Best-effort HBM capacity of the attached device (bytes)."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:  # noqa: BLE001 — backend without memory_stats
        pass
    return 16 << 30  # v5e default


def safe_in_flight(log_size: int, fri_cfg) -> int:
    """Largest prove_many window whose resident footprint fits in ~60% of
    HBM (the rest is slack for XLA temporaries and fetch buffers)."""
    budget = int(0.6 * _device_hbm_bytes())
    return max(1, budget // _blob_hbm_footprint_bytes(log_size, fri_cfg))


def prove_many(datas, seeds, pcs_config: PcsConfig = DEFAULT_CONFIG,
               max_in_flight: int | None = None):
    """Pipelined batch proving: keep up to `max_in_flight` blobs' commit
    phases dispatched ahead of the finish (fetch + decommit gathers) cursor.
    Returns a list of (commitment, Proof) in input order. Sustained-throughput
    counterpart of commit_and_generate_proof for production serving.

    The window bounds the device footprint: every in-flight blob holds its
    evaluations + folded layers + pruned tree levels in HBM until finished
    (_blob_hbm_footprint_bytes), so an unbounded dispatch of large blobs
    (2^22+ domains) would exhaust HBM. Default (None): min(8, safe window
    for the largest blob). An explicit request above the safe window is
    CLAMPED with a warning rather than allowed to OOM (VERDICT r4 item 6)."""
    from ..utils.packing import log_total_for

    datas = list(datas)
    seeds = list(seeds)
    if len(datas) != len(seeds):
        raise ValueError(f"{len(datas)} blobs but {len(seeds)} seeds")
    if datas:
        max_log_size = max(log_total_for(len(d)) for d in datas) - 2
        safe = safe_in_flight(max_log_size, pcs_config.fri_config)
        if max_in_flight is None:
            max_in_flight = min(8, safe)
        elif max_in_flight > safe:
            import warnings

            warnings.warn(
                f"prove_many window {max_in_flight} exceeds the HBM-safe "
                f"window {safe} for 2^{max_log_size}-felt blobs at blowup "
                f"2^{pcs_config.fri_config.log_blowup_factor}; clamping",
                stacklevel=2,
            )
            max_in_flight = safe
    else:
        max_in_flight = max_in_flight or 8
    assert max_in_flight >= 1
    out = []
    ctxs: list = []
    for d, s in zip(datas, seeds):
        if len(ctxs) >= max_in_flight:
            out.append(_finish_proof(ctxs.pop(0)))
        ctxs.append(_dispatch_commit_phase(d, s, pcs_config))
    out.extend(_finish_proof(ctx) for ctx in ctxs)
    return out


def commit_and_generate_proof(data: bytes, seed, pcs_config: PcsConfig = DEFAULT_CONFIG):
    """Returns (commitment_bytes, Proof). Reference: src/proof.rs:32-77.

    One device dispatch for the whole FRI commit phase, one small fetch of
    (roots, last layer, nonce, query words), one batched decommitment gather.
    """
    return _finish_proof(_dispatch_commit_phase(data, seed, pcs_config))


def _finish_proof(ctx):
    """Assemble a Proof from the commit phase's ONE packed uint32 vector
    (layout: _packed_layout). Pure host work after a single device fetch:
    dedup the raw query draws, group pairs, and select the deduped encoding's
    values/hashes from the oblivious per-raw-query gathers (every needed
    hash-witness node is on some raw query's fetched auth path)."""
    from ..utils.profiling import span

    (packed, pcs_config, log_size, n, n_inner) = ctx
    fri_cfg = pcs_config.fri_config
    nq = fri_cfg.n_queries
    bound = 1 << fri_cfg.log_last_layer_degree_bound
    off, pair_off, auth_off, total, sizes = _packed_layout(n, n_inner, bound, nq)

    with span("prove/fetch_packed"):
        vec = np.asarray(jax.device_get(packed))
    assert vec.shape == (total,), (vec.shape, total)

    def sl(key):
        s, c = off[key]
        return vec[s : s + c]

    if not bool(sl("degree_ok")[0]):
        raise AssertionError("FRI last layer exceeds degree bound (internal bug)")
    T = n_inner + 1
    roots_np = sl("roots").reshape(T, 8)
    roots = [
        b"".join(int(w).to_bytes(4, "little") for w in roots_np[t]) for t in range(T)
    ]
    last_np = sl("last").reshape(bound, 4)
    last_layer_poly = [tuple(int(v) for v in last_np[j]) for j in range(bound)]
    nonce = int(sl("nonce")[0])
    qpos_np = [int(q) for q in sl("qpos")]
    queries = sorted(set(qpos_np))
    slot_of = {}
    for i, q in enumerate(qpos_np):
        slot_of.setdefault(q, i)

    with span("prove/assemble"):
        evalvals = sl("evalvals").reshape(4, nq)
        evaluations = [
            tuple(int(evalvals[c, slot_of[q]]) for c in range(4)) for q in queries
        ]

        layers = []
        pos = list(queries)
        for t, log_leaves in enumerate(sizes):
            pv = vec[pair_off[t] : pair_off[t] + 8 * nq].reshape(4, nq, 2)
            # any raw slot whose layer-t position falls in pair k holds both
            # of that pair's values (the dispatch gathered the full pair)
            pair_slot = {(qpos_np[i] >> t) >> 1: i for i in range(nq)}
            fri_witness = []
            for k, _, lone in _pair_groups(pos):
                if lone is not None:
                    sib = lone ^ 1
                    slot = pair_slot[k]
                    fri_witness.append(
                        tuple(int(pv[c, slot, sib & 1]) for c in range(4))
                    )
            hashes = []
            plans = _merkle_witness_plans(log_leaves, _all_leaf_indices(pos))
            for k, sibs in enumerate(plans):
                if not sibs:
                    continue
                av = vec[auth_off[t][k] : auth_off[t][k] + 8 * nq].reshape(8, nq)
                node_slot = {
                    ((qpos_np[i] >> t) >> k) ^ 1: i for i in range(nq)
                }
                hashes.extend(
                    b"".join(
                        int(av[w, node_slot[s]]).to_bytes(4, "little")
                        for w in range(8)
                    )
                    for s in sibs
                )
            layers.append(
                FriLayerProof(
                    fri_witness=fri_witness,
                    decommitment=merkle.MerkleDecommitment(hashes),
                    commitment=roots[t],
                )
            )
            pos = sorted({p >> 1 for p in pos})

    proof = Proof(
        proof=FriProof(layers[0], layers[1:], last_layer_poly),
        proof_of_work=nonce,
        pcs_config=pcs_config,
        log_size_bound=log_size,
        evaluations=evaluations,
    )
    return roots[0], proof


# ---------------------------------------------------------------------------
# Verifier (host-only, light-client-sized)
# ---------------------------------------------------------------------------

def _verify_layer_merkle(root, log_len, positions, values, fri_witness, dec):
    """Group pairs, fill sibling values from the witness, check the Merkle
    multi-opening — all hashing batched (one native call per tree level)
    and all grouping/witness-fill vectorized (the per-pair Python walk this
    replaces was ~half of light-client verify time).

    positions: sorted unique int positions (array-like); values: (m, 4)
    uint64 rows matching positions. Returns (pair_ks (k,) int64, v_even
    (k, 4) uint64, v_odd (k, 4) uint64) or None on failure (including
    witness length mismatch — the reference consumes the witness exactly)."""
    from . import npfield

    pos = np.asarray(positions, np.int64)
    m = pos.size
    # sorted unique positions: element i starts a full pair iff it is even
    # and the next element is its sibling; an odd element can only pair
    # backward, which the previous position already captured.
    is_start = np.zeros(m, bool)
    if m > 1:
        is_start[:-1] = (pos[:-1] % 2 == 0) & (pos[1:] == pos[:-1] + 1)
    is_second = np.zeros(m, bool)
    is_second[1:] = is_start[:-1]
    lone = ~is_start & ~is_second
    keep = is_start | lone  # one output pair per kept position, in order
    kidx = pos[keep]
    pair_ks = kidx >> 1
    k_n = pair_ks.size
    n_lone = int(lone.sum())
    if n_lone != len(fri_witness):  # witness consumed exactly
        return None
    wit = (
        np.asarray(fri_witness, np.uint64).reshape(n_lone, 4)
        if n_lone
        else np.zeros((0, 4), np.uint64)
    )
    v0s = np.empty((k_n, 4), np.uint64)
    v1s = np.empty((k_n, 4), np.uint64)
    lone_k = lone[keep]
    paired_k = ~lone_k
    start_rows = np.flatnonzero(keep)[paired_k]
    v0s[paired_k] = values[start_rows]
    v1s[paired_k] = values[start_rows + 1]
    lone_even = lone_k & (kidx % 2 == 0)
    lone_odd = lone_k & (kidx % 2 == 1)
    lone_rows = np.flatnonzero(keep)[lone_k]
    even_sel = (kidx[lone_k] % 2 == 0)
    v0s[lone_even] = values[lone_rows[even_sel]]
    v1s[lone_even] = wit[even_sel.nonzero()[0]]
    v0s[lone_odd] = wit[(~even_sel).nonzero()[0]]
    v1s[lone_odd] = values[lone_rows[~even_sel]]
    # leaf messages: 4 column words + 12 zeros, interleaved (2k, 2k+1)
    msgs = np.zeros((2 * k_n, 16), np.uint32)
    msgs[0::2, :4] = v0s.astype(np.uint32)
    msgs[1::2, :4] = v1s.astype(np.uint32)
    leaf_rows = merkle.compress_rows_host(msgs)
    leaf_idxs = np.empty(2 * k_n, np.int64)
    leaf_idxs[0::2] = 2 * pair_ks
    leaf_idxs[1::2] = 2 * pair_ks + 1
    if not merkle.verify_openings_rows(
        root, log_len, leaf_idxs, leaf_rows, dec.hash_witness
    ):
        return None
    return pair_ks, v0s, v1s


def verify_proof(proof: Proof, seed) -> bool:
    """Replay the transcript and check every decommitment/fold. Returns False
    for invalid proofs — NEVER raises (reference: FriVerifier::commit Err =>
    false, src/proof.rs:84-91) — with one deliberate exception: panic-parity
    with the reference when `evaluations` is shorter than the sampled query
    set (src/proof.rs:166-173), which raises IndexError."""
    from ..utils.profiling import span

    try:
        with span("verify"):
            return _verify_proof_inner(proof, seed)
    except IndexError:
        raise  # panic-parity quirk: missing evaluations
    except Exception:
        return False


def _qm31_array_or_none(lst):
    """(m, 4) uint64 array of the felt list, or None if any entry is not a
    4-tuple of in-field integers — vectorized (the per-element genexpr this
    replaces was a verify hot spot), and the conversion is returned so
    callers never re-convert. The tuple type itself is spot-checked on the
    first entry; any shape/type raggedness in the rest surfaces as a
    non-integer or non-(n, 4) array."""
    if not lst:
        return np.zeros((0, 4), np.uint64)
    if type(lst[0]) is not tuple:
        return None
    try:
        arr = np.asarray(lst)
    except (TypeError, ValueError, OverflowError):
        return None
    if (
        arr.dtype.kind in "iu"
        and arr.ndim == 2
        and arr.shape[1] == 4
        and bool((arr >= 0).all())
        and bool((arr < P).all())
    ):
        return arr.astype(np.uint64)
    return None


def _valid_qm31_list(lst) -> bool:
    return _qm31_array_or_none(lst) is not None


def _replay_and_validate(proof: Proof, seed):
    """Shared front half of verification: structural validation + Fiat-
    Shamir transcript replay. Returns None for invalid proofs, else
    (n, n_inner, queries, vals, alpha0, alphas) where queries is the sorted
    unique sampled position list and vals the matching (m, 4) uint64
    evaluation rows. Raises IndexError if `evaluations` is shorter than the
    sampled query set (deliberate reference panic-parity,
    src/proof.rs:166-173)."""
    from . import npfield

    # --- structural validation (FriVerifier::commit's fallible parse:
    # malformed => Err => false, src/proof.rs:84-91; never raise) ---
    try:
        cfg = proof.pcs_config
        fri_cfg = cfg.fri_config
        log_size = int(proof.log_size_bound)
        pow_nonce = int(proof.proof_of_work)
        if not (0 <= log_size <= 48 and 0 <= pow_nonce < (1 << 64)):
            return False
        all_layers = [proof.proof.first_layer] + list(proof.proof.inner_layers)
        wit_arrays = []
        hash_rows = []
        for layer in all_layers:
            if not isinstance(layer.commitment, bytes) or len(layer.commitment) != 32:
                return None
            w = _qm31_array_or_none(layer.fri_witness)
            if w is None:
                return None
            wit_arrays.append(w)
            hw = layer.decommitment.hash_witness
            try:
                joined = b"".join(hw)
            except TypeError:
                return None
            if len(joined) != 32 * len(hw):
                return None
            hash_rows.append(
                np.frombuffer(joined, np.uint32).reshape(-1, 8)
                if joined else np.zeros((0, 8), np.uint32)
            )
    except (AttributeError, TypeError, ValueError):
        return None
    # Explicit config-bounds validation (not just FriConfig's asserts, which
    # `python -O` strips): a deserialized proof claiming blowup 0 would read
    # one past the twiddle layer tables (circle._line_layer_tables) and raise
    # instead of returning False. Mirrors the dataclass invariants.
    if not (
        1 <= fri_cfg.log_blowup_factor <= 16
        and 0 <= fri_cfg.log_last_layer_degree_bound <= 10
        and fri_cfg.n_queries >= 1
        and 0 <= cfg.pow_bits <= 60
    ):
        return None
    n = log_size + fri_cfg.log_blowup_factor
    last_log = fri_cfg.log_last_layer_degree_bound + fri_cfg.log_blowup_factor
    n_inner = n - 1 - last_log
    # --- FriVerifier::commit equivalent: shape checks + transcript replay ---
    if n_inner < 0:
        return None
    if len(proof.proof.inner_layers) != n_inner:
        return None
    if len(proof.proof.last_layer_poly) != (1 << fri_cfg.log_last_layer_degree_bound):
        return None
    if not _valid_qm31_list(proof.proof.last_layer_poly):
        return None

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
        return None
    queries = sample_query_positions(channel, n, fri_cfg.n_queries)

    # Deliberate reference quirk: missing evaluations panic, extras are invalid.
    values = {q: proof.evaluations[i] for i, q in enumerate(queries)}
    if len(proof.evaluations) > len(queries):
        return None
    if not _valid_qm31_list(list(values.values())):
        return None
    vals = npfield.qm31_arr([values[q] for q in queries])
    return n, n_inner, queries, vals, alpha0, alphas, wit_arrays, hash_rows


def _verify_proof_inner(proof: Proof, seed) -> bool:
    from . import npfield

    ctx = _replay_and_validate(proof, seed)
    if ctx is None:
        return False
    n, n_inner, queries, vals, alpha0, alphas = ctx[:6]

    # --- first layer: Merkle + circle->line fold (vectorized numpy) ---
    grouped = _verify_layer_merkle(
        proof.proof.first_layer.commitment, n, queries, vals,
        proof.proof.first_layer.fri_witness,
        proof.proof.first_layer.decommitment,
    )
    if grouped is None:
        return False
    pair_ks, vp, vm = grouped
    y_inv = hostcircle.ys_inv_at_stored_pairs(n, pair_ks)
    alpha0_arr = npfield.qm31_arr([alpha0])
    f0 = npfield.qm31_add(vp, vm)
    f1 = npfield.qm31_mul_m31(npfield.qm31_sub(vp, vm), y_inv)
    folded = npfield.qm31_add(f0, npfield.qm31_mul(alpha0_arr, f1))
    positions = pair_ks

    # --- inner layers: Merkle + line folds ---
    for l, layer in enumerate(proof.proof.inner_layers):
        grouped = _verify_layer_merkle(
            layer.commitment, n - 1 - l, positions, folded,
            layer.fri_witness, layer.decommitment,
        )
        if grouped is None:
            return False
        pair_ks, v0, v1 = grouped
        x_inv = hostcircle.line_x_inv_batch(n, l, 2 * pair_ks)
        alpha_arr = npfield.qm31_arr([alphas[l]])
        f0 = npfield.qm31_add(v0, v1)
        f1 = npfield.qm31_mul_m31(npfield.qm31_sub(v0, v1), x_inv)
        folded = npfield.qm31_add(f0, npfield.qm31_mul(alpha_arr, f1))
        positions = pair_ks

    # --- last layer: evaluate the claimed polynomial ---
    xs = hostcircle.line_x_batch(n, n_inner, positions)
    want = _eval_line_poly_batch(proof.proof.last_layer_poly, xs)
    return bool(np.array_equal(want, folded))


# ---------------------------------------------------------------------------
# Batch verification (VERDICT r4 item 8): the DAS light client's real shape
# is MANY cheap samples, so verify_many amortizes the per-proof Python cost —
# all proofs of one (n, n_inner) group walk the layers TOGETHER on
# concatenated arrays (grouping/witness-fill/folds as single numpy passes,
# leaf hashing as one native call per layer, opening walks as ONE native
# batch call per layer instead of one per proof).
# ---------------------------------------------------------------------------

def verify_many(proofs, seeds) -> list:
    """Verify a batch of independent proofs; returns a list of bools in
    input order. Exactly equivalent to [verify_proof(p, s) ...] including
    the evaluations-panic quirk, but ~4-6x faster for same-shaped batches.
    """
    proofs = list(proofs)
    seeds = list(seeds)
    if len(proofs) != len(seeds):
        raise ValueError(f"{len(proofs)} proofs but {len(seeds)} seeds")
    results = [False] * len(proofs)
    groups: dict = {}
    ctxs: dict = {}
    for i, (pr, sd) in enumerate(zip(proofs, seeds)):
        try:
            ctx = _replay_and_validate(pr, sd)
        except IndexError:
            raise  # panic-parity quirk (verify_proof does the same)
        except Exception:  # noqa: BLE001 — malformed proof object
            ctx = None
        if ctx is None:
            continue
        ctxs[i] = ctx
        groups.setdefault((ctx[0], ctx[1]), []).append(i)
    from . import merkle as merkle_mod

    nat = merkle_mod._native()
    for (n, n_inner), members in groups.items():
        if nat is None or len(members) == 1:
            for i in members:
                try:
                    results[i] = _verify_proof_inner(proofs[i], seeds[i])
                except Exception:  # noqa: BLE001
                    results[i] = False
            continue
        try:
            oks = _batched_layer_walk(
                n, n_inner, [proofs[i] for i in members],
                [ctxs[i] for i in members], nat,
            )
            for i, ok in zip(members, oks):
                results[i] = bool(ok)
        except Exception:  # noqa: BLE001 — fall back to the scalar path
            for i in members:
                try:
                    results[i] = _verify_proof_inner(proofs[i], seeds[i])
                except Exception:  # noqa: BLE001
                    results[i] = False
    return results


def _batched_layer_walk(n: int, n_inner: int, proofs, ctxs, nat) -> np.ndarray:
    """All layers of a same-shape proof batch on concatenated arrays.

    Segmentation trick: proof p's layer positions are offset by p << log_len.
    Offsets are even multiples of the local domain, so pair grouping
    ((2k, 2k+1) adjacency), parity, and halving (k = pos >> 1 keeps the
    offset as p << (log_len - 1)) all stay correct on the flat array and
    pairs can never straddle a proof boundary; witness values concatenate
    proof-major, matching encounter order."""
    from . import npfield

    P_ = len(proofs)
    alive = np.ones(P_, bool)
    pos_list = [np.asarray(c[2], np.int64) for c in ctxs]   # local positions
    val_list = [c[3] for c in ctxs]                          # (m, 4) uint64
    for l in range(-1, n_inner):
        log_len = n if l < 0 else n - 1 - l
        layers = [
            (p.proof.first_layer if l < 0 else p.proof.inner_layers[l])
            for p in proofs
        ]
        li = l + 1  # ctx wit/hash arrays index: 0 = first layer
        lens = np.array([x.size for x in pos_list], np.int64)
        offs = np.arange(P_, dtype=np.int64) << log_len
        pos_all = np.concatenate(
            [pos + offs[p] for p, pos in enumerate(pos_list)]
        )
        vals_all = np.concatenate(val_list)
        seg_id = np.repeat(np.arange(P_), lens)
        m = pos_all.size
        is_start = np.zeros(m, bool)
        if m > 1:
            is_start[:-1] = (pos_all[:-1] % 2 == 0) & (pos_all[1:] == pos_all[:-1] + 1)
        is_second = np.zeros(m, bool)
        is_second[1:] = is_start[:-1]
        lone = ~is_start & ~is_second
        keep = is_start | lone
        kidx = pos_all[keep]
        pair_ks = kidx >> 1          # still offset by p << (log_len - 1)
        k_n = pair_ks.size
        # per-proof witness arrays; count check per segment
        lone_count = np.bincount(seg_id[lone], minlength=P_)
        wits = []
        for p in range(P_):
            w = ctxs[p][6][li]  # pre-converted by _replay_and_validate
            if w.shape[0] != lone_count[p]:
                alive[p] = False
                # keep the flat walk aligned for the other proofs
                w = np.zeros((lone_count[p], 4), np.uint64)
            wits.append(w)
        wit_all = (np.concatenate(wits) if wits else
                   np.zeros((0, 4), np.uint64))
        v0s = np.empty((k_n, 4), np.uint64)
        v1s = np.empty((k_n, 4), np.uint64)
        lone_k = lone[keep]
        paired_k = ~lone_k
        start_rows = np.flatnonzero(keep)[paired_k]
        v0s[paired_k] = vals_all[start_rows]
        v1s[paired_k] = vals_all[start_rows + 1]
        lone_rows = np.flatnonzero(keep)[lone_k]
        even_sel = (kidx[lone_k] % 2 == 0)  # offsets even: parity is local
        lone_even = lone_k.copy(); lone_even[lone_k] = even_sel
        lone_odd = lone_k.copy(); lone_odd[lone_k] = ~even_sel
        v0s[lone_even] = vals_all[lone_rows[even_sel]]
        v1s[lone_even] = wit_all[even_sel.nonzero()[0]]
        v0s[lone_odd] = wit_all[(~even_sel).nonzero()[0]]
        v1s[lone_odd] = vals_all[lone_rows[~even_sel]]
        # one leaf-hash pass + ONE native opening walk for the whole batch
        msgs = np.zeros((2 * k_n, 16), np.uint32)
        msgs[0::2, :4] = v0s.astype(np.uint32)
        msgs[1::2, :4] = v1s.astype(np.uint32)
        leaf_rows = merkle.compress_rows_host(msgs)
        pair_count = np.bincount(seg_id[keep], minlength=P_)
        pair_off = np.concatenate([[0], np.cumsum(pair_count)])
        local_ks = pair_ks - (np.repeat(offs, pair_count) >> 1)
        leaf_idxs = np.empty(2 * k_n, np.int64)
        leaf_idxs[0::2] = 2 * local_ks
        leaf_idxs[1::2] = 2 * local_ks + 1
        hash_wits = [ctxs[p][7][li] for p in range(P_)]
        wseg = np.concatenate([[0], np.cumsum([w.shape[0] for w in hash_wits])])
        ok_nat, roots = nat.verify_openings_batch(
            log_len, 2 * pair_off, leaf_idxs, leaf_rows, wseg,
            np.concatenate(hash_wits) if hash_wits else
            np.zeros((0, 8), np.uint32),
        )
        root_match = np.array([
            roots[p].tobytes() == layers[p].commitment for p in range(P_)
        ])
        alive &= ok_nat & root_match
        # fold (per-row alphas via repeat by segment pair counts)
        if l < 0:
            inv = hostcircle.ys_inv_at_stored_pairs(n, local_ks)
            a_rows = npfield.qm31_arr([c[4] for c in ctxs])  # (P, 4)
        else:
            inv = hostcircle.line_x_inv_batch(n, l, 2 * local_ks)
            a_rows = npfield.qm31_arr([c[5][l] for c in ctxs])
        alpha_all = np.repeat(a_rows, pair_count, axis=0)
        f0 = npfield.qm31_add(v0s, v1s)
        f1 = npfield.qm31_mul_m31(npfield.qm31_sub(v0s, v1s), inv)
        folded = npfield.qm31_add(f0, npfield.qm31_mul(alpha_all, f1))
        pos_list = [local_ks[pair_off[p]:pair_off[p + 1]] for p in range(P_)]
        val_list = [folded[pair_off[p]:pair_off[p + 1]] for p in range(P_)]
    # last layer: evaluate each proof's claimed polynomial at its positions
    for p in range(P_):
        if not alive[p]:
            continue
        xs = hostcircle.line_x_batch(n, n_inner, pos_list[p])
        want = _eval_line_poly_batch(proofs[p].proof.last_layer_poly, xs)
        alive[p] = bool(np.array_equal(want, val_list[p]))
    return alive
