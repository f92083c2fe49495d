"""Host-side circle-domain twiddle precompute (vectorized numpy).

The circle geometry itself is index math on the host (SURVEY.md §2.2 row
"Circle group & indexing"); only the resulting twiddle tables are shipped to
the device. Reference semantics: /root/reference/src/commit.rs:14-16 and
SURVEY.md A.3-A.5 (golden-verified).

Layout convention — NATURAL order on device. The device pipeline keeps every
array in natural domain-enumeration order (SURVEY.md A.3: [half_coset,
conjugates]); the reference's bit-reversed *storage* order exists only as
host-side index arithmetic (stored index s <-> natural index bitrev(s)).
Natural order makes every device access pattern contiguous:

  * conjugate pairs / ±x pairs sit at (j, j + size/2) — array halves;
  * FFT stages write whole sub-blocks (no lane interleaves);
  * Merkle levels pair halves; FRI folds combine halves.

`Twiddles(log_size)` covers the canonic CircleDomain of size 2^log_size
(half coset = Coset::half_odds(log_size - 1)):

  ys[t]            y(p_t), half-coset points in natural order    (2^(n-1),)
  xs_layers[l]     L_l: x-line layer l, natural, first-half entries only
                   (L_0[t] = x(p_t) for t < 2^(n-2) ... down to size 1);
                   the dropped second half satisfies L[t+half] == -L[t]
                   (asserted at construction)
  ys_inv, xs_layers_inv   — matching batched inverses (for FRI folds)

FFT stage twiddle at depth d: ys if d == 0 else xs_layers[d-1].
"""

from __future__ import annotations

import functools

import numpy as np

P = (1 << 31) - 1
GENERATOR = (2, 1268011823)
LOG_ORDER = 31


def _pmul(x1, y1, x2, y2):
    """Vectorized circle group law over uint64 numpy arrays (mod P)."""
    return (
        (x1 * x2 + (P - y1) * y2 % P) % P,
        (x1 * y2 + y1 * x2) % P,
    )


def _point_pow(px: int, py: int, e: int):
    ax, ay = 1, 0
    while e:
        if e & 1:
            ax, ay = (ax * px - ay * py) % P, (ax * py + ay * px) % P
        px, py = (px * px - py * py) % P, (2 * px * py) % P
        e >>= 1
    return ax % P, ay % P


def _batch_inv(a: np.ndarray) -> np.ndarray:
    """a^(P-2) vectorized (uint64, Mersenne modulus)."""
    e = P - 2
    acc = np.ones_like(a)
    base = a.copy()
    while e:
        if e & 1:
            acc = acc * base % P
        base = base * base % P
        e >>= 1
    return acc


@functools.lru_cache(maxsize=32)
def bitrev_permutation(log_n: int) -> np.ndarray:
    idx = np.arange(1 << log_n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for i in range(log_n):
        rev |= ((idx >> np.int64(i)) & np.int64(1)) << np.int64(log_n - 1 - i)
    rev.setflags(write=False)  # cached: guard against accidental mutation
    return rev


def bit_reverse_index(i: int, log_n: int) -> int:
    r = 0
    for _ in range(log_n):
        r = (r << 1) | (i & 1)
        i >>= 1
    return r


def half_odds_points(log_size: int):
    """All points of Coset::half_odds(log_size) in natural order, as two
    uint64 arrays (xs, ys). p_k = G^(2^(29-m)) * (G^(2^(31-m)))^k."""
    m = log_size
    ix, iy = _point_pow(*GENERATOR, 1 << (LOG_ORDER - 2 - m))
    sx, sy = _point_pow(*GENERATOR, 1 << (LOG_ORDER - m))
    xs = np.array([ix], np.uint64)
    ys = np.array([iy], np.uint64)
    px, py = sx, sy
    for _ in range(m):
        nx, ny = _pmul(xs, ys, np.uint64(px), np.uint64(py))
        xs = np.concatenate([xs, nx])
        ys = np.concatenate([ys, ny])
        px, py = _point_pow(px, py, 2)
    return xs, ys


class Twiddles:
    def __init__(self, log_size: int):
        assert log_size >= 1
        self.log_size = log_size
        m = log_size - 1
        xs, ys = half_odds_points(m)
        self.ys = ys.astype(np.uint32)
        self.ys_inv = _batch_inv(ys).astype(np.uint32)
        self.xs_layers: list[np.ndarray] = []
        self.xs_layers_inv: list[np.ndarray] = []
        cur = xs
        while len(cur) >= 2:
            half = len(cur) >> 1
            lo, hi = cur[:half], cur[half:]
            assert np.all((lo + hi) % P == 0), "±x natural pair adjacency broken"
            self.xs_layers.append(lo.astype(np.uint32))
            self.xs_layers_inv.append(_batch_inv(lo).astype(np.uint32))
            cur = (2 * lo % P * lo + (P - 1)) % P  # pi(x) = 2x^2 - 1
        # log_size == 1: domain {p, conj p} — no line layers, ys has 1 entry.

    def eval_stage_twiddle(self, depth: int) -> np.ndarray:
        """Twiddle table for FFT combine depth `depth` (0 = y-stage), natural
        order, size 2^(log_size-1-depth)."""
        return self.ys if depth == 0 else self.xs_layers[depth - 1]


@functools.lru_cache(maxsize=16)
def get_twiddles(log_size: int) -> Twiddles:
    return Twiddles(log_size)


# --- per-index host helpers (verifier-side, Python ints) --------------------

def natural_point(log_size: int, natural: int):
    """Circle point of the canonic domain of log size n at *natural* index."""
    m = log_size - 1
    conj = natural >= (1 << m)
    t = natural & ((1 << m) - 1)
    ix, iy = _point_pow(*GENERATOR, 1 << (LOG_ORDER - 2 - m))
    sx, sy = _point_pow(*GENERATOR, 1 << (LOG_ORDER - m))
    px, py = _point_pow(sx, sy, t)
    x = (ix * px - iy * py) % P
    y = (ix * py + iy * px) % P
    if conj:
        y = (P - y) % P
    return x, y


def domain_point_at_stored_index(log_size: int, stored: int):
    """Circle point at *stored* (bit-reversed) index: stored s <-> natural
    bitrev_n(s) (SURVEY.md A.5)."""
    return natural_point(log_size, bit_reverse_index(stored, log_size))


# --- vectorized verifier-side twiddle lookups (reuse the cached tables) ----

_REV8 = np.array(
    [sum(((i >> b) & 1) << (7 - b) for b in range(8)) for i in range(256)],
    np.uint64,
)


def _bitrev_arr(js: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized bit-reversal over `bits` <= 32 bits (byte-table compose)."""
    js = np.asarray(js, np.uint64)
    m = np.uint64(0xFF)
    r32 = (
        (_REV8[(js & m).astype(np.int64)] << np.uint64(24))
        | (_REV8[((js >> np.uint64(8)) & m).astype(np.int64)] << np.uint64(16))
        | (_REV8[((js >> np.uint64(16)) & m).astype(np.int64)] << np.uint64(8))
        | _REV8[((js >> np.uint64(24)) & m).astype(np.int64)]
    )
    return r32 >> np.uint64(32 - bits)


@functools.lru_cache(maxsize=32)
def _line_layer_tables(log_size: int, layer: int):
    """(xs_layers[layer], xs_layers_inv[layer]) as read-only uint64 — the
    verifier's per-layer twiddle/inverse lookup tables (cached)."""
    tw = get_twiddles(log_size)
    xs = tw.xs_layers[layer].astype(np.uint64)
    inv = tw.xs_layers_inv[layer].astype(np.uint64)
    xs.setflags(write=False)
    inv.setflags(write=False)
    return xs, inv


def _line_lookup(log_size: int, layer: int, js, table: np.ndarray) -> np.ndarray:
    """Signed table lookup shared by line_x_batch / line_x_inv_batch.

    X_layer[j] = pi^layer(x(natural u)) with u = bitrev_{n-1-layer}(j), and
    pi^layer(xs[u]) = ±xs_layers[layer][u mod half] (cur_l[t] = pi^l(xs[t])
    by the Twiddles construction; second halves negate by the ±x pair
    adjacency asserted there). The same index/sign selects from the
    inverse table, so the verifier never runs a field inversion."""
    u = _bitrev_arr(np.asarray(js, np.uint64), log_size - 1 - layer)
    half = table.shape[0]  # == 2^(log_size - 2 - layer)
    hi = u >= half
    val = table[np.where(hi, u - half, u).astype(np.int64)]
    return np.where(hi, (P - val) % P, val)


def line_x_batch(log_size: int, layer: int, js) -> np.ndarray:
    """X_layer[js] for an array of STORED line-domain indices, vectorized:
    X_0[j] = x(stored domain point 2j), X_l[j] = pi^l(X_0[j << l]).

    Pure cached-table lookups (already built by any commit at this size)
    instead of per-index _point_pow chains — the verifier calls this once per
    FRI layer with ~n_queries indices. Values match fri._line_x_at exactly
    (tests/test_field_jax.py)."""
    xs, _ = _line_layer_tables(log_size, layer)
    return _line_lookup(log_size, layer, js, xs)


def line_x_inv_batch(log_size: int, layer: int, js) -> np.ndarray:
    """1 / X_layer[js], from the cached inverse tables (no Fermat pow)."""
    _, inv = _line_layer_tables(log_size, layer)
    return _line_lookup(log_size, layer, js, inv)


@functools.lru_cache(maxsize=16)
def _ys_inv_u64(log_size: int) -> np.ndarray:
    a = get_twiddles(log_size).ys_inv.astype(np.uint64)
    a.setflags(write=False)
    return a


def ys_inv_at_stored_pairs(log_size: int, ks) -> np.ndarray:
    """1/y(stored domain point 2k) for an array of pair indices k, via the
    cached ys_inv table: natural index of stored 2k is bitrev_{n-1}(k),
    always in the half coset (no conjugate sign)."""
    u = _bitrev_arr(np.asarray(ks, np.uint64), log_size - 1)
    return _ys_inv_u64(log_size)[u.astype(np.int64)]
