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
