"""Host-side circle-domain twiddle precompute (vectorized numpy).

The circle geometry itself is index math on the host (SURVEY.md §2.2 row
"Circle group & indexing"); only the resulting twiddle tables are shipped to
the device. Reference semantics: /root/reference/src/commit.rs:14-16 and
SURVEY.md A.3-A.5 (golden-verified).

A `Twiddles(log_size)` instance covers the canonic CircleDomain of size
2^log_size (half coset = Coset::half_odds(log_size - 1)) in bit-reversed
storage order and carries everything both commit and FRI need:

  ys[k]            y(q_k),  q_k = half_coset[bitrev(k)]          (2^(n-1),)
  xs_evens[l]      X_l[2k] — even entries of the level-l x-domain (2^(n-2-l),)
  ys_inv, xs_evens_inv   — matching batched inverses (for FRI folds)

Evaluate-stage twiddle at depth d: ys if d == 0 else xs_evens[d-1]; the odd
entries are the negations (asserted at construction).
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


def bitrev_permutation(log_n: int) -> np.ndarray:
    idx = np.arange(1 << log_n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for i in range(log_n):
        rev |= ((idx >> np.uint32(i)) & np.uint32(1)) << np.uint32(log_n - 1 - i)
    return rev


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
        rev = bitrev_permutation(m)
        xs, ys = xs[rev], ys[rev]
        self.ys = ys.astype(np.uint32)
        self.ys_inv = _batch_inv(ys).astype(np.uint32)
        self.xs_evens: list[np.ndarray] = []
        self.xs_evens_inv: list[np.ndarray] = []
        cur = xs
        while len(cur) >= 2:
            ev = cur[0::2]
            assert np.all((ev + cur[1::2]) % P == 0), "x-pair adjacency broken"
            self.xs_evens.append(ev.astype(np.uint32))
            self.xs_evens_inv.append(_batch_inv(ev).astype(np.uint32))
            cur = (2 * ev % P * ev + (P - 1)) % P  # pi(x) = 2x^2 - 1

    def eval_stage_twiddle(self, depth: int) -> np.ndarray:
        """Twiddle (even entries) for evaluate stage `depth` (0 = y-stage)."""
        return self.ys if depth == 0 else self.xs_evens[depth - 1]


@functools.lru_cache(maxsize=16)
def get_twiddles(log_size: int) -> Twiddles:
    return Twiddles(log_size)


# --- per-index host helpers (verifier-side, Python ints) --------------------

def bit_reverse_index(i: int, log_n: int) -> int:
    r = 0
    for _ in range(log_n):
        r = (r << 1) | (i & 1)
        i >>= 1
    return r


def domain_point_at_stored_index(log_size: int, stored: int):
    """Circle point of the canonic domain of log size n at *stored*
    (bit-reversed) index. stored = 2k (+1): q_k = half[bitrev(k)] (conjugated
    for odd stored indices). (SURVEY.md A.5.)"""
    m = log_size - 1
    k = stored >> 1
    nat = bit_reverse_index(k, m)
    ix, iy = _point_pow(*GENERATOR, 1 << (LOG_ORDER - 2 - m))
    sx, sy = _point_pow(*GENERATOR, 1 << (LOG_ORDER - m))
    px, py = _point_pow(sx, sy, nat)
    x = (ix * px - iy * py) % P
    y = (ix * py + iy * px) % P
    if stored & 1:
        y = (P - y) % P
    return x, y
