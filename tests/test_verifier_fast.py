"""Cross-checks for the vectorized light-client verifier helpers.

The fast verifier path (core/npfield.py, circle.line_x_batch /
line_x_inv_batch, merkle.verify_openings_rows + the native walk,
fri._eval_line_poly_batch) must agree bit-for-bit with the scalar
first-principles forms it replaced."""

import numpy as np
import pytest

from frieda_tpu.core import circle as hostcircle
from frieda_tpu.core import fri, merkle, npfield
from frieda_tpu.spec import field as sf

RNG = np.random.default_rng(7)
P = sf.P


def rand_qm31(m):
    return RNG.integers(0, P, size=(m, 4), dtype=np.uint64)


def test_npfield_qm31_mul_matches_spec():
    xs, ys = rand_qm31(64), rand_qm31(64)
    got = npfield.qm31_mul(xs, ys)
    for i in range(64):
        want = sf.qm31_mul(tuple(int(v) for v in xs[i]), tuple(int(v) for v in ys[i]))
        assert tuple(int(v) for v in got[i]) == want


def test_npfield_inv_and_bitrev():
    a = RNG.integers(1, P, size=100, dtype=np.uint64)
    inv = npfield.m31_inv(a)
    assert np.all(a * inv % P == 1)
    js = RNG.integers(0, 1 << 17, size=50, dtype=np.uint64)
    got = hostcircle._bitrev_arr(js, 17)
    for j, g in zip(js, got):
        assert int(g) == hostcircle.bit_reverse_index(int(j), 17)


@pytest.mark.parametrize("n", [5, 8, 12])
def test_line_x_batch_matches_scalar(n):
    for layer in range(0, n - 1):
        size = 1 << (n - 1 - layer)
        js = np.unique(RNG.integers(0, size, size=min(16, size), dtype=np.int64))
        got = hostcircle.line_x_batch(n, layer, js)
        inv = hostcircle.line_x_inv_batch(n, layer, js)
        for j, g, iv in zip(js, got, inv):
            assert int(g) == fri._line_x_at(n, layer, int(j))
            assert int(g) * int(iv) % P == (1 if g else 0)


def test_eval_line_poly_batch_matches_scalar():
    for log_b in (0, 1, 3):
        coeffs = [tuple(int(v) for v in r) for r in rand_qm31(1 << log_b)]
        xs = RNG.integers(0, P, size=9, dtype=np.uint64)
        got = fri._eval_line_poly_batch(coeffs, xs)
        for i, x in enumerate(xs):
            want = fri._eval_line_poly(coeffs, int(x))
            assert tuple(int(v) for v in got[i]) == want


def test_verify_openings_rows_native_matches_numpy(monkeypatch):
    """Build a real tree, open a few leaves, and check the native walk and
    the numpy fallback agree (including tamper rejection)."""
    log_n = 6
    nleaves = 1 << log_n
    cols = RNG.integers(0, P, size=(4, nleaves), dtype=np.uint64).astype(np.uint32)
    # host-built tree in stored order: leaf i = compress(cols[:, i] || 0*12)
    msgs = np.zeros((nleaves, 16), np.uint32)
    msgs[:, :4] = cols.T
    level = merkle.compress_rows_host(msgs)
    levels = [level]
    while level.shape[0] > 1:
        half = level.shape[0] // 2
        pair = np.concatenate([level[0::2], level[1::2]], axis=1)
        level = merkle.compress_rows_host(pair)
        levels.append(level)
    root = levels[-1][0].tobytes()

    opened = [3, 10, 11, 40]
    plans = fri._merkle_witness_plans(log_n, opened)
    wit = []
    for k, sibs in enumerate(plans):
        for s in sibs:
            wit.append(levels[k][s].tobytes())
    rows = levels[0][opened]

    def run():
        return merkle.verify_openings_rows(root, log_n, list(opened), rows, wit)

    assert run()
    # numpy fallback path must agree
    monkeypatch.setattr(merkle, "_NATIVE", None)
    assert run()
    monkeypatch.setattr(merkle, "_NATIVE", False)

    bad_wit = list(wit)
    bad_wit[0] = bytes(32)
    assert not merkle.verify_openings_rows(root, log_n, list(opened), rows, bad_wit)
    assert not merkle.verify_openings_rows(root, log_n, list(opened), rows, wit[:-1])
    assert not merkle.verify_openings_rows(
        root, log_n, list(opened), rows, wit + [bytes(32)]
    )
    monkeypatch.setattr(merkle, "_NATIVE", None)
    assert not merkle.verify_openings_rows(root, log_n, list(opened), rows, bad_wit)
    assert not merkle.verify_openings_rows(root, log_n, list(opened), rows, wit[:-1])
    assert not merkle.verify_openings_rows(
        root, log_n, list(opened), rows, wit + [bytes(32)]
    )
    monkeypatch.setattr(merkle, "_NATIVE", False)
