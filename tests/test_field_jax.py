"""Device field/FFT kernels vs the spec oracle (random + boundary vectors)."""

import jax.numpy as jnp
import numpy as np

from frieda_tpu.core import fft
from frieda_tpu.core import field as jf
from frieda_tpu.spec import commit as sc
from frieda_tpu.spec import field as sf

P = sf.P
BOUNDARY = np.array(
    [0, 1, 2, 3, P - 1, P - 2, (1 << 30) - 1, 1 << 30, (1 << 30) + 1, 12345,
     0x5555AAAA % P, 0x7FFFFFFE], dtype=np.uint32,
)


def _rand(n, seed):
    return np.random.default_rng(seed).integers(0, P, n, dtype=np.uint32)


def _vectors():
    a = np.concatenate([BOUNDARY, _rand(500, 10)])
    b = np.concatenate([np.flip(BOUNDARY), _rand(500, 11)])
    # all boundary x boundary pairs too
    ga, gb = np.meshgrid(BOUNDARY, BOUNDARY)
    return (
        np.concatenate([a, ga.ravel()]),
        np.concatenate([b, gb.ravel()]),
    )


def test_m31_mul_add_sub_neg():
    a, b = _vectors()
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    assert np.array_equal(np.asarray(jf.m31_mul(ja, jb)), a.astype(np.uint64) * b % P)
    assert np.array_equal(np.asarray(jf.m31_add(ja, jb)), (a.astype(np.uint64) + b) % P)
    assert np.array_equal(
        np.asarray(jf.m31_sub(ja, jb)), (a.astype(np.int64) - b) % P
    )
    assert np.array_equal(np.asarray(jf.m31_neg(ja)), (-a.astype(np.int64)) % P)


def test_m31_inv():
    a = np.concatenate([BOUNDARY[BOUNDARY != 0], _rand(100, 12)])
    a = a[a != 0]
    inv = np.asarray(jf.m31_inv(jnp.asarray(a)))
    assert np.array_equal(a.astype(np.uint64) * inv % P, np.ones_like(a, np.uint64))


def test_qm31_mul_matches_spec():
    rng = np.random.default_rng(13)
    x = rng.integers(0, P, (4, 64), dtype=np.uint32)
    y = rng.integers(0, P, (4, 64), dtype=np.uint32)
    jx = tuple(jnp.asarray(x[i]) for i in range(4))
    jy = tuple(jnp.asarray(y[i]) for i in range(4))
    out = np.stack([np.asarray(c) for c in jf.qm31_mul(jx, jy)])
    for j in range(64):
        expect = sf.qm31_mul(tuple(int(v) for v in x[:, j]), tuple(int(v) for v in y[:, j]))
        assert tuple(out[:, j]) == expect


def test_fft_matches_spec_all_small_sizes():
    # Device path: bit-reversed coefficients in, NATURAL-order evaluations
    # out; the spec oracle produces the reference's bit-reversed storage
    # order: stored[s] == natural[bitrev(s)].
    from frieda_tpu.core.circle import bitrev_permutation

    rng = np.random.default_rng(14)
    for log_size in range(1, 11):
        tw_spec = sc.CircleTwiddles(log_size)
        twiddles = fft.stage_twiddles(log_size)
        rev = bitrev_permutation(log_size)
        for log_coeffs in {max(log_size - 2, 0), log_size}:
            c = rng.integers(0, P, 1 << log_coeffs, dtype=np.uint32)
            expect_stored = sc.evaluate_circle_poly(c.astype(np.uint64), tw_spec)
            c_rev = fft.bitrev_coeffs(c[None, :])
            got_nat = np.asarray(fft.evaluate(jnp.asarray(c_rev), twiddles))[0]
            assert np.array_equal(
                got_nat[rev], expect_stored.astype(np.uint32)
            ), (log_size, log_coeffs)


def test_fft_twiddle_tables_match_spec():
    # Natural-order tables vs the spec's bit-reversed tables.
    from frieda_tpu.core.circle import bitrev_permutation, get_twiddles

    for log_size in (2, 3, 5, 8):
        m = log_size - 1
        tw = get_twiddles(log_size)
        tw_spec = sc.CircleTwiddles(log_size)
        assert np.array_equal(tw.ys[bitrev_permutation(m)], tw_spec.ys.astype(np.uint32))
        for d, spec_layer in enumerate(tw_spec.xs_layers):
            r = m - d  # log size of spec layer d
            evens = spec_layer[0::2].astype(np.uint32)  # == L_d[bitrev_{r-1}(k)]
            if r - 1 >= 0:
                assert np.array_equal(tw.xs_layers[d][bitrev_permutation(r - 1)], evens)
        # inverses really invert
        assert np.all(tw.ys.astype(np.uint64) * tw.ys_inv % P == 1)
        for lo, inv in zip(tw.xs_layers, tw.xs_layers_inv):
            assert np.all(lo.astype(np.uint64) * inv % P == 1)
