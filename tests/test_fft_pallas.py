"""Fused Pallas FFT vs the XLA stage-loop path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from frieda_tpu.core import fft
from frieda_tpu.ops import fft_pallas

P = (1 << 31) - 1


@pytest.mark.parametrize("n,log_l", [(16, 14), (16, 12), (17, 13), (16, 16)])
def test_fused_matches_stage_loop(n, log_l):
    rng = np.random.default_rng(n * 100 + log_l)
    c = rng.integers(0, P, (2, 1 << log_l), dtype=np.uint32)
    c_rev = jnp.asarray(fft.bitrev_coeffs(c))
    expect = np.asarray(fft.evaluate(c_rev, fft.stage_twiddles(n)))
    got = np.asarray(fft_pallas.evaluate_fused(c_rev, n, interpret=True))
    assert np.array_equal(got, expect)
