"""Fused Pallas FFT vs the XLA stage-loop path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from frieda_tpu.core import fft
from frieda_tpu.ops import fft_pallas

P = (1 << 31) - 1


# (16,14)/(16,12)/(17,13) take the dilation-fused low pass (dil 4/16/16);
# (16,16) has no dilation; (14,9) has blk//dil < 8 -> broadcast fallback.
@pytest.mark.parametrize("n,log_l", [(16, 14), (16, 12), (17, 13), (16, 16),
                                     (14, 9)])
def test_fused_matches_stage_loop(n, log_l):
    rng = np.random.default_rng(n * 100 + log_l)
    c = rng.integers(0, P, (2, 1 << log_l), dtype=np.uint32)
    c_rev = jnp.asarray(fft.bitrev_coeffs(c))
    expect = np.asarray(fft.evaluate(c_rev, fft.stage_twiddles(n)))
    got = np.asarray(fft_pallas.evaluate_fused(c_rev, n, interpret=True))
    assert np.array_equal(got, expect)


def test_fused_multi_group_plan(monkeypatch):
    """Shrink the group caps so an interpret-mode size exercises the
    low pass + several mid passes (the structure large domains compile)."""
    monkeypatch.setattr(fft_pallas, "GROUP_BITS_MAX", 4)
    monkeypatch.setattr(fft_pallas, "LOW_BITS_MAX", 7)
    fft_pallas._pass_plan.cache_clear()
    fft_pallas._twiddle_tables.cache_clear()
    try:
        n, log_l = 14, 12
        p_min, c0, groups = fft_pallas._pass_plan(n, log_l)
        assert len(groups) >= 2
        rng = np.random.default_rng(7)
        c = rng.integers(0, P, (2, 1 << log_l), dtype=np.uint32)
        c_rev = jnp.asarray(fft.bitrev_coeffs(c))
        expect = np.asarray(fft.evaluate(c_rev, fft.stage_twiddles(n)))
        got = np.asarray(fft_pallas.evaluate_fused(c_rev, n, interpret=True))
        assert np.array_equal(got, expect)
    finally:
        fft_pallas._pass_plan.cache_clear()
        fft_pallas._twiddle_tables.cache_clear()
