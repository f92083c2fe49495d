"""JAX commit path vs spec oracle and the reference's golden vector."""

import numpy as np
import pytest

from frieda_tpu import api
from frieda_tpu.spec import commit as sc
from frieda_tpu.utils import packing
from tests.conftest import GOLDEN_BLOB_ROOT


def test_packing_matches_spec():
    rng = np.random.default_rng(3)
    for size in (0, 1, 14, 15, 16, 29, 30, 31, 100, 4097):
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        assert np.array_equal(packing.bytes_to_felts(data), sc.bytes_to_felts(data))
        assert np.array_equal(
            packing.polynomial_from_bytes(data), sc.polynomial_from_bytes(data)
        )


@pytest.mark.parametrize("size,log_blowup", [(0, 2), (1, 2), (64, 1), (333, 3), (1024, 4), (4096, 2)])
def test_commit_matches_oracle(size, log_blowup):
    data = bytes((i * 31 + size) % 256 for i in range(size))
    assert api.commit(data, log_blowup) == sc.commit(data, log_blowup)


@pytest.mark.parametrize("size", [0, 1, 15, 59, 60, 61, 1024, 9999])
def test_device_ingest_rev_matches_host_path(size):
    """Fused word-gather ingest == host packer + bit-reversal, all sizes."""
    import jax.numpy as jnp

    from frieda_tpu.core import fft

    rng = np.random.default_rng(size)
    data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    log_total = packing.log_total_for(len(data))
    log_size = log_total - 2
    expect = fft.bitrev_coeffs(packing.polynomial_from_bytes(data))
    got = np.asarray(
        packing.device_ingest_rev(
            jnp.asarray(packing.pad_to_words(data, log_total)), log_size
        )
    )
    assert np.array_equal(got, expect)


@pytest.mark.parametrize("log_size", [9, 11])
def test_ingest_pallas_rows_match_xla_path(log_size):
    """The fused Pallas ingest kernel (interpret mode on CPU; the small
    shift/or body is cheap to interpret, unlike the unrolled blake kernels)
    must produce exactly the XLA unpack+bitrev result after the shared
    per-row bit-reversal."""
    import jax.numpy as jnp

    from frieda_tpu.ops import ingest_pallas

    rng = np.random.default_rng(log_size)
    total = 1 << (log_size + 2)
    data = rng.integers(0, 256, total * 30 // 8, dtype=np.uint8).tobytes()
    words = jnp.asarray(packing.pad_to_words(data, log_size + 2))
    expect = np.asarray(
        packing.bitrev_rows_device(
            packing.device_unpack_blocks(words, log_size + 2), log_size
        )
    )
    pre = ingest_pallas.ingest_rows(words, log_size, interpret=True)
    got = np.asarray(
        packing.bitrev_rows_device(pre, log_size - 4).reshape(4, 1 << log_size)
    )
    assert np.array_equal(got, expect)


@pytest.mark.slow
def test_commit_golden_blob_jax(blob):
    # The reference's golden vector (src/commit.rs:28-38) on the JAX path.
    assert api.commit(blob, 4) == GOLDEN_BLOB_ROOT
