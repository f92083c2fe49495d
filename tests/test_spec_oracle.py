"""Tests for the pure-numpy conformance oracle (frieda_tpu.spec).

Mirrors the reference's unit tests for the ingest + commit path:
/root/reference/src/utils.rs:35-67 and src/commit.rs:24-39.
"""

import hashlib

import numpy as np
import pytest

from frieda_tpu.spec import blake2s, circle, commit as sc, field
from tests.conftest import GOLDEN_BLOB_ROOT


# ---- field sanity ----------------------------------------------------------

def test_m31_basics():
    P = field.P
    assert field.m31_mul(P - 1, P - 1) == 1
    for a in [1, 2, 12345, P - 1, 1 << 30]:
        assert field.m31_mul(a, field.m31_inv(a)) == 1


def test_qm31_mul_inv():
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = field.qm31(*(int(v) for v in rng.integers(0, field.P, 4)))
        assert field.qm31_mul(x, field.qm31_inv(x)) == field.QM31_ONE
    # u^2 = 2 + i
    u = field.qm31(0, 0, 1, 0)
    assert field.qm31_mul(u, u) == field.qm31(2, 1, 0, 0)


# ---- circle group ----------------------------------------------------------

def test_generator_on_circle_and_order():
    x, y = circle.GENERATOR
    assert (x * x + y * y) % field.P == 1
    assert circle.point_pow(circle.GENERATOR, 1 << 31) == (1, 0)
    assert circle.point_pow(circle.GENERATOR, 1 << 30) != (1, 0)


# ---- byte packing (src/utils.rs:40-66) -------------------------------------

def test_bytes_to_one_felt():
    # 30 bits of ones -> one felt 2^30 - 1; fewer bits zero-pad high.
    felts = sc.bytes_to_felts(bytes([0xFF, 0xFF, 0xFF, 0x3F]))
    # 32 bits total -> 2 felts: low 30 bits all ones, top 2 bits = 0b11 -> 3... wait
    # 0x3FFFFFFF little-endian bit stream: felt0 = 2^30-1, felt1 = 0
    assert list(felts) == [(1 << 30) - 1, 0]
    assert list(sc.bytes_to_felts(b"\x01")) == [1]
    assert list(sc.bytes_to_felts(b"\x80\x01")) == [0x180]


def test_bytes_to_two_felt():
    # 60 bits -> exactly 2 felts, little-endian 30-bit chunks
    val = (0b101 << 30) | 12345
    data = val.to_bytes(8, "little")
    felts = sc.bytes_to_felts(data)
    assert felts[0] == 12345 and felts[1] == 0b101
    assert all(f == 0 for f in felts[2:])


def test_packing_vs_bigint():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 101, dtype=np.uint8).tobytes()
    big = int.from_bytes(data, "little")
    felts = sc.bytes_to_felts(data)
    for j, f in enumerate(felts):
        assert f == (big >> (30 * j)) & ((1 << 30) - 1)


def test_polynomial_from_bytes_shapes():
    # empty input -> 4 coefficients total (log .max(2), src/utils.rs:23)
    p = sc.polynomial_from_bytes(b"")
    assert p.shape == (4, 1) and not p.any()
    # exact power of two felt count -> no padding
    data = bytes(30)  # 240 bits -> 8 felts
    p = sc.polynomial_from_bytes(data)
    assert p.shape == (4, 2)


# ---- blake2s compression ---------------------------------------------------

def test_compress_matches_hashlib_blake2s():
    """With the standard parameter-block IV, t=64, final flag set, one
    compression of a 64-byte block must equal hashlib's blake2s digest."""
    msg = bytes(range(64))
    m = [int.from_bytes(msg[4 * i : 4 * i + 4], "little") for i in range(16)]
    h0 = list(blake2s.IV)
    h0[0] ^= 0x01010020  # parameter block: digest_length=32, fanout=1, depth=1
    out = blake2s.compress_words(h0, m, t=64, final=True)
    digest = b"".join(int(w).to_bytes(4, "little") for w in out)
    assert digest == hashlib.blake2s(msg).digest()


def test_compress_batch_matches_scalar():
    rng = np.random.default_rng(2)
    m = rng.integers(0, 1 << 32, (16, 5), dtype=np.uint64).astype(np.uint32)
    batch = blake2s.compress_batch(m)
    for i in range(5):
        scalar = blake2s.raw_compress([int(w) for w in m[:, i]])
        assert list(batch[:, i]) == scalar


# ---- commit golden vectors -------------------------------------------------

def test_commit_golden_blob(blob):
    """The reference's single bit-exactness oracle (src/commit.rs:28-38)."""
    assert sc.commit(blob, 4) == GOLDEN_BLOB_ROOT


# Frozen small-size golden vectors (SURVEY.md §4 test-plan item (b)).
# Generated ONCE by this spec oracle — the same code path that reproduces the
# reference's golden blob root (test_commit_golden_blob) — and hard-coded so
# any refactor that changes a packing/FFT/ordering/hashing convention fails
# here at CPU-test speed. data = bytes((i*7 + log_felts + blowup) % 256).
SMALL_GOLDEN_ROOTS = [
    # (log_felts, log_blowup, commit root hex)
    (4, 2, "0d15e2eeaf9fd2e061fb89a75b34f9096546b374f498674b5bfb324bff802ff5"),
    (6, 1, "4d4908c5d418d46b8a97eac5b5716fd87eb257fbccf1d882b96a7d3421f30941"),
    (6, 2, "56759800e674de4bd137256575edbd743e5c3b22cbcff1c667f46ece364b6740"),
    (6, 4, "47da0d1b2e6bc48aefd26f3f7eddf7c3734a694f7ee2390572ce5799f8b90701"),
    (8, 2, "159b188278f547eea1630b8958466b5ec8777b8d5bc06f8d890cfa610550f04d"),
    (8, 4, "eb154de4b58ded8ecb0c9c097fb97ce6924ac53c2a641cfc2bd1b78673947203"),
    (10, 2, "3e1db0d82573807f77d0120df30d24d5446816854737e61058b039c89379f0eb"),
    (10, 4, "14eaf39cdbe98ca728cf9f95cb3a8df7d776afcb3affa4a48c70d27660d349ea"),
    (10, 8, "d6e42f1a4082ca12073a92bc650d9d984f7ad839beea9109ebc8b930849e95de"),
    (12, 4, "5222213a38d66fbec5bb57d9a06cf998d7b2bd7eeb535295eef2a8a4c27dead2"),
]


def _small_golden_data(log_felts: int, blowup: int) -> bytes:
    n_bytes = (1 << log_felts) * 30 // 8
    return bytes((i * 7 + log_felts + blowup) % 256 for i in range(n_bytes))


@pytest.mark.parametrize("log_felts,blowup,root_hex", SMALL_GOLDEN_ROOTS)
def test_commit_small_sizes_frozen_oracle(log_felts, blowup, root_hex):
    data = _small_golden_data(log_felts, blowup)
    assert sc.commit(data, blowup) == bytes.fromhex(root_hex)


@pytest.mark.parametrize("log_felts,blowup,root_hex", SMALL_GOLDEN_ROOTS)
def test_commit_small_sizes_frozen_jax(log_felts, blowup, root_hex):
    from frieda_tpu import api

    data = _small_golden_data(log_felts, blowup)
    assert api.commit(data, blowup) == bytes.fromhex(root_hex)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
