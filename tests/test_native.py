"""Native (C++) host runtime vs the Python/numpy oracle — bit-exact."""

import hashlib

import numpy as np
import pytest

from frieda_tpu import native
from frieda_tpu.core.channel import Blake2sChannel
from frieda_tpu.core.grind import grind_host
from frieda_tpu.spec import blake2s as sb
from frieda_tpu.spec import commit as sc

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_blake2s256_matches_hashlib():
    for data in (b"", b"a", bytes(range(64)), bytes(range(200)), b"x" * 1000):
        assert native.blake2s256(data) == hashlib.blake2s(data).digest()


def test_raw_compress_matches_oracle():
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 1 << 32, (17, 16), dtype=np.uint64).astype(np.uint32)
    out = native.raw_compress_batch(msgs)
    expect = sb.compress_batch(msgs.T).T
    assert np.array_equal(out, expect)


def test_channel_mix_matches_host_channel():
    ch = Blake2sChannel()
    ch.mix_u64(77)
    d = native.channel_mix(bytes(32), (77).to_bytes(8, "little"))
    assert d == ch.digest


def test_grind_matches_host():
    ch = Blake2sChannel()
    ch.mix_u64(5)
    assert native.grind(ch.digest, 10) == grind_host(ch, 10)


def test_bytes_to_felts_matches_oracle():
    rng = np.random.default_rng(1)
    for size in (0, 1, 15, 16, 100, 4096):
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        assert np.array_equal(native.bytes_to_felts(data), sc.bytes_to_felts(data))


def test_bitrev():
    arr = np.arange(16, dtype=np.uint32)
    out = native.bitrev_u32(arr, 4)
    from frieda_tpu.core.circle import bitrev_permutation

    assert np.array_equal(out, arr[bitrev_permutation(4)])


def test_hash_pair_matches_spec_oracle():
    """Compare native.hash_pair against the pure-Python spec compression
    directly (merkle.hash_pair itself routes to native when available, so
    going through it would compare native against itself)."""
    left, right = bytes(range(32)), bytes(range(32, 64))
    m = [int.from_bytes(left[4 * i : 4 * i + 4], "little") for i in range(8)]
    m += [int.from_bytes(right[4 * i : 4 * i + 4], "little") for i in range(8)]
    expect = b"".join(int(w).to_bytes(4, "little") for w in sb.raw_compress(m))
    assert native.hash_pair(left, right) == expect
