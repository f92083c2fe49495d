"""Fiat-Shamir channel + proof-of-work grind tests (SURVEY.md B.2/B.3)."""

import numpy as np

from frieda_tpu.core.channel import Blake2sChannel, sample_query_positions
from frieda_tpu.core.grind import grind_device, grind_host

P = (1 << 31) - 1


def test_channel_determinism_and_domain_separation():
    c1, c2 = Blake2sChannel(), Blake2sChannel()
    c1.mix_u64(5)
    c2.mix_u64(5)
    assert c1.digest == c2.digest
    c2.mix_u64(6)
    assert c1.digest != c2.digest
    # draws are counter-separated and change after a mix
    a = c1.draw_random_bytes()
    b = c1.draw_random_bytes()
    assert a != b
    c1.mix_u64(1)
    assert c1.n_sent == 0


def test_draw_felt_is_canonical():
    c = Blake2sChannel()
    c.mix_u64(123)
    for _ in range(50):
        f = c.draw_felt()
        assert len(f) == 4 and all(0 <= v < P for v in f)


def test_trailing_zeros():
    c = Blake2sChannel()
    c.digest = b"\x00" * 32
    assert c.trailing_zeros() == 128
    c.digest = b"\x04" + b"\x00" * 31
    assert c.trailing_zeros() == 2
    c.digest = b"\x00\x01" + b"\xff" * 30
    assert c.trailing_zeros() == 8


def test_query_positions_sorted_unique_and_seedbound():
    c = Blake2sChannel()
    c.mix_u64(1)
    q = sample_query_positions(c.clone(), 10, 20)
    assert q == sorted(set(q))
    assert all(0 <= p < 1024 for p in q)
    c2 = Blake2sChannel()
    c2.mix_u64(2)
    q2 = sample_query_positions(c2, 10, 20)
    assert q != q2


def test_grind_device_matches_host_minimum():
    for seed, bits in [(0, 6), (1, 8), (2, 10), (99, 12)]:
        ch = Blake2sChannel()
        ch.mix_u64(seed)
        want = grind_host(ch, bits)
        got = grind_device(ch, bits, batch=1 << 12)
        assert got == want, (seed, bits)
        # verifier-side check passes
        c2 = ch.clone()
        c2.mix_u64(got)
        assert c2.trailing_zeros() >= bits


def test_grind_minimality():
    ch = Blake2sChannel()
    ch.mix_u64(7)
    nonce = grind_device(ch, 9, batch=1 << 10)
    for smaller in range(max(0, nonce - 64), nonce):
        c = ch.clone()
        c.mix_u64(smaller)
        assert c.trailing_zeros() < 9
