"""Device channel must be a bit-exact twin of the host channel."""

import jax.numpy as jnp
import numpy as np

from frieda_tpu.core import device_channel as dc
from frieda_tpu.core.channel import Blake2sChannel, sample_query_positions
from frieda_tpu.core.grind import grind_host


def _words(b: bytes):
    return jnp.asarray(np.frombuffer(b, np.uint32))


def _bytes(words) -> bytes:
    return np.asarray(words).astype("<u4").tobytes()


def test_mix_u64_and_digest_match_host():
    h = Blake2sChannel()
    d = dc.fresh_digest()
    h.mix_u64(12345678901234567)
    d = dc.dc_mix_u64_const(d, 12345678901234567)
    assert _bytes(d) == h.digest
    root = bytes(range(32))
    h.mix_digest(root)
    d = dc.dc_mix_digest(d, _words(root))
    assert _bytes(d) == h.digest


def test_mix_felts_match_host():
    for k in (1, 2, 3, 5, 8):
        h = Blake2sChannel()
        h.mix_u64(7)
        d = dc.dc_mix_u64_const(dc.fresh_digest(), 7)
        felts = [(i + 1, 2 * i, 3 * i + 5, i * i) for i in range(k)]
        h.mix_felts(felts)
        d = dc.dc_mix_felts(d, jnp.asarray(felts, jnp.uint32))
        assert _bytes(d) == h.digest, k


def test_draw_felt_matches_host():
    for seed in (0, 1, 999):
        h = Blake2sChannel()
        h.mix_u64(seed)
        d = dc.dc_mix_u64_const(dc.fresh_digest(), seed)
        n_sent = jnp.uint32(0)
        for _ in range(3):
            want = h.draw_felt()
            got, n_sent = dc.dc_draw_felt(d, n_sent)
            assert tuple(int(v) for v in np.asarray(got)) == want


def test_trailing_zeros_matches_host():
    cases = [bytes(32), b"\x04" + bytes(31), b"\x00\x01" + b"\xff" * 30,
             b"\x00\x00\x00\x00\x80" + bytes(27)]
    for digest in cases:
        h = Blake2sChannel()
        h.digest = digest
        got = int(np.asarray(dc.dc_trailing_zeros(_words(digest))))
        want = h.trailing_zeros()
        assert got == min(want, 128), digest[:6]


def test_grind_matches_host():
    for seed, bits in [(3, 6), (11, 9)]:
        h = Blake2sChannel()
        h.mix_u64(seed)
        want = grind_host(h, bits)
        d = dc.dc_mix_u64_const(dc.fresh_digest(), seed)
        got = int(np.asarray(dc.dc_grind(d, bits, batch=1 << 10)))
        assert got == want


def test_query_words_match_host():
    h = Blake2sChannel()
    h.mix_u64(5)
    want = sample_query_positions(h.clone(), 12, 20)
    d = dc.dc_mix_u64_const(dc.fresh_digest(), 5)
    pos, _ = dc.dc_sample_query_words(d, jnp.uint32(0), 20, 12)
    got = sorted(set(int(p) for p in np.asarray(pos)))
    assert got == want
