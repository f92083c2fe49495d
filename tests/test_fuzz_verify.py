"""Fuzz `verify` against malformed proofs.

Reference semantics: FriVerifier::commit is fallible — any malformed proof
makes `verify` return false, never crash (/root/reference/src/proof.rs:84-91).
The single deliberate exception is the short-evaluations panic quirk
(src/proof.rs:166-173), surfaced here as IndexError.

Two layers are fuzzed:
  * wire bytes — random byte mutations of a serialized proof must either be
    rejected at the `Proof.from_bytes` boundary (ValueError) or produce a
    Proof object `verify` returns False on (or IndexError for the quirk);
  * object fields — targeted structural corruption of a parsed Proof.
"""

import numpy as np
import pytest

from frieda_tpu import api
from frieda_tpu.config import FriConfig, PcsConfig
from frieda_tpu.core.proof import Proof

CFG = PcsConfig(pow_bits=4, fri_config=FriConfig(2, 0, 8))
DATA = bytes((i * 11 + 5) % 256 for i in range(2048))
SEED = 7


@pytest.fixture(scope="module")
def wire():
    _, proof = api.commit_and_prove(DATA, SEED, CFG)
    assert api.verify(proof, SEED)
    return proof.to_bytes()


def _check_mutant(blob: bytes, original: bytes):
    """One fuzz probe. Returns the outcome tag; raises on any contract
    violation (uncaught exception class)."""
    try:
        proof = Proof.from_bytes(blob)
    except ValueError:
        return "parse-rejected"
    try:
        ok = api.verify(proof, SEED)
    except IndexError:
        return "panic-quirk"  # deliberate reference parity
    assert ok in (True, False)
    if ok and blob != original:
        # A mutated wire image must not verify (every byte of the wire
        # format is semantically load-bearing).
        raise AssertionError(f"mutant verified: {blob.hex()[:64]}...")
    return "verified" if ok else "rejected"


def test_byte_mutation_fuzz(wire):
    rng = np.random.default_rng(0xF12EDA)
    outcomes = {}
    for _ in range(1000):
        buf = bytearray(wire)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(buf)))
            buf[pos] ^= int(rng.integers(1, 256))
        tag = _check_mutant(bytes(buf), wire)
        outcomes[tag] = outcomes.get(tag, 0) + 1
    assert outcomes.get("verified", 0) == 0
    # the fuzzer must actually exercise both layers
    assert outcomes.get("rejected", 0) > 0


def test_truncation_fuzz(wire):
    rng = np.random.default_rng(1)
    for _ in range(100):
        cut = int(rng.integers(0, len(wire)))
        _check_mutant(wire[:cut], wire)
        _check_mutant(wire[:cut] + bytes(3), wire)


def test_structural_corruption(wire):
    proof = Proof.from_bytes(wire)

    bad = Proof.from_bytes(wire)
    bad.proof.first_layer.commitment = b"\x01" * 31  # wrong length
    assert api.verify(bad, SEED) is False

    bad = Proof.from_bytes(wire)
    bad.proof.inner_layers[0].commitment = "deadbeef"  # wrong type
    assert api.verify(bad, SEED) is False

    bad = Proof.from_bytes(wire)
    bad.proof.first_layer.fri_witness.append((1, 2, 3))  # arity-3 "QM31"
    assert api.verify(bad, SEED) is False

    bad = Proof.from_bytes(wire)
    bad.proof.last_layer_poly = [((1 << 31) - 1, 0, 0, 0)]  # felt == P
    assert api.verify(bad, SEED) is False

    bad = Proof.from_bytes(wire)
    bad.log_size_bound = 10**6
    assert api.verify(bad, SEED) is False

    bad = Proof.from_bytes(wire)
    bad.proof_of_work = -1
    assert api.verify(bad, SEED) is False

    bad = Proof.from_bytes(wire)
    bad.evaluations = bad.evaluations + [(0, 0, 0, 0)]  # extras => invalid
    assert api.verify(bad, SEED) is False

    # deliberate quirk: SHORTER evaluations still panic (IndexError)
    bad = Proof.from_bytes(wire)
    bad.evaluations = bad.evaluations[:-1]
    with pytest.raises(IndexError):
        api.verify(bad, SEED)

    # boundary validation: out-of-field felts are rejected at parse time
    corrupt = bytearray(wire)
    assert api.verify(proof, SEED)


def test_from_dict_validation(wire):
    proof = Proof.from_bytes(wire)
    d = proof.to_dict()
    d["pcs_config"]["pow_bits"] = 10**9
    with pytest.raises(ValueError):
        Proof.from_dict(d)

    d = proof.to_dict()
    d["proof"]["first_layer"]["commitment"] = "ab"  # 1 byte
    with pytest.raises(ValueError):
        Proof.from_dict(d)

    d = proof.to_dict()
    d["evaluations"][0] = [1 << 31, 0, 0, 0]  # >= P
    with pytest.raises(ValueError):
        Proof.from_dict(d)
