"""Frozen proof-transcript golden vectors (VERDICT r3 item 5).

The proof path is a first-principles reconstruction of the reference's
Fiat-Shamir transcript (SURVEY.md App. B); these vectors pin TODAY'S exact
wire bytes so any refactor that silently changes channel mixing, folding,
grinding, query sampling, decommitment ordering, or serialization fails
loudly here — the analogue of the reference's hard-coded commit vector
(/root/reference/src/commit.rs:28-38), extended to the full proof wire.

Regenerating: only legitimate after a DELIBERATE, documented transcript
change — rerun the generator block at the bottom and review the diff.
"""

import hashlib
import json
import pathlib

import numpy as np
import pytest

from frieda_tpu import api
from frieda_tpu.config import PcsConfig

DATA = pathlib.Path(__file__).parent / "data" / "frozen_proofs.json"


def _synth(n: int, offset: int) -> bytes:
    return ((np.arange(n, dtype=np.uint32) + offset) % 256).astype(np.uint8).tobytes()


def _cases():
    with open(DATA) as f:
        return json.load(f)


@pytest.mark.parametrize("case", _cases(), ids=lambda c: c["name"])
def test_frozen_proof_wire_bytes(case):
    data = _synth(case["data_len"], case["data_seed_offset"])
    cfg = PcsConfig.from_dict(case["config"])
    commitment, proof = api.commit_and_prove(data, case["seed"], cfg)
    wire = proof.to_bytes()
    assert commitment.hex() == case["commitment"], (
        "commitment drifted from frozen vector — transcript semantics changed"
    )
    assert len(wire) == case["wire_len"]
    assert hashlib.blake2s(wire).hexdigest() == case["wire_blake"]
    assert wire.hex() == case["wire_hex"], (
        "proof wire bytes drifted from frozen vector — channel/fold/grind/"
        "query/serde semantics changed; see module docstring before regenerating"
    )
    # The frozen bytes themselves must still verify (guards against freezing
    # a broken transcript).
    assert api.verify(type(proof).from_bytes(bytes.fromhex(case["wire_hex"])),
                      case["seed"])
