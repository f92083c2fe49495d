"""Pure-Python/numpy conformance oracle for the FRIDA protocol.

Everything in this subpackage is a transparent re-derivation of the reference
semantics (SURVEY.md Appendices A/B), independent of the JAX production path,
and is what the production kernels are tested against.
"""

from . import blake2s, circle, commit, field  # noqa: F401
