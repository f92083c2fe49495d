"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any `import jax` (conftest is imported first by pytest).
Real-TPU execution is exercised by bench.py and __graft_entry__.py instead.
"""

import os
import pathlib

# NB: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) via a
# sitecustomize hook; the env var alone does not stick — force the platform
# through jax.config below as well.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_BLOB = pathlib.Path("/root/reference/blob")


@pytest.fixture(scope="session")
def blob() -> bytes:
    """The reference's 262,146-byte test fixture (read in place, not copied)."""
    if not REFERENCE_BLOB.exists():
        pytest.skip("reference blob fixture not available")
    return REFERENCE_BLOB.read_bytes()


GOLDEN_BLOB_ROOT = bytes.fromhex(
    "d1a2d5069dc587e55dc29cc6255af937ff7fed0ee41bdf5af98717f9d74f60e8"
)
