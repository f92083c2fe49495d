"""frieda-tpu: TPU-native FRIDA data-availability-sampling framework.

See README.md. Public entry points live in frieda_tpu.api.
"""

import os as _os
import pathlib as _pathlib


def _setup_compile_cache():
    """Persistent XLA compile cache. The axon sitecustomize initializes JAX
    before user env vars are honored, so set it through the config API."""
    try:
        import jax

        cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            str(_pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


_setup_compile_cache()

from . import api  # noqa: E402,F401
from .config import DEFAULT_CONFIG, FriConfig, PcsConfig  # noqa: E402,F401
