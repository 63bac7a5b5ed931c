"""Process-wide JAX configuration for the device paths.

jax may be preloaded before raven_tpu imports (the axon plugin registers at
interpreter startup), so environment variables like JAX_COMPILATION_CACHE_DIR
are read too early — the persistent compile cache must be enabled through
jax.config at first device use.  Every raven_tpu module that dispatches to
the device calls ensure_jax_cache() once; repeat calls are free.
"""

from __future__ import annotations

import os

_DONE = False

CACHE_DIR = os.environ.get(
    "RAVEN_TPU_JAX_CACHE", "/root/.cache/raven_tpu_jax"
)


def jax_initialized() -> bool:
    """True when a jax backend already exists in this process (forking
    after that can deadlock children on inherited locks)."""
    try:
        import sys

        xb = sys.modules.get("jax._src.xla_bridge")
        return bool(xb is not None and getattr(xb, "_backends", None))
    except Exception:
        return True


def ensure_jax_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
