"""Device mesh helpers for the sharded overlap engine."""

from __future__ import annotations

import numpy as np

try:
    import jax

    from raven_tpu.utils.jaxcfg import ensure_jax_cache

    ensure_jax_cache()  # persistent compile cache (jax may be preloaded)
    HAS_JAX = True
except Exception:  # pragma: no cover
    HAS_JAX = False


def make_mesh(n_devices: int | None = None, axis: str = "shard"):
    """1-D mesh over the first n devices (index axis).

    Multi-host layouts add a second 'data' axis (reads data-parallel across
    hosts, index sharded by hash range within the slice); single-slice runs
    use the 1-D form.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return jax.make_mesh((n_devices,), (axis,), devices=devices[:n_devices])
