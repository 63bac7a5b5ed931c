"""Multi-host initialization and 2-axis mesh layout.

Multi-host runs (SURVEY §2.4's TPU mapping: reads data-parallel across
hosts, minimizer index sharded by hash range within the slice) initialize
jax.distributed and lay the devices out as a ('data', 'shard') mesh:
collectives over 'shard' ride ICI inside a slice, 'data' reductions cross
DCN.  Single-host/virtual-device runs use the same code path with
n_data * n_shard <= local device count.
"""

from __future__ import annotations

import os


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed bootstrap (no-op when already initialized or when
    the env provides no coordinator)."""
    import jax

    coordinator = coordinator or os.environ.get("RAVEN_TPU_COORDINATOR")
    if coordinator is None:
        return
    kwargs = {}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(coordinator, **kwargs)
    except RuntimeError:
        pass  # already initialized


def make_data_shard_mesh(n_data: int, n_shard: int):
    """('data', 'shard') mesh over the first n_data * n_shard devices."""
    import jax

    devices = jax.devices()
    need = n_data * n_shard
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    return jax.make_mesh((n_data, n_shard), ("data", "shard"),
                         devices=devices[:need])
