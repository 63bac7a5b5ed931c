#!/usr/bin/env python3
"""One process of a multi-process jax.distributed CPU run.

Used by tests/test_distributed.py (2-process coordinator test) and
misc/scaling_bench.py (multi-process scaling harness).  Each process
owns `devices_per_proc` virtual CPU devices; the processes form one
global mesh and run the sharded overlap candidate step across the
process boundary (all-to-all + psum over gloo collectives).

  python misc/distributed_worker.py PID NPROC COORD [devices_per_proc]

Prints one JSON line: {"pid", "nproc", "ndev", "pairs", "pairs_per_s"}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    dev_per_proc = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={dev_per_proc}"
        ).strip()

    import numpy as np

    import jax

    try:  # jax may be preloaded with another platform baked in
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from raven_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    ndev = jax.device_count()
    assert ndev == nproc * dev_per_proc, ndev

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from raven_tpu.parallel.mesh import make_mesh
    from raven_tpu.parallel.sharded_index import sharded_candidate_step

    mesh = make_mesh(ndev)
    axis = mesh.axis_names[0]

    # deterministic FIXED workload, identical on every process and every
    # cluster size (strong scaling: efficiency = rate ratio / device ratio)
    B, L, k, w = 32, 512, 15, 5
    assert B % ndev == 0, (B, ndev)
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 4096).astype(np.uint32)
    codes = np.zeros((B, L), dtype=np.uint32)
    for b in range(B):
        s = int(rng.integers(0, genome.size - L))
        codes[b] = genome[s : s + L]
    lengths = np.full(B, L, dtype=np.int32)
    read_ids = np.arange(B, dtype=np.int32)

    shard1 = NamedSharding(mesh, P(axis))
    shard2 = NamedSharding(mesh, P(axis, None))
    rows = B // nproc  # this process's slice of the batch axis

    def dist(x, sh):
        return jax.make_array_from_process_local_data(
            sh, x[pid * rows : (pid + 1) * rows]
        )

    capacity = (B // ndev) * L  # >= the local shard's minimizer count
    step = sharded_candidate_step(
        mesh, k=k, w=w, capacity=capacity, occurrence=1000
    )
    args = (
        dist(codes, shard2),
        dist(lengths, shard1),
        dist(read_ids, shard1),
    )
    pairs = int(step(*args))  # compile + run
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        pairs = int(step(*args))
    dt = (time.perf_counter() - t0) / reps

    # sharded polish across the process boundary: fragment chunks shard
    # over the global mesh, vote tables psum over gloo — output must be
    # bit-identical to the process-local single-device path (BASELINE
    # polishing ladder: 1 chip / 1 host / N hosts)
    from raven_tpu.ops.consensus_device import device_window_consensus

    wins = []
    for _ in range(4):
        truth = rng.integers(0, 4, 200).astype(np.uint8)
        frags = [
            np.where(
                rng.random(200) < 0.05, (truth + 1) % 4, truth
            ).astype(np.uint8)
            for _ in range(8)
        ]
        wins.append((truth.copy(), frags, None))
    local = device_window_consensus(
        wins, iterations=1, t_pad=256, q_pad=256, chunk=8
    )
    # warm the sharded executable before timing (compile + gloo setup
    # would otherwise dominate cons_dt)
    sharded = device_window_consensus(
        wins, iterations=1, t_pad=256, q_pad=256, chunk=8, mesh=mesh
    )
    t0 = time.perf_counter()
    sharded = device_window_consensus(
        wins, iterations=1, t_pad=256, q_pad=256, chunk=8, mesh=mesh
    )
    cons_dt = time.perf_counter() - t0
    consensus_ok = all(
        np.array_equal(a, b) for a, b in zip(local, sharded)
    )
    cons_bases = sum(len(c) for c in sharded)

    # the production polish default (shift-banded resident engine) under
    # the same cross-process contract
    from raven_tpu.ops.consensus_band import band_window_consensus

    bwins = [
        (bb, frs, wts, [(0, f.size) for f in frs])
        for bb, frs, wts in wins
    ]
    b_local = band_window_consensus(
        bwins, iterations=1, t_pad=256, q_pad=256
    )
    b_sharded = band_window_consensus(
        bwins, iterations=1, t_pad=256, q_pad=256, mesh=mesh
    )
    consensus_ok = consensus_ok and all(
        np.array_equal(a, b) for a, b in zip(b_local, b_sharded)
    )

    print(
        json.dumps(
            {
                "pid": pid,
                "nproc": nproc,
                "ndev": ndev,
                "pairs": pairs,
                "pairs_per_s": round(pairs / dt),
                "consensus_ok": consensus_ok,
                "consensus_bases_per_s": round(cons_bases / cons_dt),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
