#!/usr/bin/env python3
"""Profile the device overlap stage sub-phases (RAVEN_TPU_PROFILE=1).

Runs the production device path twice on the bench readset (the second
pass is steady-state: persistent compile cache warm, tunnel dialed) and
prints the per-sub-phase wall breakdown that bench.py's three coarse
numbers (minimize / filter / map) hide.

Usage: python misc/profile_overlap.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ["RAVEN_TPU_PROFILE"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/raven_tpu_jax")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> int:
    import bench

    if not bench.tpu_alive():
        print("no accelerator", file=sys.stderr)
        return 1
    readset = bench.load_or_make_readset()
    print(
        f"{len(readset)} reads, {int(readset.lengths.sum())} bases",
        file=sys.stderr,
    )
    for label in ("cold", "steady"):
        print(f"--- {label} pass ---", file=sys.stderr)
        t0 = time.perf_counter()
        wall, results, occ = bench.overlap_stage(readset, device=True)
        n = sum(int(v.size) for v in results.values())
        print(
            f"{label}: {wall:.2f}s total, {n} overlaps, occ={occ}",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
