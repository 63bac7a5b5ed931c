#!/usr/bin/env python3
"""Polishing throughput benchmark: POA bases polished/s/chip.

Builds a bank of realistic 500 bp consensus windows (~30x ONT-like
fragments each) and measures the batched device consensus pipeline
(NW + traceback kernels + host voting) against the host C++ POA engine.

Prints one json line (the driver's headline benchmark remains bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

try:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/raven_tpu_jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def log(msg):
    print(msg, file=sys.stderr)


def make_windows(n_windows: int, window: int, coverage: int, rng):
    windows = []
    total_bases = 0
    for _ in range(n_windows):
        truth = rng.integers(0, 4, window).astype(np.uint8)

        def mutate():
            keep = rng.random(window) >= 0.06  # deletions
            seg = truth[keep]
            subs = rng.random(seg.size) < 0.04
            seg = np.where(
                subs, (seg + rng.integers(1, 4, seg.size)) % 4, seg
            ).astype(np.uint8)
            ins = rng.random(seg.size) < 0.05
            out = np.repeat(seg, 1 + ins.astype(np.int64))
            return out

        backbone = mutate()
        frags = [mutate() for _ in range(coverage)]
        wts = [np.full(f.size, 11, np.uint8) for f in frags]
        windows.append((backbone, frags, wts))
        total_bases += window
    return windows, total_bases


def main() -> int:
    rng = np.random.default_rng(21)
    n_windows = int(os.environ.get("RAVEN_BENCH_POLISH_WINDOWS", 512))
    windows, total_bases = make_windows(n_windows, 500, 30, rng)
    log(f"{n_windows} windows, {total_bases} consensus bases, 30x coverage")

    # host C++ POA baseline (single process for stable definition)
    from raven_tpu.ops.poa import poa_consensus

    t0 = time.perf_counter()
    for b, f, w in windows[:64]:
        poa_consensus(b, f, w, trim=False)
    host_rate = 64 * 500 / (time.perf_counter() - t0)
    log(f"host POA: {host_rate:,.0f} bases/s")

    value = host_rate
    ratio = 1.0
    try:
        import jax

        if jax.default_backend() != "cpu":
            from raven_tpu.ops.consensus_device import device_window_consensus

            t0 = time.perf_counter()
            device_window_consensus(windows, iterations=2)
            warm = time.perf_counter() - t0
            log(f"device consensus warmup: {warm:.1f}s")
            t0 = time.perf_counter()
            device_window_consensus(windows, iterations=2)
            dt = time.perf_counter() - t0
            value = total_bases / dt
            ratio = value / host_rate
            log(f"device consensus: {value:,.0f} bases/s ({dt:.1f}s)")
    except Exception as e:
        log(f"device path unavailable ({e}); reporting host rate")

    print(
        json.dumps(
            {
                "metric": "poa_bases_polished_per_s_per_chip",
                "value": round(value),
                "unit": "bases/s",
                "vs_baseline": round(ratio, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
