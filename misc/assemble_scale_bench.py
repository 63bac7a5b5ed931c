#!/usr/bin/env python3
"""Assemble-phase scale profile on a large synthetic graph.

The reference runs Barnes-Hut FDL over a thread pool
(RavenLib/src/assemble.cc:357-698) and pointer-graph walks for
transitive/tips/bubbles; this harness measures our equivalents at
fly-scale graph sizes (round-3 verdict item: "assemble wall time
reported at fly scale"), on a synthetic repeat-heavy graph:

  * a long backbone chain (post-construct contiguity),
  * junction clusters every JUNCTION_EVERY nodes (repeat entry/exit),
  * tips and 2-path bubbles sprinkled at realistic rates.

Usage: python misc/assemble_scale_bench.py [n_nodes] [--cpu]
           [--skip-long-edges]  (default 100_000)
Prints one JSON line with per-stage wall seconds.

--skip-long-edges: measure the pointer-graph passes (transitive, tips,
bubbles) without the FDL stage — the FDL is the production device
n-body (graph/layout.py) and is measured on accelerator hardware via
misc/tpu_measure.sh; on a plain CPU box the exact dense O(n^2)
repulsion is the wall, not the graph passes.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raven_tpu.graph.graph import Graph


def synth_graph(n_backbone: int, rng) -> Graph:
    g = Graph()
    codes = lambda L: rng.integers(0, 4, L).astype(np.uint8)
    # backbone chain of read-pairs (each node ~8 kb, edges ~4 kb prefix)
    chain = []
    for i in range(n_backbone):
        fwd, _ = g.new_node_pair(f"n{i}", codes(800), i)
        fwd.count = 1
        chain.append(fwd)
    for a, b in zip(chain[:-1], chain[1:]):
        g.new_edge_pair(a, b, 400, 400)

    n_tips = n_backbone // 20
    for t in range(n_tips):
        at = int(rng.integers(1, n_backbone - 1))
        tip, _ = g.new_node_pair(f"tip{t}", codes(600), -1)
        g.new_edge_pair(tip, chain[at], 300, 300)

    n_bubbles = n_backbone // 50
    for b in range(n_bubbles):
        at = int(rng.integers(1, n_backbone - 3))
        alt, _ = g.new_node_pair(f"bub{b}", codes(790), -1)
        g.new_edge_pair(chain[at], alt, 395, 395)
        g.new_edge_pair(alt, chain[at + 1], 395, 395)

    # repeat-induced long-range junction edges
    n_rep = n_backbone // 100
    for r in range(n_rep):
        a = int(rng.integers(0, n_backbone - 1))
        b = int(rng.integers(0, n_backbone - 1))
        if abs(a - b) > 2:
            g.new_edge_pair(chain[a], chain[b], 420, 420)

    g.stage = -3
    return g


def main() -> int:
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rng = np.random.default_rng(3)
    t0 = time.perf_counter()
    g = synth_graph(n, rng)
    build_s = time.perf_counter() - t0

    from raven_tpu.graph.assemble import (
        remove_long_edges_stage,
        remove_tips_and_bubbles,
        remove_transitive_edges,
    )

    skip_long = "--skip-long-edges" in sys.argv
    timings = {"n_backbone": n, "build_s": round(build_s, 2)}
    t0 = time.perf_counter()
    remove_transitive_edges(g)
    timings["transitive_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    remove_tips_and_bubbles(g)
    timings["tips_bubbles_s"] = round(time.perf_counter() - t0, 2)
    if not skip_long:
        t0 = time.perf_counter()
        remove_long_edges_stage(g)
        timings["long_edges_s"] = round(time.perf_counter() - t0, 2)
    timings["nodes_left"] = sum(1 for _ in g.live_nodes())
    timings["edges_left"] = sum(1 for _ in g.live_edges())
    print(json.dumps(timings))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
