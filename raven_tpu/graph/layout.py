"""Force-directed graph layout (Fruchterman-Reingold).

Reference: CreateForceDirectedLayout (RavenLib/src/assemble.cc:357-698),
which uses a Barnes-Hut quadtree over a thread pool.  The TPU-native
re-design computes the exact dense O(n^2) repulsion as batched array ops — on
accelerators the dense form is faster than tree traversal for the component
sizes seen after CreateUnitigs(42), and it is exact rather than approximated.

Determinism: the reference seeds a static mt19937 with 21 and left-shifts
the seed on every invocation (assemble.cc:405-408).  We reproduce the seed
schedule (21 << n on the n-th call) with numpy's PCG64; layouts are
deterministic run-to-run for our implementation (bit-parity with the C++
RNG stream is not a goal — weights only feed a relative 2x comparison).
"""

from __future__ import annotations

import json

import numpy as np

_seed_state = {"seed": 21}


def _next_seed() -> int:
    _seed_state["seed"] <<= 1
    return _seed_state["seed"]


def reset_seed(value: int = 21) -> None:
    _seed_state["seed"] = value


def _layout_component(
    points: np.ndarray, edges_a: np.ndarray, edges_b: np.ndarray, num_iterations: int
) -> np.ndarray:
    """Run FDL iterations on one component.

    points: [n, 2]; edges_a/b: int arrays of point indices for every
    attractive link (graph edges + transitive hints), directed per node as in
    the reference (each node accumulates attraction towards each neighbour).
    """
    n = points.shape[0]
    k = np.sqrt(1.0 / n)
    t = 0.1
    dt = t / (num_iterations + 1)

    for _ in range(num_iterations):
        delta = points[:, None, :] - points[None, :, :]  # [n, n, 2]
        dist2 = (delta**2).sum(-1)
        np.fill_diagonal(dist2, 1.0)
        inv = (k * k) / np.maximum(dist2, 1e-8)
        np.fill_diagonal(inv, 0.0)
        repulse = (delta * inv[:, :, None]).sum(axis=1)

        # attraction along links: displacement += delta * (-dist / k)
        d_ab = points[edges_a] - points[edges_b]
        dist = np.sqrt((d_ab**2).sum(-1))
        dist = np.maximum(dist, 0.01)
        contrib = d_ab * (-dist / k)[:, None]
        attract = np.zeros_like(points)
        np.add.at(attract, edges_a, contrib)

        disp = repulse + attract
        length = np.sqrt((disp**2).sum(-1))
        length = np.where(length < 0.01, 0.1, length)  # reference quirk :594-597
        points = points + disp * (t / length)[:, None]
        t -= dt
    return points


def create_force_directed_layout(graph, path: str = "", num_iterations: int = 100):
    """Assign 2-D layout distances to edge weights (assemble.cc:357-698).

    Components smaller than 6 canonical nodes or without junctions are
    skipped; transitive hints are pruned to the component.  When `path` is
    given, a JSON dump compatible with misc/plotter.py is written.
    """
    # connected components over canonical (even) node ids
    components: list[list[int]] = []
    is_visited: set[int] = set()
    for i, node in enumerate(graph.nodes):
        if node is None or i in is_visited:
            continue
        comp = set()
        que = [i]
        while que:
            j = que.pop(0)
            if j in is_visited:
                continue
            n = graph.nodes[j]
            is_visited.add(n.id)
            is_visited.add(n.pair.id)
            comp.add((n.id >> 1) << 1)
            for e in n.inedges:
                que.append(e.tail.id)
            for e in n.outedges:
                que.append(e.head.id)
        components.append(sorted(comp))

    components.sort(key=len, reverse=True)

    rng = np.random.default_rng(_next_seed())
    dump = {}
    comp_counter = 0

    for component in components:
        if len(component) < 6:
            continue
        if not any(graph.nodes[c].is_junction for c in component):
            continue

        comp_set = set(component)
        for c in component:  # prune transitive hints to the component
            node = graph.nodes[c]
            node.transitive = {m for m in node.transitive if m in comp_set}

        local = {c: idx for idx, c in enumerate(component)}
        points = rng.random((len(component), 2))

        ea, eb = [], []
        for c in component:
            node = graph.nodes[c]
            for e in node.inedges:
                ea.append(local[c])
                eb.append(local[(e.tail.id >> 1) << 1])
            for e in node.outedges:
                ea.append(local[c])
                eb.append(local[(e.head.id >> 1) << 1])
            for m in node.transitive:
                ea.append(local[c])
                eb.append(local[m])
        ea = np.array(ea, dtype=np.int64)
        eb = np.array(eb, dtype=np.int64)

        points = _layout_component(points, ea, eb, num_iterations)

        for e in graph.live_edges():
            if e.id & 1:
                continue
            a = (e.tail.id >> 1) << 1
            b = (e.head.id >> 1) << 1
            if a in comp_set and b in comp_set:
                w = float(np.hypot(*(points[local[a]] - points[local[b]])))
                e.weight = w
                e.pair.weight = w

        if path:
            nodes_json = {
                str(c): [
                    float(points[local[c]][0]),
                    float(points[local[c]][1]),
                    1 if graph.nodes[c].is_junction else 0,
                    graph.nodes[c].count,
                ]
                for c in component
            }
            edges_json = []
            for c in component:
                node = graph.nodes[c]
                for e in node.inedges:
                    o = (e.tail.id >> 1) << 1
                    if c >= o:
                        edges_json.append([str(c), str(o), 0])
                for e in node.outedges:
                    o = (e.head.id >> 1) << 1
                    if c >= o:
                        edges_json.append([str(c), str(o), 0])
                for o in node.transitive:
                    if c >= o:
                        edges_json.append([str(c), str(o), 1])
            dump[f"component_{comp_counter}"] = {
                "nodes": nodes_json,
                "edges": edges_json,
            }
            comp_counter += 1

    if path:
        with open(path, "w") as fh:
            json.dump(dump, fh, indent=4)
