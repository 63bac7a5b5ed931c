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


# components at least this large run the device n-body (one jitted
# dispatch per component, blocked O(n^2/blk) memory); smaller ones are
# faster as plain numpy than as a device round trip (measured: at n=1500
# the jitted path is ~8x the uncontended host numpy, 75x under load)
_DEVICE_MIN_NODES = 512
# above this, the [n, n, 2] host materialization is replaced by the
# blocked host loop (memory-safe at any n)
_HOST_DENSE_MAX = 4096


def _layout_component_host(
    points: np.ndarray, edges_a: np.ndarray, edges_b: np.ndarray, num_iterations: int
) -> np.ndarray:
    """Host FDL iterations (exact dense repulsion).

    points: [n, 2]; edges_a/b: int arrays of point indices for every
    attractive link (graph edges + transitive hints), directed per node as in
    the reference (each node accumulates attraction towards each neighbour).
    Repulsion is computed in row blocks so memory stays O(n * blk).
    """
    n = points.shape[0]
    k = np.sqrt(1.0 / n)
    t = 0.1
    dt = t / (num_iterations + 1)
    blk = n if n <= _HOST_DENSE_MAX else 1024
    rows = np.arange(n)

    for _ in range(num_iterations):
        repulse = np.zeros_like(points)
        for r0 in range(0, n, blk):
            r1 = min(r0 + blk, n)
            delta = points[r0:r1, None, :] - points[None, :, :]
            dist2 = (delta**2).sum(-1)
            self_col = rows[None, :] == rows[r0:r1, None]
            dist2[self_col] = 1.0
            inv = (k * k) / np.maximum(dist2, 1e-8)
            inv[self_col] = 0.0
            repulse[r0:r1] = (delta * inv[:, :, None]).sum(axis=1)

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


def _device_layout_fn():
    """Jitted device FDL: ALL iterations in one dispatch (fori_loop),
    repulsion blocked via a scan over row tiles (O(n*blk) memory, exact).
    The TPU answer to the reference's Barnes-Hut + thread pool
    (assemble.cc:357-698): dense blocked n-body saturates the VPU and
    stays exact instead of theta-approximated."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(
        jax.jit, static_argnames=("num_iterations", "blk")
    )
    def run(points, mask, ea, eb, e_valid, num_iterations: int, blk: int):
        n = points.shape[0]
        n_real = mask.sum()
        k = jnp.sqrt(1.0 / n_real)
        rows_all = jnp.arange(n, dtype=jnp.int32)

        def one_iter(i, carry):
            points, t = carry

            def row_block(r0, _):
                idx = r0 + jnp.arange(blk, dtype=jnp.int32)
                idx_c = jnp.clip(idx, 0, n - 1)
                p_blk = points[idx_c]
                delta = p_blk[:, None, :] - points[None, :, :]
                dist2 = (delta**2).sum(-1)
                self_col = rows_all[None, :] == idx_c[:, None]
                pad_col = ~mask[None, :]
                inv = (k * k) / jnp.maximum(dist2, 1e-8)
                inv = jnp.where(self_col | pad_col, 0.0, inv)
                rep = (delta * inv[:, :, None]).sum(axis=1)
                return r0 + blk, rep

            _, rep_blocks = jax.lax.scan(
                row_block, jnp.int32(0), None, length=n // blk
            )
            repulse = rep_blocks.reshape(n, 2)

            d_ab = points[ea] - points[eb]
            dist = jnp.sqrt((d_ab**2).sum(-1))
            dist = jnp.maximum(dist, 0.01)
            contrib = d_ab * jnp.where(
                e_valid, -dist / k, 0.0
            )[:, None]
            attract = (
                jnp.zeros_like(points).at[ea].add(contrib)
            )

            disp = repulse + attract
            length = jnp.sqrt((disp**2).sum(-1))
            length = jnp.where(length < 0.01, 0.1, length)
            points = points + jnp.where(
                mask, t / length, 0.0
            )[:, None] * disp
            return points, t - dt

        t0 = 0.1
        dt = t0 / (num_iterations + 1)
        points, _ = jax.lax.fori_loop(
            0,
            num_iterations,
            one_iter,
            (points, jnp.asarray(t0, dtype=points.dtype)),
        )
        return points

    return run


_DEVICE_LAYOUT = None


def _pow2_at_least(v: int, lo: int) -> int:
    c = lo
    while c < v:
        c <<= 1
    return c


def _layout_component(
    points: np.ndarray, edges_a: np.ndarray, edges_b: np.ndarray, num_iterations: int
) -> np.ndarray:
    """Route one component to the device n-body (large) or host (small)."""
    n = points.shape[0]
    if n >= _DEVICE_MIN_NODES:
        try:
            global _DEVICE_LAYOUT
            import jax
            import jax.numpy as jnp

            if _DEVICE_LAYOUT is None:
                _DEVICE_LAYOUT = _device_layout_fn()
            N = _pow2_at_least(n, _DEVICE_MIN_NODES)
            E = _pow2_at_least(max(edges_a.size, 1), 1024)
            pts = np.zeros((N, 2), dtype=np.float64)
            pts[:n] = points
            mask = np.zeros(N, dtype=bool)
            mask[:n] = True
            ea = np.zeros(E, dtype=np.int32)
            eb = np.zeros(E, dtype=np.int32)
            ea[: edges_a.size] = edges_a
            eb[: edges_b.size] = edges_b
            ev = np.zeros(E, dtype=bool)
            ev[: edges_a.size] = True
            out = _DEVICE_LAYOUT(
                jnp.asarray(pts),
                jnp.asarray(mask),
                jnp.asarray(ea),
                jnp.asarray(eb),
                jnp.asarray(ev),
                num_iterations,
                min(N, 1024),
            )
            return np.asarray(out)[:n]
        except Exception as e:
            import sys

            print(
                f"[raven_tpu::Layout] device n-body failed for a "
                f"{n}-node component ({type(e).__name__}: {e}); "
                "falling back to the host loop",
                file=sys.stderr,
            )
    return _layout_component_host(points, edges_a, edges_b, num_iterations)


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
