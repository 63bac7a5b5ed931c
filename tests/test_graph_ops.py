import numpy as np
import pytest

from raven_tpu.graph import Graph, create_unitigs, get_unitigs
from raven_tpu.graph.assemble import (
    remove_bubbles,
    remove_tips,
    remove_transitive_edges,
)
from raven_tpu.io import encode
from tests.conftest import random_genome


def pair_nodes(graph, name, codes):
    return graph.new_node_pair(name, codes)


def pair_edge(graph, tail, head, length, length_pair=None):
    if length_pair is None:
        length_pair = length
    return graph.new_edge_pair(tail, head, length, length_pair)


def test_transitive_reduction(rng):
    g = Graph()
    genome = encode(random_genome(rng, 3000))
    a, _ = pair_nodes(g, "A", genome[0:1100])
    b, _ = pair_nodes(g, "B", genome[1000:2100])
    c, _ = pair_nodes(g, "C", genome[2000:3000])
    pair_edge(g, a, b, 1000)
    pair_edge(g, b, c, 1000)
    shortcut, _ = pair_edge(g, a, c, 2000)
    removed = remove_transitive_edges(g)
    assert removed == 1
    assert g.edges[shortcut.id] is None
    assert a.outdegree == 1 and c.indegree == 1
    # transitive hint recorded for the layout
    assert (c.id & ~1) in g.nodes[a.id & ~1].transitive


def test_remove_tips(rng):
    g = Graph()
    genome = encode(random_genome(rng, 4000))
    a, _ = pair_nodes(g, "A", genome[0:1100])
    b, _ = pair_nodes(g, "B", genome[1000:2100])
    c, _ = pair_nodes(g, "C", genome[2000:3100])
    t, _ = pair_nodes(g, "T", genome[500:1600])  # spurious dead-end into B
    a.count = 10  # main path protected (is_tip requires count < 6)
    pair_edge(g, a, b, 1000)
    pair_edge(g, b, c, 1000)
    pair_edge(g, t, b, 500)
    num = remove_tips(g)
    assert num == 1
    assert g.nodes[t.id] is None  # tip node deleted
    assert b.indegree == 1  # only A -> B remains
    assert g.nodes[a.id] is not None


def test_remove_simple_bubble(rng):
    g = Graph()
    genome = encode(random_genome(rng, 4000))
    a, _ = pair_nodes(g, "A", genome[0:1000])
    b1, _ = pair_nodes(g, "B1", genome[900:2000])
    b2, _ = pair_nodes(g, "B2", genome[900:2000])
    d, _ = pair_nodes(g, "D", genome[1900:3000])
    b1.count = 3  # heavier branch wins
    pair_edge(g, a, b1, 900)
    pair_edge(g, a, b2, 900)
    pair_edge(g, b1, d, 1000)
    pair_edge(g, b2, d, 1000)
    num = remove_bubbles(g)
    assert num == 1
    assert a.outdegree == 1
    assert a.outedges[0].head is b1  # lighter b2 path removed
    assert d.indegree == 1


def test_create_unitigs_chain(rng):
    g = Graph()
    genome = encode(random_genome(rng, 2600))
    n0, _ = pair_nodes(g, "r0", genome[0:1000])
    n1, _ = pair_nodes(g, "r1", genome[800:1800])
    n2, _ = pair_nodes(g, "r2", genome[1600:2600])
    pair_edge(g, n0, n1, 800, 800)
    pair_edge(g, n1, n2, 800, 800)
    created = create_unitigs(g)
    assert created == 1
    unitigs = [
        n for n in g.live_nodes() if not n.is_rc and n.name.startswith(("Ctg", "Utg"))
    ]
    assert len(unitigs) == 1
    u = unitigs[0]
    assert u.count == 3
    assert np.array_equal(u.codes, genome)  # overlap-aware concatenation
    # RC twin is the reverse complement
    from raven_tpu.io import reverse_complement

    assert np.array_equal(u.pair.codes, reverse_complement(genome))
    # chain nodes and edges are gone
    assert g.nodes[n0.id] is None and g.nodes[n1.id] is None


def test_create_unitigs_circular(rng):
    g = Graph()
    genome = encode(random_genome(rng, 3000))
    n0, _ = pair_nodes(g, "r0", genome[0:1200])
    n1, _ = pair_nodes(g, "r1", genome[1000:2200])
    n2, _ = pair_nodes(g, "r2", np.concatenate([genome[2000:3000], genome[0:200]]))
    pair_edge(g, n0, n1, 1000)
    pair_edge(g, n1, n2, 1000)
    pair_edge(g, n2, n0, 1000)
    created = create_unitigs(g)
    assert created == 1
    u = next(
        n for n in g.live_nodes() if not n.is_rc and n.name.startswith(("Ctg", "Utg"))
    )
    assert u.is_circular
    assert u.count == 3
    assert u.codes.size == 3000  # one full genome cycle
    # circular unitig sequence is a rotation of the genome
    doubled = np.concatenate([genome, genome])
    s = u.codes
    found = any(
        np.array_equal(doubled[i : i + 3000], s) for i in range(3000)
    )
    assert found


def test_get_unitigs_naming(rng):
    from raven_tpu.config import GLOBALS

    g = Graph()
    genome = encode(random_genome(rng, 30000))
    prev = None
    first = None
    # 10 reads, counts sum > 5 and length > 9999 -> Utg
    for i in range(10):
        n, _ = pair_nodes(g, f"r{i}", genome[i * 2500 : i * 2500 + 5000])
        if prev is not None:
            pair_edge(g, prev, n, 2500)
        else:
            first = n
        prev = n
    unitigs = get_unitigs(g)
    assert len(unitigs) == 1
    assert unitigs[0].name.startswith("Utg")
    assert unitigs[0].is_unitig


def test_fdl_device_path_matches_host_structure():
    """Large components route to the jitted n-body; the layout must agree
    with the host implementation structurally (f32 vs f64 paths: exact
    equality is not expected, rank correlation is)."""
    import raven_tpu.graph.layout as L

    rng = np.random.default_rng(1)
    n = 600
    pts = rng.random((n, 2))
    ea = np.arange(n - 1)
    eb = np.arange(1, n)
    host = L._layout_component_host(pts.copy(), ea, eb, 50)
    assert n >= L._DEVICE_MIN_NODES
    dev = L._layout_component(pts.copy(), ea, eb, 50)
    assert np.isfinite(dev).all()
    c = np.corrcoef(host.ravel(), dev.ravel())[0, 1]
    assert c > 0.98, f"device layout diverged structurally (corr {c})"
