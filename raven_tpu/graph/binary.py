"""Whole-graph checkpoint store/load.

Equivalent of the reference's cereal binary archive to ./raven.cereal
(RavenLib/src/binary.cc:73-96): stage + piles + nodes + edges + edge
connection table, written after every stage transition, reloaded by
`--resume`.  Format here: a single compressed npz-style pickle of plain
numpy arrays + python state (our own format; there is no cross-tool
consumer).  Node/edge pair pointers and adjacency lists are rebuilt on load
exactly like the reference (binary.cc:44-65), and id factories are reset to
the array sizes (binary.cc:67-68).
"""

from __future__ import annotations

import pickle

import numpy as np

from raven_tpu.graph.graph import Edge, Graph, Node
from raven_tpu.pile.pile import Piles

CHECKPOINT_PATH = "raven_tpu.ckpt"


def _piles_state(piles: Piles | None):
    if piles is None:
        return None
    return {
        "nbins": piles.nbins,
        "bin_starts": piles.bin_starts,
        "data": piles.data,
        "begin": piles.begin,
        "end": piles.end,
        "median": piles.median,
        "is_invalid": piles.is_invalid,
        "is_contained": piles.is_contained,
        "is_chimeric": piles.is_chimeric,
        "is_repetitive": piles.is_repetitive,
        "kmers": piles.kmers,
        "chimeric_regions": piles.chimeric_regions,
        "repetitive_regions": piles.repetitive_regions,
    }


def _piles_restore(state) -> Piles | None:
    if state is None:
        return None
    piles = Piles.__new__(Piles)
    piles.n = state["nbins"].size
    piles.nbins = state["nbins"]
    piles.bin_starts = state["bin_starts"]
    piles.total_bins = int(state["nbins"].sum())
    piles.data = state["data"]
    piles.begin = state["begin"]
    piles.end = state["end"]
    piles.median = state["median"]
    piles.is_invalid = state["is_invalid"]
    piles.is_contained = state["is_contained"]
    piles.is_chimeric = state["is_chimeric"]
    piles.is_repetitive = state["is_repetitive"]
    piles.kmers = state["kmers"]
    piles.chimeric_regions = state["chimeric_regions"]
    piles.repetitive_regions = state["repetitive_regions"]
    return piles


def store_graph(graph: Graph, path: str = CHECKPOINT_PATH) -> None:
    nodes_state = []
    for n in graph.nodes:
        if n is None:
            nodes_state.append(None)
            continue
        nodes_state.append(
            {
                "id": n.id,
                "name": n.name,
                "codes": n.codes,
                "seq_id": n.seq_id,
                "count": n.count,
                "is_unitig": n.is_unitig,
                "is_circular": n.is_circular,
                "is_polished": n.is_polished,
                "transitive": sorted(n.transitive),
                "color": n.color,
                "coverage": n.coverage,
                "original_names": sorted(n.original_names),
            }
        )
    edges_state = []
    for e in graph.edges:
        if e is None:
            edges_state.append(None)
            continue
        edges_state.append(
            {
                "id": e.id,
                "length": e.length,
                "weight": e.weight,
                "tail": e.tail.id,
                "head": e.head.id,
            }
        )
    state = {
        "version": 1,
        "stage": graph.stage,
        "node_next": graph._node_next,
        "edge_next": graph._edge_next,
        "piles": _piles_state(graph.piles),
        "nodes": nodes_state,
        "edges": edges_state,
    }
    with open(path, "wb") as fh:
        pickle.dump(state, fh, protocol=4)


def load_graph(path: str = CHECKPOINT_PATH) -> Graph:
    with open(path, "rb") as fh:
        state = pickle.load(fh)

    graph = Graph()
    graph.stage = state["stage"]
    graph.piles = _piles_restore(state["piles"])

    for ns in state["nodes"]:
        if ns is None:
            graph.nodes.append(None)
            continue
        n = Node(ns["id"], ns["name"], ns["codes"], ns["seq_id"])
        n.count = ns["count"]
        n.is_unitig = ns["is_unitig"]
        n.is_circular = ns["is_circular"]
        n.is_polished = ns["is_polished"]
        n.transitive = set(ns["transitive"])
        n.color = ns["color"]
        n.coverage = ns["coverage"]
        n.original_names = set(ns["original_names"])
        graph.nodes.append(n)

    # rebuild RC pairs (binary.cc:44-49)
    for i in range(0, len(graph.nodes) - 1, 2):
        if graph.nodes[i] is not None and graph.nodes[i + 1] is not None:
            graph.nodes[i].pair = graph.nodes[i + 1]
            graph.nodes[i + 1].pair = graph.nodes[i]

    # edges + adjacency (binary.cc:50-65)
    for es in state["edges"]:
        if es is None:
            graph.edges.append(None)
            continue
        tail = graph.nodes[es["tail"]]
        head = graph.nodes[es["head"]]
        e = Edge(es["id"], tail, head, es["length"])
        e.weight = es["weight"]
        graph.edges.append(e)
    for i in range(0, len(graph.edges) - 1, 2):
        if graph.edges[i] is not None and graph.edges[i + 1] is not None:
            graph.edges[i].pair = graph.edges[i + 1]
            graph.edges[i + 1].pair = graph.edges[i]

    graph._node_next = state["node_next"]
    graph._edge_next = state["edge_next"]
    return graph
