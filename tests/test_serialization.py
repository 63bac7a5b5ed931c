import os

import numpy as np

from raven_tpu.config import OverlapPhaseCfg
from raven_tpu.graph import (
    Graph,
    assemble,
    construct_graph,
    get_gfa,
    get_unitigs,
    load_gfa,
    load_graph,
    print_gfa,
    print_json,
    print_unitig_gfa,
    store_graph,
)
from raven_tpu.io import ReadSet
from tests.conftest import random_genome, sample_reads


def _build(rng, tmpdir=None):
    genome = random_genome(rng, 20000)
    reads, _ = sample_reads(rng, genome, 150, 3000, error=0.03)
    rs = ReadSet.from_sequences(reads)
    graph = Graph()
    construct_graph(graph, rs, OverlapPhaseCfg())
    return rs, graph


def test_checkpoint_roundtrip(rng, tmp_path):
    rs, graph = _build(rng)
    ckpt = str(tmp_path / "test.ckpt")
    store_graph(graph, ckpt)
    loaded = load_graph(ckpt)

    assert loaded.stage == graph.stage
    assert len(loaded.nodes) == len(graph.nodes)
    assert len(loaded.edges) == len(graph.edges)
    for a, b in zip(graph.nodes, loaded.nodes):
        assert (a is None) == (b is None)
        if a is not None:
            assert a.id == b.id and a.name == b.name
            assert np.array_equal(a.codes, b.codes)
            assert b.pair is not None and b.pair.id == a.pair.id
    for a, b in zip(graph.edges, loaded.edges):
        assert (a is None) == (b is None)
        if a is not None:
            assert a.length == b.length
            assert a.tail.id == b.tail.id and a.head.id == b.head.id
    # piles restored
    assert np.array_equal(graph.piles.data, loaded.piles.data)
    assert np.array_equal(graph.piles.begin, loaded.piles.begin)


def test_checkpoint_resume_equality(rng, tmp_path, monkeypatch):
    """Assembling straight through vs reloading between phases must give
    identical contigs (reference raven_test.cpp:69-95 Checkpoints test)."""
    monkeypatch.chdir(tmp_path)
    from raven_tpu.graph import layout

    genome = random_genome(rng, 20000)
    reads, _ = sample_reads(rng, genome, 150, 3000, error=0.03)
    rs = ReadSet.from_sequences(reads)

    layout.reset_seed()
    g1 = Graph()
    construct_graph(g1, rs, OverlapPhaseCfg())
    assemble(g1)
    u1 = get_unitigs(g1)

    layout.reset_seed()
    g = Graph()
    construct_graph(g, rs, OverlapPhaseCfg(), checkpoints=True)
    g = load_graph()
    assemble(g, checkpoints=True)
    g = load_graph()
    u2 = get_unitigs(g)

    assert len(u1) == len(u2)
    for a, b in zip(u1, u2):
        assert np.array_equal(a.codes, b.codes)


def test_gfa_roundtrip(rng, tmp_path):
    rs, graph = _build(rng)
    gfa_path = str(tmp_path / "graph.gfa")
    print_gfa(graph, gfa_path)
    loaded = load_gfa(gfa_path)
    assert loaded.stage == -3

    # same S records survive the round trip
    orig_lines = get_gfa(graph, include_dp=True)
    orig_s = sorted(
        line.split("\t")[1] for line in orig_lines if line.startswith("S")
    )
    loaded_names = sorted(n.name for n in loaded.live_nodes() if not n.is_rc)
    assert orig_s == loaded_names

    # edge count: loader creates one edge per non-circular L line
    orig_l = [
        line
        for line in orig_lines
        if line.startswith("L") and not line.split("\t")[1] == line.split("\t")[3]
    ]
    assert len([e for e in loaded.edges if e is not None]) == len(orig_l)


def test_unitig_gfa_and_json(rng, tmp_path):
    rs, graph = _build(rng)
    assemble(graph)
    ugfa = str(tmp_path / "unitigs.gfa")
    print_unitig_gfa(graph, ugfa)
    assert os.path.getsize(ugfa) > 0
    pj = str(tmp_path / "piles.json")
    print_json(graph, pj)
    import json

    with open(pj) as fh:
        piles = json.load(fh)
    assert len(piles) > 0
    first = next(iter(piles.values()))
    assert "data_" in first and "median_" in first


def test_checkpoint_resume_through_polish(rng, tmp_path, monkeypatch):
    """Reference Checkpoints test shape (raven_test.cpp:69-95): reload the
    checkpoint between construct, assemble, and every polish round; final
    contigs must equal the straight-through run bit for bit."""
    monkeypatch.chdir(tmp_path)
    from raven_tpu.config import OverlapPhaseCfg, PolishCfg
    from raven_tpu.graph import assemble, construct_graph, load_graph
    from raven_tpu.graph.common import get_unitigs
    from raven_tpu.graph import layout
    from raven_tpu.polish import polish

    genome = random_genome(rng, 20000)
    reads, _ = sample_reads(rng, genome, 150, 3000, error=0.05)
    rs = ReadSet.from_sequences(reads)
    cfg = PolishCfg(num_rounds=2)

    layout.reset_seed()
    g1 = Graph()
    construct_graph(g1, rs, OverlapPhaseCfg())
    assemble(g1)
    polish(g1, rs, cfg)
    u1 = get_unitigs(g1, drop_unpolished=True)

    layout.reset_seed()
    g = Graph()
    construct_graph(g, rs, OverlapPhaseCfg(), checkpoints=True)
    g = load_graph()
    assemble(g, checkpoints=True)
    g = load_graph()
    polish(g, rs, cfg, checkpoints=True)  # runs rounds 1..2 w/ checkpoints
    g = load_graph()
    polish(g, rs, cfg, checkpoints=True)  # no-op: stage == num_rounds
    u2 = get_unitigs(g, drop_unpolished=True)

    assert len(u1) == len(u2) and len(u1) > 0
    for a, b in zip(u1, u2):
        assert np.array_equal(a.codes, b.codes)


def test_gfa_line_format(rng):
    """Byte-level line shapes of the reference writers
    (graph_repr.cc:19-64): S with LN/RC(/dp) tags, L with <overlap>M."""
    import re

    from raven_tpu.graph import get_gfa
    from raven_tpu.graph.graph import Graph as G2
    from raven_tpu.io import encode

    g = G2()
    n1, _ = g.new_node_pair("r1", encode("ACGTACGTAC"))
    n2, _ = g.new_node_pair("r2", encode("GTACGGGTTT"))
    g.new_edge_pair(n1, n2, 6, 6)
    n1.is_circular = True
    lines = get_gfa(g, include_dp=True)
    s_lines = [ln for ln in lines if ln.startswith("S\t")]
    l_lines = [ln for ln in lines if ln.startswith("L\t")]
    assert re.fullmatch(
        r"S\tr1\tACGTACGTAC\tLN:i:10\tRC:i:1\tdp:f:\d+", s_lines[0]
    )
    assert "L\tr1\t+\tr1\t+\t0M" in l_lines  # circular self-link
    assert "L\tr1\t+\tr2\t+\t4M" in l_lines  # overlap = len - edge length


def test_checkpoint_is_inert_data(tmp_path):
    """The checkpoint archive must be inert (npz + JSON): loading must not
    unpickle, and corrupt/foreign files must raise cleanly."""
    import io
    import json
    import pickle
    import zipfile

    import pytest

    from raven_tpu.graph.binary import load_graph, store_graph
    from raven_tpu.graph.graph import Graph

    g = Graph()
    g.stage = -3
    path = str(tmp_path / "ck.ckpt")
    store_graph(g, path)

    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert names == {"MANIFEST.json", "arrays.npz"}
        manifest = json.loads(zf.read("MANIFEST.json"))
        assert manifest["magic"] == "raven_tpu-checkpoint"
        # numpy arrays load with allow_pickle=False (would raise on any
        # pickled object array)
        import numpy as np

        np.load(io.BytesIO(zf.read("arrays.npz")), allow_pickle=False)

    # a pickle (the old format / hostile file) is rejected, not executed
    evil = str(tmp_path / "evil.ckpt")
    with open(evil, "wb") as fh:
        pickle.dump({"stage": 0}, fh)
    with pytest.raises((ValueError, zipfile.BadZipFile)):
        load_graph(evil)

    # version check
    bad = str(tmp_path / "bad.ckpt")
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr(
            "MANIFEST.json",
            json.dumps({"magic": "raven_tpu-checkpoint", "version": 99}),
        )
        zf.writestr("arrays.npz", b"")
    with pytest.raises(ValueError, match="version"):
        load_graph(bad)
