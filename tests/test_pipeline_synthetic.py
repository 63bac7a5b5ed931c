"""End-to-end construct + assemble on simulated reads."""

import numpy as np
import pytest

from raven_tpu.config import GLOBALS, OverlapPhaseCfg
from raven_tpu.graph import Graph, construct_graph, assemble, get_unitigs
from raven_tpu.io import ReadSet
from raven_tpu.ops.edit_distance import edit_distance
from tests.conftest import random_genome, sample_reads


@pytest.fixture(scope="module")
def assembled(rng):
    genome = random_genome(rng, 30000)
    reads, _ = sample_reads(rng, genome, 220, 3000, error=0.03)
    rs = ReadSet.from_sequences(reads)
    graph = Graph()
    construct_graph(graph, rs, OverlapPhaseCfg())
    assemble(graph)
    return genome, rs, graph


def test_construct_builds_graph(assembled):
    genome, rs, graph = assembled
    live = [n for n in graph.live_nodes()]
    assert len(live) > 0
    # every live node has its RC twin
    for n in live:
        assert n.pair is not None and n.pair.pair is n


def test_assemble_produces_single_contig(assembled):
    genome, rs, graph = assembled
    old = GLOBALS.min_unitig_size
    GLOBALS.min_unitig_size = 5000
    try:
        unitigs = get_unitigs(graph)
    finally:
        GLOBALS.min_unitig_size = old
    assert len(unitigs) >= 1
    main = max(unitigs, key=lambda n: n.length)
    # reconstructed contig covers most of the genome
    assert main.length > 0.8 * len(genome)
    # unpolished accuracy: edit distance vs truth within read error budget
    from raven_tpu.io import encode, reverse_complement

    g = encode(genome)
    fwd = edit_distance(main.codes, g)
    rev = edit_distance(reverse_complement(main.codes), g)
    ed = min(fwd, rev)
    # contig may be clipped at ends; allow boundary slack + error rate
    assert ed < 0.08 * len(genome)
