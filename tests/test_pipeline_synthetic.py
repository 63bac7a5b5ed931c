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


def test_chimeric_reads_filtered(rng):
    """Chimeric reads (two distant genome segments joined) must be trimmed
    or invalidated by the pile stages and not break the assembly."""
    genome = random_genome(rng, 30000)
    reads, _ = sample_reads(rng, genome, 200, 3000, error=0.03)
    from raven_tpu.io import encode

    # add 12 chimeras joining the two genome halves
    chimera_ids = []
    for j in range(12):
        a = int(rng.integers(0, 5000))
        b = int(rng.integers(20000, 25000))
        chim = np.concatenate(
            [encode(genome[a : a + 1500]), encode(genome[b : b + 1500])]
        )
        chimera_ids.append(len(reads))
        reads.append(chim)
    rs = ReadSet.from_sequences(reads)
    graph = Graph()
    construct_graph(graph, rs, OverlapPhaseCfg())
    piles = graph.piles
    # chimeras are either invalidated or trimmed to one side (valid span
    # must not cover both halves of the junction at 1500)
    for cid in chimera_ids:
        if piles.is_invalid[cid]:
            continue
        begin = piles.begin_bases(cid)
        end = piles.end_bases(cid)
        assert not (begin < 1200 and end > 1800), (
            f"chimera {cid} kept across its junction [{begin}, {end})"
        )
    assemble(graph)
    old = GLOBALS.min_unitig_size
    GLOBALS.min_unitig_size = 5000
    try:
        unitigs = get_unitigs(graph)
    finally:
        GLOBALS.min_unitig_size = old
    main = max(unitigs, key=lambda n: n.length)
    assert main.length > 0.8 * len(genome)


def test_repeat_regions_detected(rng):
    """A strong tandem-style repeat must raise repetitive-region flags on
    reads spanning it (stage -4 pile analysis) without breaking assembly."""
    from raven_tpu.io import encode

    core = random_genome(rng, 12000)
    repeat = random_genome(rng, 2500)
    genome = core[:4000] + repeat + core[4000:8000] + repeat + core[8000:]
    reads, _ = sample_reads(rng, genome, 180, 3000, error=0.03)
    rs = ReadSet.from_sequences(reads)
    graph = Graph()
    construct_graph(graph, rs, OverlapPhaseCfg())
    piles = graph.piles
    assert piles.is_repetitive.any(), "no repetitive piles flagged"
    assemble(graph)  # must terminate and leave a sane graph
    assert any(n is not None for n in graph.nodes)


def test_nondefault_kmer_window(rng):
    """The pipeline honours -k/-w (no hard-coded 15/5 anywhere hot)."""
    genome = random_genome(rng, 20000)
    reads, _ = sample_reads(rng, genome, 150, 3000, error=0.03)
    rs = ReadSet.from_sequences(reads)
    graph = Graph()
    construct_graph(graph, rs, OverlapPhaseCfg(kmer_len=13, window_len=9))
    assemble(graph)
    old = GLOBALS.min_unitig_size
    GLOBALS.min_unitig_size = 5000
    try:
        unitigs = get_unitigs(graph)
    finally:
        GLOBALS.min_unitig_size = old
    main = max(unitigs, key=lambda n: n.length)
    assert main.length > 0.8 * len(genome)
