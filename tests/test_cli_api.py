import io
import os
import subprocess
import sys

import numpy as np
import pytest

from raven_tpu import api
from tests.conftest import random_genome, sample_reads


@pytest.fixture(scope="module")
def reads_file(tmp_path_factory):
    rng = np.random.default_rng(7)
    genome = random_genome(rng, 20000)
    reads, _ = sample_reads(rng, genome, 160, 3000, error=0.03)
    path = tmp_path_factory.mktemp("data") / "reads.fasta"
    with open(path, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f">r{i}\n")
            fh.write("".join("ACGT"[c] for c in r) + "\n")
    return str(path), genome


def test_api_whole_phases(reads_file):
    path, genome = reads_file
    readset = api.load_sequences([path])
    graph = api.Graph()
    api.construct_graph(graph, readset)
    api.assemble_graph(graph)
    api.polish_graph(graph, readset, cfg=api.PolishCfg(num_rounds=1))
    buf = io.StringIO()
    api.graph_print_unitigs(graph, 0, file=buf)
    out = buf.getvalue()
    assert out.startswith(">")
    assert "LN:i:" in out


def test_api_substages(reads_file):
    path, genome = reads_file
    readset = api.load_sequences([path])
    graph = api.Graph()
    index = api.MinimizerIndex(15, 5)
    handle = api.OverlapsHandle(readset)
    api.find_overlaps_and_create_piles(index, readset, graph, handle)
    assert sum(o.size for o in handle.overlaps) > 0
    api.trim_and_annotate_piles(graph, handle)
    api.resolve_contained_reads(graph, handle, readset)
    api.resolve_chimeric_sequences(graph, handle)
    api.find_overlaps_and_repetitive_regions(index, graph, handle, readset)
    api.resolve_repeat_induced_overlaps(graph, handle, readset)
    api.construct_assembly_graph(graph, handle, readset)
    assert any(n is not None for n in graph.nodes)
    api.remove_transitive_edges_from_graph(graph)
    api.remove_tips_and_bubbles_from_graph(graph)
    api.remove_long_edges_from_graph(graph)
    unitigs = api.get_unitigs(graph)
    assert len(unitigs) >= 1


def test_cli_end_to_end(reads_file, tmp_path, monkeypatch):
    path, genome = reads_file
    monkeypatch.chdir(tmp_path)
    from raven_tpu.cli import main

    gfa = str(tmp_path / "out.gfa")
    ugfa = str(tmp_path / "unitigs.gfa")
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    rc = main(
        [
            path,
            "-p",
            "0",
            "--disable-checkpoints",
            "-F",
            gfa,
            "-U",
            ugfa,
            "-u",
            "5000",
        ]
    )
    sys.stdout = sys.__stdout__
    assert rc == 0
    fasta = out.getvalue()
    assert fasta.startswith(">")
    assert os.path.getsize(gfa) > 0
    assert os.path.getsize(ugfa) > 0


def test_cli_resume(reads_file, tmp_path, monkeypatch):
    path, genome = reads_file
    monkeypatch.chdir(tmp_path)
    from raven_tpu.cli import main

    out1 = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out1)
    rc = main([path, "-p", "0", "-u", "5000"])
    sys.stdout = sys.__stdout__
    assert rc == 0
    assert os.path.exists("raven_tpu.ckpt")

    out2 = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out2)
    rc = main([path, "-p", "0", "-u", "5000", "--resume"])
    sys.stdout = sys.__stdout__
    assert rc == 0
    assert out1.getvalue() == out2.getvalue()


def test_cli_version():
    from raven_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
