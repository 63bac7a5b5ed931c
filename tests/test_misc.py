import json
import os
import subprocess
import sys

import numpy as np
import pytest

from raven_tpu.config import OverlapPhaseCfg
from raven_tpu.graph import Graph, assemble, construct_graph, get_csv, print_json
from raven_tpu.io import ReadSet
from tests.conftest import random_genome, sample_reads


@pytest.fixture(scope="module")
def small_graph(rng):
    genome = random_genome(rng, 15000)
    reads, _ = sample_reads(rng, genome, 120, 3000, error=0.03)
    rs = ReadSet.from_sequences(reads)
    g = Graph()
    construct_graph(g, rs, OverlapPhaseCfg())
    return g


def test_csv_with_similarity(small_graph):
    lines = get_csv(
        small_graph,
        print_sequence_name=True,
        print_pile_begin_end=True,
        print_edge_similarity=True,
    )
    assert lines
    edge_lines = [ln for ln in lines if ",1," in ln]
    assert edge_lines
    # similarity column parses as a float in [0, 1]
    sim = float(edge_lines[0].rsplit(" ", 1)[1])
    assert 0.0 <= sim <= 1.0


def test_plotter_renders_piles(small_graph, tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    pj = tmp_path / "piles.json"
    print_json(small_graph, str(pj))
    out_dir = tmp_path / "plots"
    # plot just a couple of piles for speed
    with open(pj) as fh:
        data = json.load(fh)
    small = dict(list(data.items())[:2])
    with open(pj, "w") as fh:
        json.dump(small, fh)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "misc", "plotter.py"),
            str(pj),
            "--mode",
            "pile",
            "--out-dir",
            str(out_dir),
        ],
        capture_output=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr.decode()
    assert len(list(out_dir.glob("pile_*.png"))) == 2


def test_plotter_renders_layout(small_graph, tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    from raven_tpu.graph.layout import create_force_directed_layout

    assemble(small_graph)
    lj = tmp_path / "layout.json"
    create_force_directed_layout(small_graph, path=str(lj), num_iterations=5)
    with open(lj) as fh:
        data = json.load(fh)
    # layout JSON may be empty if the graph has no junction component; the
    # writer must still emit valid JSON
    assert isinstance(data, dict)


def test_native_sanitizer_gate():
    """Build + run the native modules under ASan/UBSan (the reference
    force-enables ASan, RavenLib.cmake:13-23).  Skipped without g++."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        import pytest

        pytest.skip("no g++")
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [os.path.join(repo, "misc", "native_sanitize.sh")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_streaming_index_batch_clamp(monkeypatch):
    """With the device path active on an accelerator, index batches clamp
    to the PartitionedIndex HBM ceiling (the streaming regime); the host
    path and explicit overrides keep the reference 2^32 budget."""
    import jax

    from raven_tpu.graph import construct as C
    from raven_tpu.overlap.device_index import PartitionedIndex

    monkeypatch.delenv("RAVEN_TPU_INDEX_BATCH_BASES", raising=False)
    monkeypatch.delenv("RAVEN_TPU_DEVICE_MAP", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cap = int(PartitionedIndex.MAX_TOTAL_ENTRIES * 3 * 0.9)
    assert C._index_batch_bytes() == min(C.INDEX_BATCH_BYTES, cap)
    assert C._index_batch_bytes() < (1 << 32)

    monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "0")
    assert C._index_batch_bytes() == C.INDEX_BATCH_BYTES

    monkeypatch.delenv("RAVEN_TPU_DEVICE_MAP", raising=False)
    monkeypatch.setenv("RAVEN_TPU_INDEX_BATCH_BASES", str(1 << 31))
    import importlib

    importlib.reload(C)
    try:
        assert C.INDEX_BATCH_BYTES == 1 << 31
        assert C._index_batch_bytes() == 1 << 31
    finally:
        monkeypatch.delenv("RAVEN_TPU_INDEX_BATCH_BASES", raising=False)
        importlib.reload(C)
