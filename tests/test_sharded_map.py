"""Sharded overlap stage (parallel.sharded_index.ShardedIndex) parity.

The multi-chip self-join must reproduce the single-device host path
byte-for-byte: same occurrence threshold (global Filter quantile), same
match set, same chained overlaps, same too-frequent positions, and an
end-to-end construct whose per-stage parity dump is identical.  Runs on
the virtual 8-device CPU mesh (conftest forces 8 host devices).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from raven_tpu.io import ReadSet
from tests.conftest import random_genome, sample_reads


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from raven_tpu.parallel.mesh import make_mesh

    return make_mesh(8)


@pytest.fixture(scope="module")
def readset(rng):
    genome = random_genome(rng, 16000)
    reads, _ = sample_reads(rng, genome, 70, 2200, error=0.04)
    return ReadSet.from_sequences(reads)


def _host_engine(readset, minhash_query):
    from raven_tpu.overlap.engine import MinimizerIndex

    idx = MinimizerIndex(15, 5)
    idx.minimize(
        readset, np.arange(len(readset)), with_query_flags=minhash_query
    )
    idx.filter(0.001)
    filtered = {}
    anchors = {}
    ovl = idx.map_many(
        readset,
        np.arange(len(readset)),
        minhash=minhash_query,
        filtered_out=filtered,
        anchors_out=anchors,
    )
    return idx, ovl, filtered


def _sharded_engine(readset, minhash_query, monkeypatch):
    from raven_tpu.overlap.engine import MinimizerIndex
    from raven_tpu.parallel.sharded_index import ShardedIndex

    monkeypatch.setenv("RAVEN_TPU_SHARDED_MAP", "1")
    idx = MinimizerIndex(15, 5)
    idx.minimize(
        readset, np.arange(len(readset)), with_query_flags=minhash_query
    )
    assert isinstance(idx._device, ShardedIndex), "sharded build must engage"
    idx.filter(0.001)
    filtered = {}
    ovl = idx.map_many(
        readset,
        np.arange(len(readset)),
        minhash=minhash_query,
        filtered_out=filtered,
    )
    # the join must have run sharded, not via host materialization
    assert idx._hashes is None, "sharded join fell back to host columns"
    return idx, ovl, filtered


@pytest.mark.parametrize("minhash_query", [False, True])
def test_sharded_overlaps_match_host(
    readset, mesh8, rng, monkeypatch, minhash_query
):
    monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "0")
    h_idx, h_ovl, h_filtered = _host_engine(readset, minhash_query)
    monkeypatch.delenv("RAVEN_TPU_DEVICE_MAP")
    s_idx, s_ovl, s_filtered = _sharded_engine(
        readset, minhash_query, monkeypatch
    )

    assert s_idx.num_minimizers == h_idx.num_minimizers
    assert s_idx._occurrence == h_idx._occurrence
    assert set(s_ovl) == set(h_ovl)
    for rid in h_ovl:
        a, b = h_ovl[rid], s_ovl[rid]
        assert a.shape == b.shape, f"read {rid}: {a.shape} vs {b.shape}"
        assert np.array_equal(a, b), f"read {rid} overlaps diverge"
    assert {k: sorted(v) for k, v in h_filtered.items()} == {
        k: sorted(v) for k, v in s_filtered.items()
    }


def test_sharded_filter_quantile_matches_host(readset, mesh8, monkeypatch):
    """The psum'd run-length histogram must give the exact host Filter
    threshold at several frequencies."""
    from raven_tpu.overlap.engine import MinimizerIndex

    monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "0")
    host = MinimizerIndex(15, 5)
    host.minimize(readset, np.arange(len(readset)))
    monkeypatch.delenv("RAVEN_TPU_DEVICE_MAP")

    monkeypatch.setenv("RAVEN_TPU_SHARDED_MAP", "1")
    sh = MinimizerIndex(15, 5)
    sh.minimize(readset, np.arange(len(readset)))
    for f in (0.001, 0.01, 0.05):
        host.filter(f)
        sh.filter(f)
        assert sh._occurrence == host._occurrence, f"frequency {f}"


def test_two_axis_mesh_sharded_index(readset, monkeypatch):
    """The multi-host ('data', 'shard') mesh layout must produce the same
    index, threshold, and matches as the flat mesh (collectives flatten
    over both axes)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from raven_tpu.overlap import selfjoin
    from raven_tpu.overlap.engine import MinimizerIndex
    from raven_tpu.parallel.distributed import make_data_shard_mesh
    from raven_tpu.parallel.sharded_index import ShardedIndex

    mesh = make_data_shard_mesh(2, 4)
    ids = np.arange(len(readset))
    si = ShardedIndex.build(readset, ids, 15, 5, False, True, mesh=mesh)
    assert si is not None

    monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "0")
    host = MinimizerIndex(15, 5)
    host.minimize(readset, ids, with_query_flags=True)
    host.filter(0.001)
    assert si.n_entries == host.num_minimizers
    occ = si.occurrence_for(0.001)
    assert occ == host._occurrence

    batch = np.ones(len(readset), bool)
    m = si.distance_join(occ, batch, need_flags=True)
    assert m is not None
    h = selfjoin.distance_join(
        host._hashes, host._ids, host._pos, host._strand,
        host._qflag, occ, batch,
    )
    key = lambda t: sorted(zip(*(a.tolist() for a in t)))
    assert key(m) == key(h)


def test_sharded_construct_end_to_end(mesh8, rng, monkeypatch, tmp_path):
    """Full construct on the 8-device mesh == single-device construct,
    stage by stage (piles, overlap counts, edges via the parity dump)."""
    import json

    from raven_tpu.config import OverlapPhaseCfg
    from raven_tpu.graph import Graph, construct_graph

    genome = random_genome(rng, 20000)
    reads, _ = sample_reads(rng, genome, 90, 2500, error=0.04)

    def run(tag, sharded):
        rs = ReadSet.from_sequences(reads)
        if sharded:
            monkeypatch.setenv("RAVEN_TPU_SHARDED_MAP", "1")
        else:
            monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "0")
        monkeypatch.setenv("RAVEN_TPU_STAGE_DUMP", str(tmp_path / tag))
        try:
            g = Graph()
            construct_graph(g, rs, OverlapPhaseCfg(use_minhash=True))
        finally:
            monkeypatch.delenv("RAVEN_TPU_STAGE_DUMP")
            monkeypatch.delenv(
                "RAVEN_TPU_SHARDED_MAP" if sharded else "RAVEN_TPU_DEVICE_MAP"
            )
        recs = []
        with open(tmp_path / tag / "stages.jsonl") as fh:
            for line in fh:
                recs.append(json.loads(line))
        return g, recs

    g_host, recs_host = run("host", sharded=False)
    g_shard, recs_shard = run("shard", sharded=True)

    assert recs_shard == recs_host, "per-stage parity dump diverged"
    live_h = sorted(n.id for n in g_host.live_nodes())
    live_s = sorted(n.id for n in g_shard.live_nodes())
    assert live_s == live_h


def test_sharded_filter_exact_in_clipped_tail(mesh8):
    """When the Filter quantile lands past the 512-bin histogram tail the
    threshold must be computed exactly (device binary search), not punted
    to the no-filter sentinel (advisor round-2 medium finding)."""
    from raven_tpu.ops.sketch import UINT32_INF
    from raven_tpu.parallel.sharded_index import ShardedIndex, _HBINS

    # synthetic exchanged index: run lengths 600, 550, and 510 singles —
    # quantile at high frequency lands in the clipped >=511 bin
    run_lengths = [600, 550] + [1] * 510
    keys = []
    for i, c in enumerate(run_lengths):
        keys.extend([i] * c)
    m_local = 2048
    n_dev = mesh8.devices.size
    key = np.full(n_dev * m_local, UINT32_INF, dtype=np.uint32)
    key[: len(keys)] = np.array(keys, dtype=np.uint32)  # shard 0 only
    rid = np.zeros_like(key, dtype=np.int32)
    packed = np.zeros_like(key, dtype=np.int32)

    hist = np.zeros(_HBINS, dtype=np.int64)
    for c in run_lengths:
        hist[min(c, _HBINS - 1)] += 1

    sh = ShardedIndex(
        mesh8, key, rid, packed, len(keys), hist, False, 15, 5
    )
    n_runs = len(run_lengths)
    counts_sorted = np.sort(run_lengths)
    for f in (0.001, 0.002, 0.003):
        target = min(int((1.0 - f) * n_runs), n_runs - 1)
        expected = int(counts_sorted[target])
        got = sh.occurrence_for(f)
        assert got == expected, (f, got, expected)
        assert got < np.iinfo(np.int64).max


def test_sharded_skew_stress_stays_on_device(mesh8, monkeypatch, capfd):
    """Adversarial hash skew: a hot repeated motif concentrates index
    entries into long runs (and whatever hash ranges they map to).  The
    sharded path must neither overflow nor silently fall back to host —
    and must still match the host path byte-for-byte."""
    rng = np.random.default_rng(99)
    genome = random_genome(rng, 14000)
    motif = genome[1000:1025]
    # plant 40 extra copies of a SHORT (25 bp, 11 k-mers) motif: its runs
    # are ~40x the background coverage — extreme per-shard load skew and
    # too-frequent filtered-path stress — while contributing fewer runs
    # than the 0.1% Filter tail, so the occurrence threshold stays on
    # background runs inside the device join's 32-shift envelope
    g = list(genome)
    for i in range(40):
        at = 2000 + i * 290
        g[at : at + len(motif)] = motif
    genome = "".join(g)
    reads, _ = sample_reads(rng, genome, 90, 2200, error=0.03)
    rs = ReadSet.from_sequences(reads)

    monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "0")
    _, h_ovl, h_filtered = _host_engine(rs, True)
    monkeypatch.delenv("RAVEN_TPU_DEVICE_MAP")
    capfd.readouterr()  # drain

    s_idx, s_ovl, s_filtered = _sharded_engine(rs, True, monkeypatch)
    err = capfd.readouterr().err
    assert "host fallback" not in err, f"sharded path degraded: {err}"

    assert set(s_ovl) == set(h_ovl)
    for rid in h_ovl:
        assert np.array_equal(h_ovl[rid], s_ovl[rid]), f"read {rid}"
    assert {k: sorted(v) for k, v in h_filtered.items()} == {
        k: sorted(v) for k, v in s_filtered.items()
    }
