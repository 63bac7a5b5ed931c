"""Device-resident index (overlap/device_index.py) vs host path: exact
parity of the built index, the occurrence filter, and the emitted overlap
sets.  Runs on the CPU backend (conftest pins JAX_PLATFORMS=cpu) with the
device path force-enabled via RAVEN_TPU_DEVICE_MAP=1 — the same kernels
compile for TPU unchanged.
"""

import numpy as np
import pytest

from tests.conftest import random_genome, sample_reads
from raven_tpu.io.readset import ReadSet
from raven_tpu.overlap.engine import MinimizerIndex

jax = pytest.importorskip("jax")


def _readset(seed=11, genome_len=50000, coverage=8):
    rng = np.random.default_rng(seed)
    genome = random_genome(rng, genome_len)
    n_reads = genome_len * coverage // 4000
    reads, _ = sample_reads(rng, genome, n_reads, mean_len=4000, error=0.08)
    return ReadSet.from_sequences(reads)


def _device_index(rs, ids, minhash=False, with_flags=True, monkeypatch=None):
    monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "1")
    idx = MinimizerIndex(15, 5)
    idx.minimize(rs, ids, minhash=minhash, with_query_flags=with_flags)
    assert idx._device is not None, "device build did not engage"
    return idx


def _host_index(rs, ids, minhash=False, with_flags=True, monkeypatch=None):
    monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "0")
    idx = MinimizerIndex(15, 5)
    idx.minimize(rs, ids, minhash=minhash, with_query_flags=with_flags)
    assert idx._device is None
    return idx


def _entry_tuples(h, i, p, s, f):
    cols = [h, i, p, s] + ([f.astype(np.uint8)] if f is not None else [])
    return sorted(zip(*(c.tolist() for c in cols)))


@pytest.mark.parametrize("minhash", [False, True])
def test_build_parity(monkeypatch, minhash):
    rs = _readset()
    ids = np.arange(len(rs))
    dev = _device_index(rs, ids, minhash=minhash, monkeypatch=monkeypatch)
    host = _host_index(rs, ids, minhash=minhash, monkeypatch=monkeypatch)

    dh, di, dp, ds, df = dev._device.to_host()
    assert dev.num_minimizers == host.num_minimizers
    if minhash:
        df = None  # host minhash build carries no flags (all entries kept)
    assert _entry_tuples(dh, di, dp, ds, df) == _entry_tuples(
        host._hashes,
        host._ids,
        host._pos,
        host._strand,
        host._qflag if not minhash else None,
    )


@pytest.mark.parametrize("freq", [0.001, 0.01, 0.05])
def test_occurrence_parity(monkeypatch, freq):
    rs = _readset()
    ids = np.arange(len(rs))
    dev = _device_index(rs, ids, monkeypatch=monkeypatch)
    host = _host_index(rs, ids, monkeypatch=monkeypatch)
    dev.filter(freq)
    host.filter(freq)
    assert dev._occurrence == host._occurrence


def _sorted_results(res):
    out = {}
    for rid, arr in res.items():
        out[rid] = np.sort(
            arr, order=["rhs_id", "strand", "lhs_begin", "rhs_begin"]
        )
    return out


@pytest.mark.parametrize(
    "index_minhash,query_minhash",
    [(False, True), (False, False), (True, True)],
)
def test_map_many_parity(monkeypatch, index_minhash, query_minhash):
    rs = _readset()
    ids = np.arange(len(rs))
    dev = _device_index(
        rs,
        ids,
        minhash=index_minhash,
        with_flags=not index_minhash,
        monkeypatch=monkeypatch,
    )
    host = _host_index(
        rs,
        ids,
        minhash=index_minhash,
        with_flags=not index_minhash,
        monkeypatch=monkeypatch,
    )
    dev.filter(0.001)
    host.filter(0.001)
    assert dev._occurrence == host._occurrence

    fdev: dict = {}
    fhost: dict = {}
    rdev = dev.map_many(rs, ids, minhash=query_minhash, filtered_out=fdev)
    assert dev._hashes is None, "device join fell back to host"
    rhost = host.map_many(rs, ids, minhash=query_minhash, filtered_out=fhost)

    a, b = _sorted_results(rdev), _sorted_results(rhost)
    assert set(a) == set(b)
    for rid in a:
        assert np.array_equal(a[rid], b[rid]), f"read {rid} differs"
    assert {k: sorted(v) for k, v in fdev.items()} == {
        k: sorted(v) for k, v in fhost.items()
    }


def test_map_subset_batch_parity(monkeypatch):
    """Stage -4 pattern: index a subset of reads, map them in sub-batches."""
    rs = _readset(seed=5)
    valid = np.arange(0, len(rs), 2)  # non-contiguous id subset
    dev = _device_index(rs, valid, monkeypatch=monkeypatch)
    host = _host_index(rs, valid, monkeypatch=monkeypatch)
    dev.filter(0.001)
    host.filter(0.001)

    half = valid[: valid.size // 2]
    rdev = dev.map_many(rs, half, minhash=False)
    rhost = host.map_many(rs, half, minhash=False)
    a, b = _sorted_results(rdev), _sorted_results(rhost)
    assert set(a) == set(b)
    for rid in a:
        assert np.array_equal(a[rid], b[rid])


def test_materialize_fallback(monkeypatch):
    """Generic per-read map() on a device-built index transfers the columns
    and must match a host-built index exactly."""
    rs = _readset(seed=3)
    ids = np.arange(len(rs))
    dev = _device_index(rs, ids, monkeypatch=monkeypatch)
    host = _host_index(rs, ids, monkeypatch=monkeypatch)
    dev.filter(0.001)
    host.filter(0.001)
    for rid in [0, 3, 7]:
        a = dev.map(rs, rid)
        b = host.map(rs, rid)
        assert np.array_equal(
            np.sort(a, order=["rhs_id", "strand", "lhs_begin", "rhs_begin"]),
            np.sort(b, order=["rhs_id", "strand", "lhs_begin", "rhs_begin"]),
        )


def test_join_flatten_pads_to_capj():
    """The flattened code stream must be exactly capj long (sentinel
    padded): the reconstruction slab walk dynamic-slices at multiples of
    RECON_SLAB, and a shorter stream would clamp the last slab's start and
    decode entries from the wrong offset.  The sort-free flatten takes
    per-distance PREFIX-compacted windows (valid codes first) plus their
    counts and must compact them densely via the INF-tail-overwrite
    chain of dynamic updates."""
    import jax.numpy as jnp

    from raven_tpu.overlap import device_index as di

    INF = 0xFFFFFFFF
    # two buckets: first has 2 distance windows (capd=4), second 1 (capd=2)
    parts = [
        jnp.asarray(
            np.array([1, 5, INF, INF, 3, INF, INF, INF], dtype=np.uint32)
        ),
        jnp.asarray(np.array([7, 9], dtype=np.uint32)),
    ]
    counts = [
        jnp.asarray(np.array([2, 1], dtype=np.int32)),
        jnp.asarray(np.array([2], dtype=np.int32)),
    ]
    capj = 1 << 14
    out = np.asarray(di._flatten_recon_jit(parts, counts, capj))
    assert out.shape == (capj,)
    assert out[:5].tolist() == [1, 5, 3, 7, 9]
    assert (out[5:] == INF).all()


def test_pair_code_domain_bound():
    """uint32 pair codes gidx*(MAX_D+1)+d must never wrap or collide with
    the 0xFFFFFFFF sentinel within the advertised join-table envelope
    (advisor round-2 high finding)."""
    from raven_tpu.overlap.device_index import MAX_D, SAFE_JOIN_ENTRIES

    # largest permitted gidx encodes below the sentinel for every distance
    gmax = np.uint64(SAFE_JOIN_ENTRIES - 1)
    code_hi = gmax * np.uint64(MAX_D + 1) + np.uint64(MAX_D)
    assert code_hi < np.uint64(0xFFFFFFFF)
    # and decodes back exactly in uint32 arithmetic
    c32 = np.uint32(code_hi)
    assert int(c32) // (MAX_D + 1) == int(gmax)
    assert int(c32) % (MAX_D + 1) == MAX_D
    # one entry beyond the bound: some (gidx, d) either wraps past 2^32 or
    # lands exactly on the sentinel -> the bound is tight
    gbad = np.uint64(SAFE_JOIN_ENTRIES)
    bad = gbad * np.uint64(MAX_D + 1) + np.uint64(MAX_D)
    assert bad >= np.uint64(0xFFFFFFFF)


def test_join_declines_beyond_code_domain(monkeypatch):
    """distance_join must return None (host fallback) when the compacted
    usable table exceeds the uint32 code domain."""
    import raven_tpu.overlap.device_index as di

    rs = _readset(genome_len=20000, coverage=6)
    ids = np.arange(len(rs))
    idx = _device_index(rs, ids, monkeypatch=monkeypatch)
    dev = idx._device
    dev._jcache = None
    monkeypatch.setattr(
        di, "_usable_count", lambda *a, **k: di.SAFE_JOIN_ENTRIES + 1
    )
    batch = np.ones(len(rs), dtype=bool)
    assert dev.distance_join(4, batch, need_flags=False) is None


@pytest.mark.parametrize("minhash", [False, True])
def test_partitioned_index_parity(monkeypatch, minhash):
    """Hash-range-partitioned index (forced 3 partitions) must reproduce
    the host path exactly: entries, Filter occurrence, flags (global
    rank across partitions), filtered-out positions, and the full
    map_many overlap sets (device-chained over the concatenated
    partition matches)."""
    rs = _readset()
    ids = np.arange(len(rs))

    monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "1")
    monkeypatch.setenv("RAVEN_TPU_INDEX_PARTS", "3")
    from raven_tpu.overlap.device_index import PartitionedIndex

    part = MinimizerIndex(15, 5)
    part.minimize(rs, ids, minhash=minhash, with_query_flags=not minhash)
    assert isinstance(part._device, PartitionedIndex)
    assert len(part._device.parts) == 3
    monkeypatch.delenv("RAVEN_TPU_INDEX_PARTS")

    host = _host_index(
        rs, ids, minhash=minhash, with_flags=not minhash,
        monkeypatch=monkeypatch,
    )
    assert part.num_minimizers == host.num_minimizers

    ph, pi, pp, ps, pf = part._device.to_host()
    if minhash:
        pf = None
    assert _entry_tuples(ph, pi, pp, ps, pf) == _entry_tuples(
        host._hashes,
        host._ids,
        host._pos,
        host._strand,
        host._qflag if not minhash else None,
    )

    part.filter(0.001)
    host.filter(0.001)
    assert part._occurrence == host._occurrence

    pf_out, hf_out = {}, {}
    p_ovl = part.map_many(rs, ids, minhash=True, filtered_out=pf_out)
    h_ovl = host.map_many(rs, ids, minhash=True, filtered_out=hf_out)
    assert set(p_ovl) == set(h_ovl)
    for rid in h_ovl:
        assert np.array_equal(p_ovl[rid], h_ovl[rid]), f"read {rid}"
    assert {k: sorted(v) for k, v in pf_out.items()} == {
        k: sorted(v) for k, v in hf_out.items()
    }


def test_partitioned_construct_end_to_end(monkeypatch, tmp_path):
    """Full construct through the hash-range-partitioned index (forced 2
    partitions) == host construct, stage by stage via the parity dump."""
    import json

    import raven_tpu.overlap.device_index as di
    from raven_tpu.config import OverlapPhaseCfg
    from raven_tpu.graph import Graph, construct_graph

    built = []
    orig_build = di.PartitionedIndex.build.__func__

    def spy_build(cls, *a, **kw):
        r = orig_build(cls, *a, **kw)
        built.append(r is not None)
        return r

    monkeypatch.setattr(
        di.PartitionedIndex, "build", classmethod(spy_build)
    )

    rng = np.random.default_rng(23)
    genome = random_genome(rng, 20000)
    reads, _ = sample_reads(rng, genome, 90, 2500, error=0.04)

    def run(tag, partitioned):
        rs = ReadSet.from_sequences(reads)
        if partitioned:
            monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "1")
            monkeypatch.setenv("RAVEN_TPU_INDEX_PARTS", "2")
        else:
            monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "0")
        monkeypatch.setenv("RAVEN_TPU_STAGE_DUMP", str(tmp_path / tag))
        try:
            g = Graph()
            construct_graph(g, rs, OverlapPhaseCfg(use_minhash=True))
        finally:
            monkeypatch.delenv("RAVEN_TPU_STAGE_DUMP")
            monkeypatch.delenv("RAVEN_TPU_DEVICE_MAP")
            if partitioned:
                monkeypatch.delenv("RAVEN_TPU_INDEX_PARTS")
        recs = []
        with open(tmp_path / tag / "stages.jsonl") as fh:
            for line in fh:
                recs.append(json.loads(line))
        return g, recs

    g_host, recs_host = run("host", partitioned=False)
    g_part, recs_part = run("part", partitioned=True)
    assert built and all(built), "partitioned build did not engage"
    assert recs_part == recs_host, "per-stage parity dump diverged"
    assert sorted(n.id for n in g_part.live_nodes()) == sorted(
        n.id for n in g_host.live_nodes()
    )


def test_partitioned_occurrence_clipped_tail():
    """PartitionedIndex.occurrence_for must compute the exact global
    quantile even when it lands past the 4096-bin histogram tail
    (cross-partition binary search)."""
    import jax.numpy as jnp

    from raven_tpu.overlap.device_index import (
        DeviceIndex,
        PartitionedIndex,
        _RHBINS,
    )

    def make_part(run_lengths, base):
        keys = []
        for i, c in enumerate(run_lengths):
            keys.extend([base + i] * c)
        N = 1 << 14
        key = np.full(N, 0xFFFFFFFF, np.uint32)
        key[: len(keys)] = np.array(keys, np.uint32)
        rid = np.zeros(N, np.int32)
        packed = np.zeros(N, np.int32)
        return DeviceIndex(
            jnp.asarray(key), jnp.asarray(rid), jnp.asarray(packed),
            len(keys), False, 15, 5,
        )

    # two partitions; one run far past the histogram clip (4096)
    runs_a = [6000, 9] + [2] * 200
    runs_b = [4500] + [3] * 300
    part = PartitionedIndex(
        [make_part(runs_a, 0), make_part(runs_b, 1 << 20)], 15, 5, False
    )
    all_runs = np.sort(np.array(runs_a + runs_b))
    for f in (0.0005, 0.001, 0.004, 0.05):
        target = min(int((1.0 - f) * all_runs.size), all_runs.size - 1)
        expected = int(all_runs[target])
        got = part.occurrence_for(f)
        assert got == expected, (f, got, expected)
        if expected >= _RHBINS - 1:
            assert got >= _RHBINS - 1  # exercised the exact tail path


def test_chunk_sort_packed_matches_wide():
    """The 2-lane packed chunk sort (narrow_sort=True) must emit exactly
    the 3-key wide sort's output — key/rid/packed/count all bit-equal
    (it is the same lexicographic order, re-packed; device_index.py
    _chunk_sketch_compact)."""
    import jax.numpy as jnp

    from raven_tpu.overlap import device_index as di

    rs = _readset(seed=23, genome_len=60000, coverage=8)
    ids = np.arange(len(rs))
    codes, eff, rids, base, clo, chi = di.segment_reads_packed(
        rs, ids, 15, 5, width=di.SEG_WIDTH
    )
    S = codes.shape[0]
    chunk = di._pow2_at_least(S, 256, 8192)
    S_pad = -(-S // chunk) * chunk
    stacks = []
    for a in (codes, eff, rids, base, clo, chi):
        if S_pad != S:
            a = np.concatenate(
                [a, np.zeros((S_pad - S,) + a.shape[1:], dtype=a.dtype)]
            )
        stacks.append(
            jnp.asarray(a.reshape((-1, chunk) + a.shape[1:]))
        )
    budget = (
        np.asarray(rs.lengths, dtype=np.int64) // 15
    ).astype(np.int32)
    cap = max(4096, int(chunk * di.SEG_WIDTH * 0.35) // 4096 * 4096)
    outs = {}
    for narrow, cap_row in (
        (False, di.SEG_WIDTH),  # wide 3-key sort, no row compaction
        (True, di.SEG_WIDTH),   # packed 2-lane sort
        (True, 1024),           # packed + row pre-compaction
    ):
        outs[(narrow, cap_row)] = di._chunk_sketch_compact(
            *stacks, jnp.asarray(budget), 15, 5, False, cap, True,
            narrow_sort=narrow, cap_row=cap_row,
        )
    ref = outs[(False, di.SEG_WIDTH)]
    for variant, out in outs.items():
        for a, b, name in zip(
            ref, out, ("key", "rid", "packed", "counts")
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (
                variant, name,
            )


def test_high_occurrence_stays_on_device(monkeypatch):
    """Occurrence values up to MAX_D + 1 = 41 must run the device join —
    the old MAX_D = 32 silently host-joined whole constructs whose
    Filter quantile landed at 34-41 (ecoli@50x synthetic filters to
    occurrence 35)."""
    from raven_tpu.overlap import device_index as di

    assert di.MAX_D >= 40

    rs = _readset(seed=31)
    ids = np.arange(len(rs))
    dev = _device_index(rs, ids, monkeypatch=monkeypatch)
    host = _host_index(rs, ids, monkeypatch=monkeypatch)
    for idx in (dev, host):
        idx.filter(0.001)
        idx._occurrence = 35  # force the regression regime
    rdev = dev.map_many(rs, ids, minhash=True)
    assert dev._hashes is None, "device join fell back to host at occ 35"
    rhost = host.map_many(rs, ids, minhash=True)
    a, b = _sorted_results(rdev), _sorted_results(rhost)
    assert set(a) == set(b)
    for rid in a:
        assert np.array_equal(a[rid], b[rid]), f"read {rid} differs"
