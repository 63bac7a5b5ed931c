"""Self-join fast path vs generic lookup join: exact overlap-set parity.

The construct phase's mapping must be byte-identical whichever join engine
runs (generic searchsorted lookup, host distance self-join, or the device
mapper).  These tests pin the host fast path against the legacy path on
every minhash combination the pipeline uses.
"""

import numpy as np
import pytest

from tests.conftest import random_genome, sample_reads
from raven_tpu.io.readset import ReadSet
from raven_tpu.overlap.engine import MinimizerIndex


def _readset(seed=7, genome_len=60000, coverage=8):
    rng = np.random.default_rng(seed)
    genome = random_genome(rng, genome_len)
    n_reads = genome_len * coverage // 4000
    reads, _ = sample_reads(rng, genome, n_reads, mean_len=4000, error=0.08)
    return ReadSet.from_sequences(reads)


def _legacy_map_many(index, readset, ids, minhash, filtered_out=None):
    """Force the generic path by hiding the self-join metadata."""
    saved = index._selfjoin_enabled
    index._selfjoin_enabled = False
    try:
        return index.map_many(
            readset, ids, minhash=minhash, filtered_out=filtered_out
        )
    finally:
        index._selfjoin_enabled = saved


def _assert_equal_results(a, b):
    assert set(a) == set(b)
    for rid in a:
        x, y = a[rid], b[rid]
        # overlap outputs are sets (chain order is canonical); sort both
        xs = np.sort(x, order=["rhs_id", "strand", "lhs_begin", "rhs_begin"])
        ys = np.sort(y, order=["rhs_id", "strand", "lhs_begin", "rhs_begin"])
        assert np.array_equal(xs, ys), f"read {rid} differs"


@pytest.mark.parametrize(
    "index_minhash,query_minhash",
    [(False, True), (False, False), (True, True)],
)
def test_selfjoin_matches_legacy(index_minhash, query_minhash):
    rs = _readset()
    ids = np.arange(len(rs))
    index = MinimizerIndex(15, 5)
    index.minimize(
        rs, ids, minhash=index_minhash, with_query_flags=not index_minhash
    )
    index.filter(0.001)
    assert index._selfjoin_compatible(ids, True, True, query_minhash)

    fast = index.map_many(rs, ids, minhash=query_minhash)
    legacy = _legacy_map_many(index, rs, ids, minhash=query_minhash)
    _assert_equal_results(fast, legacy)
    total = sum(v.size for v in fast.values())
    assert total > 0, "degenerate test: no overlaps produced"


def test_selfjoin_partial_batch_and_filtered_out():
    rs = _readset(seed=11)
    n = len(rs)
    index = MinimizerIndex(15, 5)
    index.minimize(rs, np.arange(n), minhash=False, with_query_flags=True)
    index.filter(0.01)  # aggressive filter so filtered_out is non-empty

    ids = np.arange(0, n // 2)
    f_fast: dict = {}
    f_legacy: dict = {}
    fast = index.map_many(rs, ids, minhash=False, filtered_out=f_fast)
    legacy = _legacy_map_many(
        index, rs, ids, minhash=False, filtered_out=f_legacy
    )
    _assert_equal_results(fast, legacy)
    assert {k: sorted(v) for k, v in f_fast.items()} == {
        k: sorted(v) for k, v in f_legacy.items()
    }
    assert f_fast, "degenerate test: nothing filtered"


def test_selfjoin_anchors_match_legacy():
    rs = _readset(seed=3, genome_len=30000, coverage=6)
    ids = np.arange(len(rs))
    index = MinimizerIndex(15, 5)
    index.minimize(rs, ids, minhash=False)
    index.filter(0.001)

    a_fast: dict = {}
    a_legacy: dict = {}
    fast = index.map_many(rs, ids, minhash=False, anchors_out=a_fast)
    legacy = _legacy_map_many(index, rs, ids, minhash=False)
    index._selfjoin_enabled = False
    legacy = index.map_many(rs, ids, minhash=False, anchors_out=a_legacy)
    index._selfjoin_enabled = True
    _assert_equal_results(fast, legacy)
    for rid in fast:
        fa = a_fast.get(rid, [])
        la = a_legacy.get(rid, [])
        assert len(fa) == len(la)


def test_selfjoin_incompatible_falls_back():
    rs = _readset(seed=5, genome_len=20000, coverage=5)
    ids = np.arange(len(rs))
    index = MinimizerIndex(15, 5)
    index.minimize(rs, ids, minhash=True)
    index.filter(0.001)
    # minhash index cannot serve full-sketch queries via self-join
    assert not index._selfjoin_compatible(ids, True, True, False)
    # a subset of the build set is fine; ids outside it are not
    assert index._selfjoin_compatible(np.array([0, 2, 4]), True, True, True)
    assert not index._selfjoin_compatible(
        np.array([0, len(rs) + 5]), True, True, True
    )


def test_filter_distribution_contract():
    """ram Filter semantics pinned at the distribution level: filter(f)
    must pick the smallest occurrence threshold that keeps at least
    (1 - f) of the DISTINCT minimizers usable, and map-time queries must
    drop exactly the runs above it (reference ram engine Filter, used at
    construct.cc:44)."""
    rs = _readset(seed=11)
    index = MinimizerIndex(15, 5)
    index.minimize(rs, np.arange(len(rs)))
    counts = index._uniq_count
    n = counts.size
    for f in (0.001, 0.01, 0.05):
        index.filter(f)
        occ = index._occurrence
        kept = (counts <= occ).sum() / n
        assert kept >= 1.0 - f, (f, occ, kept)
        # minimality: one step tighter would drop below the target,
        # unless the quantile landed inside a tie plateau
        tighter = (counts <= occ - 1).sum() / n
        sorted_counts = np.sort(counts)
        idx = min(int((1.0 - f) * n), n - 1)
        assert occ == int(sorted_counts[idx])
        if tighter >= 1.0 - f:
            assert int(sorted_counts[idx]) == occ  # tie plateau case
    # behavioral check: with an aggressive filter, high-frequency runs
    # are reported in filtered_out and never produce matches
    index.filter(0.05)
    occ = index._occurrence
    hot = set(index._uniq[index._uniq_count > occ].tolist())
    assert hot, "degenerate test: no run above the threshold"
    filtered = {}
    res = index.map_many(
        rs, np.arange(len(rs)), minhash=False, filtered_out=filtered
    )
    assert filtered, "aggressive filter must report filtered positions"
    # no emitted overlap may be built on a filtered-out-only read pair:
    # weaker but order-independent — total matches shrink vs no filter
    index2 = MinimizerIndex(15, 5)
    index2.minimize(rs, np.arange(len(rs)))
    index2.filter(0.0)
    res_all = index2.map_many(rs, np.arange(len(rs)), minhash=False)
    n_f = sum(v.size for v in res.values())
    n_all = sum(v.size for v in res_all.values())
    assert n_f <= n_all
