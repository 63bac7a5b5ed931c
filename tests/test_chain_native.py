import numpy as np
import pytest

from raven_tpu.overlap import chain as chain_mod


@pytest.mark.skipif(
    chain_mod._native_chain() is None, reason="native chain unavailable"
)
def test_native_chain_matches_python(rng):
    for trial in range(10):
        n = int(rng.integers(40, 600))
        tid = rng.integers(0, 5, n).astype(np.uint32)
        same = rng.integers(0, 2, n).astype(np.uint8)
        # anchors roughly on diagonals so chains form
        qpos = rng.integers(0, 20000, n).astype(np.int64)
        offset = rng.integers(-200, 200, n)
        tpos = np.where(same.astype(bool), qpos + 5000 + offset, 30000 - qpos + offset)
        tpos = np.maximum(tpos, 0).astype(np.int64)

        py = chain_mod._chain_python_for_test(
            7, tid, same, qpos.copy(), tpos.copy(), 15, []
        )
        nat = chain_mod._chain_native(7, tid, same, qpos, tpos, 15)
        assert nat is not None
        assert py.shape == nat.shape
        for f in py.dtype.names:
            assert np.array_equal(py[f], nat[f]), f"field {f} mismatch"


@pytest.mark.skipif(
    chain_mod._native_chain() is None, reason="native chain unavailable"
)
def test_native_chain_anchors_match_python(rng):
    n = 400
    tid = rng.integers(0, 3, n).astype(np.uint32)
    same = rng.integers(0, 2, n).astype(np.uint8)
    qpos = rng.integers(0, 20000, n).astype(np.int64)
    offset = rng.integers(-150, 150, n)
    tpos = np.where(same.astype(bool), qpos + 3000 + offset, 25000 - qpos + offset)
    tpos = np.maximum(tpos, 0).astype(np.int64)

    py_anchors = []
    py = chain_mod._chain_python_for_test(
        5, tid, same, qpos.copy(), tpos.copy(), 15, py_anchors
    )
    nat_anchors = []
    nat = chain_mod._chain_native(
        5, tid, same, qpos, tpos, 15, anchors_out=nat_anchors
    )
    assert nat is not None and py.shape == nat.shape
    assert len(py_anchors) == len(nat_anchors) == py.size
    for (paq, pat), (naq, nat_) in zip(py_anchors, nat_anchors):
        assert np.array_equal(paq, naq)
        assert np.array_equal(pat, nat_)


@pytest.mark.skipif(
    chain_mod._native_chain_batch() is None,
    reason="native chain_batch unavailable",
)
@pytest.mark.parametrize("with_anchors", [False, True])
def test_chain_batch_matches_per_read(rng, with_anchors):
    """One-call batch chaining (C++ threads over reads) must produce
    exactly the per-read path's overlaps and anchors."""
    n = 5000
    q_id = np.sort(rng.integers(0, 40, n)).astype(np.int64)
    tid = rng.integers(41, 60, n).astype(np.uint32)
    same = rng.integers(0, 2, n).astype(np.uint8)
    qpos = rng.integers(0, 20000, n).astype(np.int64)
    offset = rng.integers(-150, 150, n)
    tpos = np.where(same.astype(bool), qpos + 3000 + offset, 25000 - qpos + offset)
    tpos = np.maximum(tpos, 0).astype(np.int64)

    uniq, starts = np.unique(q_id, return_index=True)
    bounds = np.append(starts, n)

    got: dict[int, np.ndarray] = {}
    got_anchors: dict | None = {} if with_anchors else None
    ok = chain_mod.chain_batch(
        uniq, bounds, tid, same, qpos, tpos, 15, got,
        anchors_out=got_anchors, workers=3,
    )
    assert ok

    for r, (u, s0, s1) in enumerate(zip(uniq, bounds[:-1], bounds[1:])):
        ref_anchors = [] if with_anchors else None
        ref = chain_mod.chain_matches(
            int(u), tid[s0:s1], same[s0:s1], qpos[s0:s1], tpos[s0:s1], 15,
            anchors_out=ref_anchors,
        )
        assert np.array_equal(got[int(u)], ref), f"read {u} overlaps differ"
        if with_anchors:
            assert len(got_anchors[int(u)]) == len(ref_anchors)
            for (gq, gt), (rq, rt) in zip(got_anchors[int(u)], ref_anchors):
                assert np.array_equal(gq, rq) and np.array_equal(gt, rt)


@pytest.mark.skipif(
    chain_mod._native_chain_batch() is None,
    reason="native chain_batch unavailable",
)
def test_chain_batch_dense_one_overlap_per_group(rng):
    """Dense case: every 4-anchor diagonal group yields one overlap; the
    batch path must agree with the per-read path overlap-for-overlap
    (the per-read capacity formula covers the theoretical max of
    n // MIN_MATCHES chains, so this also exercises near-capacity fill)."""
    n_targets = 80
    anchors_per = 4
    rows = []
    for t in range(n_targets):
        base = 200 * t
        for a in range(anchors_per):
            rows.append((t + 1, 1, base + a * 40, 5000 + base + a * 40))
    arr = np.array(rows, dtype=np.int64)
    tid = arr[:, 0].astype(np.uint32)
    same = arr[:, 1].astype(np.uint8)
    qpos = arr[:, 2]
    tpos = arr[:, 3]
    n = tid.size
    q_id = np.zeros(n, dtype=np.int64)
    uniq = np.array([0], dtype=np.int64)
    bounds = np.array([0, n], dtype=np.int64)

    got: dict[int, np.ndarray] = {}
    ok = chain_mod.chain_batch(
        uniq, bounds, tid, same, qpos, tpos, 15, got, workers=2
    )
    assert ok
    ref = chain_mod.chain_matches(0, tid, same, qpos, tpos, 15)
    assert np.array_equal(got[0], ref)
    assert got[0].size == n_targets  # every 4-anchor diagonal chains
