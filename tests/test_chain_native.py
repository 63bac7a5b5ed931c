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
