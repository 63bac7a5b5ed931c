import numpy as np
import pytest

from raven_tpu.ops.poa import _native_poa, poa_consensus, poa_consensus_py


def mutate(rng, codes, sub=0.05, ind=0.05):
    out = []
    for c in codes:
        r = rng.random()
        if r < ind / 2:
            continue  # deletion
        if r < ind:
            out.append(int(rng.integers(0, 4)))  # insertion
            out.append(int(c))
            continue
        if r < ind + sub:
            out.append((int(c) + int(rng.integers(1, 4))) % 4)
        else:
            out.append(int(c))
    return np.array(out, dtype=np.uint8)


def test_poa_identical_fragments(rng):
    truth = rng.integers(0, 4, 100).astype(np.uint8)
    frags = [truth.copy() for _ in range(5)]
    cons = poa_consensus(truth, frags, trim=False)
    assert np.array_equal(cons, truth)


def test_poa_corrects_noisy_backbone(rng):
    """Backbone carries errors; clean fragments outvote it."""
    truth = rng.integers(0, 4, 200).astype(np.uint8)
    backbone = mutate(rng, truth, sub=0.1, ind=0.08)
    frags = [mutate(rng, truth, sub=0.02, ind=0.02) for _ in range(8)]
    cons = poa_consensus(backbone, frags, trim=False)
    from raven_tpu.ops.edit_distance import edit_distance

    ed_before = edit_distance(backbone, truth)
    ed_after = edit_distance(cons, truth)
    assert ed_after < ed_before * 0.4


def test_poa_consensus_from_noisy_fragments(rng):
    """Raven-style case: backbone is itself one noisy read, fragments are
    other noisy reads; consensus should converge towards the truth."""
    truth = rng.integers(0, 4, 300).astype(np.uint8)
    backbone = mutate(rng, truth, sub=0.06, ind=0.06)
    frags = [mutate(rng, truth, sub=0.06, ind=0.06) for _ in range(12)]
    cons = poa_consensus(backbone, frags, trim=False)
    from raven_tpu.ops.edit_distance import edit_distance

    ed = edit_distance(cons, truth)
    assert ed < 0.03 * truth.size


@pytest.mark.skipif(_native_poa() is None, reason="native POA unavailable")
def test_poa_native_matches_python_oracle(rng):
    for _ in range(5):
        truth = rng.integers(0, 4, 60).astype(np.uint8)
        backbone = mutate(rng, truth, sub=0.08, ind=0.05)
        frags = [mutate(rng, truth, sub=0.05, ind=0.05) for _ in range(4)]
        weights = [np.full(f.size, 10, np.uint8) for f in frags]
        a = poa_consensus(backbone, frags, weights, trim=True)
        b = poa_consensus_py(backbone, frags, weights, trim=True)
        assert np.array_equal(a, b)


def test_poa_trim_low_support_ends(rng):
    truth = rng.integers(0, 4, 120).astype(np.uint8)
    backbone = truth.copy()
    # fragments only cover the middle [20, 100)
    frags = [truth[20:100].copy() for _ in range(6)]
    cons = poa_consensus(backbone, frags, trim=True)
    # ends with support < nfrags/2 are trimmed
    assert cons.size <= 100 - 20 + 2
    assert cons.size >= 60
