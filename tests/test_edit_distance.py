import numpy as np
import pytest

from raven_tpu.ops.edit_distance import _numpy_ed, edit_distance


def naive_ed(a: str, b: str) -> int:
    n, m = len(a), len(b)
    d = np.zeros((n + 1, m + 1), dtype=int)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i, j] = min(
                d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                d[i - 1, j] + 1,
                d[i, j - 1] + 1,
            )
    return int(d[n, m])


CASES = [
    ("", ""),
    ("A", ""),
    ("", "ACGT"),
    ("ACGT", "ACGT"),
    ("ACGT", "AGGT"),
    ("AAAA", "TTTT"),
    ("ACGTACGT", "ACGACGT"),
    ("GATTACA" * 3, "GATACCA" * 3),
]


@pytest.mark.parametrize("a,b", CASES)
def test_edit_distance_small(a, b):
    assert edit_distance(a, b) == naive_ed(a, b)
    from raven_tpu.io.readset import encode

    assert _numpy_ed(encode(a) if a else np.empty(0, np.uint8),
                     encode(b) if b else np.empty(0, np.uint8)) == naive_ed(a, b)


def test_edit_distance_random(rng):
    alphabet = "ACGT"
    for _ in range(20):
        n = int(rng.integers(0, 200))
        m = int(rng.integers(0, 200))
        a = "".join(rng.choice(list(alphabet), n))
        b = "".join(rng.choice(list(alphabet), m))
        assert edit_distance(a, b) == naive_ed(a, b)


def test_edit_distance_long_blocks(rng):
    """Cross-check native block-Myers against the numpy path on inputs
    longer than one 64-bit block."""
    from raven_tpu.io.readset import encode

    for _ in range(5):
        n = int(rng.integers(100, 500))
        m = int(rng.integers(100, 500))
        a = rng.integers(0, 4, n).astype(np.uint8)
        b = rng.integers(0, 4, m).astype(np.uint8)
        assert edit_distance(a, b) == _numpy_ed(a, b)


def test_banded_matches_full_random():
    """Block-banded Myers + Ukkonen doubling must equal the full kernel on
    random pairs across length ratios and error rates."""
    from raven_tpu.ops.edit_distance import (
        edit_distance,
        edit_distance_banded,
    )

    rng = np.random.default_rng(7)
    for n, m, err in [
        (1, 1, 0), (5, 300, 0), (300, 5, 0),
        (1000, 1000, 0.01), (1000, 1000, 0.3),
        (5000, 4821, 0.05), (4821, 5000, 0.05),
        (700, 700, 0.0), (257, 321, 0.5),
    ]:
        a = rng.integers(0, 4, size=n).astype(np.uint8)
        if err == 0 and n == m:
            b = a.copy()
        else:
            b = rng.integers(0, 4, size=m).astype(np.uint8)
            if err < 0.2 and n == m:
                b = a.copy()
                k = int(err * n)
                idx = rng.integers(0, n, size=k)
                b[idx] = (b[idx] + 1) % 4
        full = edit_distance(a, b)
        for k0 in (64, 4096):
            assert edit_distance_banded(a, b, k0=k0) == full, (n, m, err, k0)


def test_banded_insertion_heavy():
    """Length-difference-dominated cases exercise the band offsets."""
    from raven_tpu.ops.edit_distance import (
        edit_distance,
        edit_distance_banded,
    )

    rng = np.random.default_rng(8)
    a = rng.integers(0, 4, size=3000).astype(np.uint8)
    b = np.concatenate(
        [a[:1000], rng.integers(0, 4, size=500).astype(np.uint8), a[1000:]]
    )
    assert edit_distance_banded(a, b) == edit_distance(a, b)
    assert edit_distance_banded(b, a) == edit_distance(b, a)
