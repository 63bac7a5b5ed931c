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
