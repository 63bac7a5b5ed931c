import collections

import numpy as np

from raven_tpu.pile import K_PSS, Piles, find_slopes, merge_regions


def slopes_oracle(data, q):
    """Independent deque-based transcription of the detection sweep
    (part 1 of reference pile.cc:403-472) used to cross-check the
    vectorized implementation."""
    w = 847 >> K_PSS
    size = len(data)
    d = [min(int(float(x) * q), 65535) for x in data]

    def clamp(v):
        return min(int(v), 65535)

    left = collections.deque()
    right = collections.deque()

    def add(s, value, position):
        while s and s[-1][1] <= value:
            s.pop()
        s.append((position, value))

    def update(s, position):
        while s and s[0][0] <= position:
            s.popleft()

    downs, ups = [], []
    for i in range(min(w, size)):
        add(right, data[i], i)
    for i in range(size):
        if i > 0:
            add(left, data[i - 1], i - 1)
        update(left, i - 1 - w)
        if i < size - w:
            add(right, data[i + w], i + w)
        update(right, i)
        if i != 0 and left and left[0][1] > d[i]:
            downs.append(i)
        if i != size - 1 and right and right[0][1] > d[i]:
            ups.append(i)
    return downs, ups


def test_merge_regions():
    assert merge_regions([(0, 5), (3, 8), (10, 12)]) == [(0, 8), (10, 12)]
    # touching regions are NOT merged (strict comparison)
    assert merge_regions([(0, 5), (5, 8)]) == [(0, 5), (5, 8)]
    assert merge_regions([]) == []


def test_slope_detection_matches_oracle(rng):
    for trial in range(10):
        size = int(rng.integers(100, 800))
        data = rng.integers(0, 30, size=size).astype(np.uint16)
        # add some plateaus and cliffs
        for _ in range(3):
            s = int(rng.integers(0, size - 10))
            data[s : s + int(rng.integers(5, 50))] += int(rng.integers(10, 60))
        downs, ups = slopes_oracle(data, 1.82)
        from raven_tpu.pile.pile import detect_slope_marks

        down_v, up_v = detect_slope_marks(data, 1.82)
        assert set(downs) == set(np.nonzero(down_v)[0].tolist())
        assert set(ups) == set(np.nonzero(up_v)[0].tolist())
        # the full pipeline must at least run without error
        find_slopes(data, 1.82)


def test_add_layers_and_valid_region():
    lens = np.array([3200, 1600])
    piles = Piles(lens)
    # read 0: covered by 5 overlaps over [160, 3040)
    ids = np.full(5, 0)
    piles.add_layers(ids, np.full(5, 160), np.full(5, 3040))
    row = piles.row(0)
    assert row[(160 >> 4) + 1] == 5
    assert row[(3040 >> 4) - 2] == 5
    assert row[(3040 >> 4) - 1] == 0  # exclusive at (end>>4)-1
    piles.find_valid_region(0, 4)
    assert not piles.is_invalid[0]
    assert piles.begin[0] == (160 >> 4) + 1
    assert piles.end[0] == (3040 >> 4) - 1
    # read 1: no coverage -> invalid
    piles.find_valid_region(1, 4)
    assert piles.is_invalid[1]


def test_add_layers_saturation():
    piles = Piles(np.array([1600]))
    n = 70000
    piles.add_layers(np.zeros(n, int), np.zeros(n, int), np.full(n, 1600))
    assert piles.row(0)[5] == 65535  # saturated, no wraparound


def test_valid_region_min_length():
    piles = Piles(np.array([3200]))
    # short covered stretch (< 1260 bases) -> invalid
    ids = np.full(5, 0)
    piles.add_layers(ids, np.full(5, 160), np.full(5, 1200))
    piles.find_valid_region(0, 4)
    assert piles.is_invalid[0]


def test_find_median():
    piles = Piles(np.array([1600]))
    piles.row(0)[:] = np.arange(100, dtype=np.uint16)
    piles.begin[0], piles.end[0] = 0, 100
    piles.find_median(0)
    assert piles.median[0] == 50  # upper median


def test_chimeric_detection():
    """A coverage valley in the middle should yield a chimeric region and
    clear_chimeric_regions should keep the longest side."""
    piles = Piles(np.array([160000]))
    row = piles.row(0)
    n = row.size
    row[:] = 20
    row[n // 3 : n // 3 + 3] = 1  # sharp dip
    piles.begin[0], piles.end[0] = 0, n
    piles.find_chimeric_regions(0)
    assert piles.is_maybe_chimeric(0)
    piles.clear_chimeric_regions(0, median=20)
    assert piles.is_chimeric[0]
    # longest side kept: the right side (2/3 of the read)
    assert piles.begin[0] >= n // 3
    assert not piles.is_invalid[0]


def test_repetitive_detection_from_spike():
    piles = Piles(np.array([160000]))
    row = piles.row(0)
    n = row.size
    row[:] = 10
    mid = n // 2
    row[mid - 20 : mid + 20] = 60  # strong spike vs median 10
    piles.begin[0], piles.end[0] = 0, n
    piles.find_repetitive_regions(0, median=10)
    assert piles.is_repetitive[0]
    assert piles.repetitive_regions[0]
    lo, hi = piles.repetitive_regions[0][0]
    assert (lo >> 1) < mid < hi


def test_repetitive_update_and_check():
    piles = Piles(np.array([160000]))
    n = piles.row(0).size
    piles.begin[0], piles.end[0] = 0, n
    # repeat region near read begin
    piles.repetitive_regions[0] = [(2 << 1, 40)]
    # overlap at the read begin extending past the repeat end + fuzz
    end = (40 + (420 >> K_PSS) + 2) << K_PSS
    piles.update_repetitive_regions(0, 0, end)
    assert piles.repetitive_regions[0][0][0] & 1  # confirmed
    # a short overlap trapped inside the repeat is now rejected
    assert piles.check_repetitive_regions(0, 0, 41 << K_PSS)
    # a long overlap spanning past the repeat is fine
    assert not piles.check_repetitive_regions(0, 0, end)


def test_kmer_groups_repetitive():
    piles = Piles(np.array([160000]))
    n = piles.row(0).size
    piles.begin[0], piles.end[0] = 0, n
    codes = np.random.default_rng(0).integers(0, 4, 160000).astype(np.uint8)
    positions = [((100 + 17 * j) << K_PSS) for j in range(20)]  # tight group
    piles.add_kmers(0, positions, 15, codes)
    assert piles.kmers[0].sum() >= 13
    piles.find_repetitive_regions(0, median=10)
    assert piles.is_repetitive[0]


def test_low_complexity_kmers_filtered():
    from raven_tpu.pile.pile import _kmer_is_complex

    # homopolymer: compresses to 1 char
    assert not _kmer_is_complex(np.zeros(15, dtype=np.uint8), 15)
    # dinucleotide repeat ACACACACACACACA compresses under 2-gram dedup
    ac = np.array([0, 1] * 7 + [0], dtype=np.uint8)
    assert not _kmer_is_complex(ac, 15)
    # random k-mer passes
    rnd = np.array([0, 1, 2, 3, 1, 0, 2, 1, 3, 0, 2, 3, 1, 2, 0], dtype=np.uint8)
    assert _kmer_is_complex(rnd, 15)


def test_repetitive_region_batch_matches_scalar(rng):
    """update/check_repetitive_regions_batch must reproduce the scalar
    methods exactly on randomized regions and overlap sides."""
    import copy

    from raven_tpu.pile.pile import K_PSS, Piles

    n = 24
    lengths = rng.integers(4000, 16000, n).astype(np.int64)
    piles_a = Piles(lengths)
    for i in range(n):
        piles_a.begin[i] = int(lengths[i] // 50) >> K_PSS
        piles_a.end[i] = int(lengths[i] - lengths[i] // 40) >> K_PSS
        regions = []
        for _ in range(int(rng.integers(0, 4))):
            b = int(rng.integers(0, max(1, (lengths[i] >> K_PSS) - 20)))
            e = int(b + rng.integers(5, 200))
            bit = int(rng.integers(0, 2))
            regions.append(((b << 1) | bit, e))
        piles_a.repetitive_regions[i] = regions
    piles_b = copy.deepcopy(piles_a)

    m = 300
    ids = rng.integers(0, n, m).astype(np.int64)
    begins = np.array(
        [rng.integers(0, max(1, lengths[i] - 100)) for i in ids],
        dtype=np.int64,
    )
    ends = begins + np.array(
        [rng.integers(50, 4000) for _ in range(m)], dtype=np.int64
    )
    ends = np.minimum(ends, lengths[ids])

    for i, b, e in zip(ids, begins, ends):
        piles_a.update_repetitive_regions(int(i), int(b), int(e))
    piles_b.update_repetitive_regions_batch(ids, begins, ends)
    for i in range(n):
        assert piles_b.repetitive_regions[i] == piles_a.repetitive_regions[i]

    scalar = np.array(
        [
            piles_a.check_repetitive_regions(int(i), int(b), int(e))
            for i, b, e in zip(ids, begins, ends)
        ]
    )
    batch = piles_b.check_repetitive_regions_batch(ids, begins, ends)
    assert np.array_equal(batch, scalar)


def test_unanchored_reads_window_detector():
    """construct._unanchored_reads: a read whose valid region has no
    (near-)mark-free 128-bin window is unanchored; any read with a clean
    2 kb stretch keeps its anchor (the repeat-misjoin divergence,
    misc/repeat_diag.py calibration)."""
    from raven_tpu.graph.construct import (
        UNANCHORED_MAX_MARKS,
        UNANCHORED_WINDOW_BINS,
        _unanchored_reads,
    )
    from raven_tpu.pile.pile import Piles

    L = 512 * 16  # 512 bins per read
    piles = Piles(np.array([L, L, L, L], dtype=np.int64))
    win = UNANCHORED_WINDOW_BINS

    # read 0: marks everywhere (every 8th bin) -> unanchored
    m0 = np.zeros(513, dtype=bool)
    m0[::8] = True
    piles.kmers[0] = m0
    # read 1: marked first half, clean second half -> anchored
    m1 = np.zeros(513, dtype=bool)
    m1[: 256 : 4] = True
    piles.kmers[1] = m1
    # read 2: exactly the tolerated stray marks per window -> anchored
    m2 = np.zeros(513, dtype=bool)
    m2[:: win // UNANCHORED_MAX_MARKS] = True
    piles.kmers[2] = m2
    # read 3: dense marks but read invalid -> skipped
    piles.kmers[3] = m0.copy()
    piles.is_invalid[3] = True

    assert _unanchored_reads(piles) == [0]
