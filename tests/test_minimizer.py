import numpy as np

from raven_tpu.io import ReadSet, encode, reverse_complement
from raven_tpu.overlap.minimizer import hash_mix, kmer_values, minimize_read
from raven_tpu.overlap import MinimizerIndex
from tests.conftest import random_genome, sample_reads


def brute_force_minimizers(codes, k, w):
    """Oracle: direct winnowing definition."""
    n = codes.size
    mask = (1 << (2 * k)) - 1
    vals = []
    for p in range(n - k + 1):
        fk = 0
        rk = 0
        for j in range(k):
            fk = (fk << 2) | int(codes[p + j])
            rk |= (3 ^ int(codes[p + j])) << (2 * j)
        if fk == rk:
            vals.append(None)
        else:
            h = int(hash_mix(np.uint64(min(fk, rk)), mask))
            vals.append((h, 1 if fk < rk else 0))
    keep = set()
    for j in range(len(vals) - w + 1):
        window = [(vals[j + t], j + t) for t in range(w) if vals[j + t] is not None]
        if not window:
            continue
        m = min(v[0][0] for v in window)
        for v, p in window:
            if v[0] == m:
                keep.add(p)
    return sorted(keep)


def test_kmer_values_basic():
    codes = encode("ACGTA")
    fk, rk = kmer_values(codes, 3)
    # ACG = 0b000110 = 6 ; rc(ACG) = CGT = 0b011011 = 27
    assert fk[0] == 6 and rk[0] == 27
    # palindrome detection: fk == rk for e.g. "ACGT" k=4
    fk4, rk4 = kmer_values(encode("ACGT"), 4)
    assert fk4[0] == rk4[0]


def test_minimizers_match_bruteforce(rng):
    for _ in range(5):
        n = int(rng.integers(60, 400))
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        k, w = 7, 5
        h, pos, strand = minimize_read(codes, k, w)
        assert list(pos) == brute_force_minimizers(codes, k, w)


def test_minimizers_strand_symmetry(rng):
    """RC of a read yields the same canonical hash multiset."""
    codes = rng.integers(0, 4, size=500).astype(np.uint8)
    h1, _, _ = minimize_read(codes, 15, 5)
    h2, _, _ = minimize_read(reverse_complement(codes), 15, 5)
    assert sorted(h1.tolist()) == sorted(h2.tolist())


def test_minhash_reduces_sketch(rng):
    codes = rng.integers(0, 4, size=3000).astype(np.uint8)
    h, p, s = minimize_read(codes, 15, 5, minhash=False)
    hm, pm, sm = minimize_read(codes, 15, 5, minhash=True)
    assert hm.size <= 3000 // 15
    assert hm.size <= h.size
    assert set(hm.tolist()) <= set(h.tolist())
    assert list(pm) == sorted(pm)  # position order restored


def test_map_finds_overlap(rng):
    genome = random_genome(rng, 8000)
    # two reads overlapping by 2000 bases, same strand
    a = genome[0:5000]
    b = genome[3000:8000]
    rs = ReadSet.from_sequences([a, b])
    idx = MinimizerIndex(15, 5)
    idx.minimize(rs, np.arange(2))
    idx.filter(0.001)
    ovl = idx.map(rs, 0, avoid_equal=True, avoid_symmetric=True)
    assert ovl.size >= 1
    o = ovl[np.argmax(ovl["lhs_end"] - ovl["lhs_begin"])]
    assert o["rhs_id"] == 1 and o["strand"] == 1
    assert abs(int(o["lhs_begin"]) - 3000) < 100
    assert int(o["lhs_end"]) > 4800
    assert int(o["rhs_begin"]) < 100


def test_map_reverse_strand(rng):
    genome = random_genome(rng, 8000)
    a = genome[0:5000]
    b_codes = reverse_complement(encode(genome[3000:8000]))
    rs = ReadSet.from_sequences([encode(a), b_codes])
    idx = MinimizerIndex(15, 5)
    idx.minimize(rs, np.arange(2))
    idx.filter(0.001)
    ovl = idx.map(rs, 0)
    assert ovl.size >= 1
    o = ovl[np.argmax(ovl["lhs_end"] - ovl["lhs_begin"])]
    assert o["strand"] == 0
    # rhs coords are forward-strand on read b: overlap at its END
    assert int(o["rhs_end"]) > 4800


def test_map_noisy_reads(rng):
    genome = random_genome(rng, 20000)
    reads, positions = sample_reads(rng, genome, 30, 4000, error=0.05)
    rs = ReadSet.from_sequences(reads)
    idx = MinimizerIndex(15, 5)
    idx.minimize(rs, np.arange(len(reads)))
    idx.filter(0.001)
    found = 0
    expected = 0
    for i in range(len(reads)):
        for j in range(i + 1, len(reads)):
            s1, e1, _ = positions[i]
            s2, e2, _ = positions[j]
            if min(e1, e2) - max(s1, s2) > 1000:
                expected += 1
    for i in range(len(reads)):
        ovl = idx.map(rs, i)
        found += ovl.size
    assert expected > 0
    assert found >= 0.8 * expected


def test_avoid_symmetric_dedup(rng):
    genome = random_genome(rng, 6000)
    rs = ReadSet.from_sequences([genome[0:4000], genome[2000:6000]])
    idx = MinimizerIndex(15, 5)
    idx.minimize(rs, np.arange(2))
    idx.filter(0.001)
    # read 1 mapping with avoid_symmetric must not report read 0
    ovl = idx.map(rs, 1)
    assert ovl.size == 0
    # avoid_equal=False finds self overlap
    ovl_self = idx.map(rs, 0, avoid_equal=False, avoid_symmetric=False)
    assert (ovl_self["rhs_id"] == 0).any()


def test_map_many_matches_per_read(rng):
    genome = random_genome(rng, 20000)
    reads, _ = sample_reads(rng, genome, 60, 3000, error=0.05)
    rs = ReadSet.from_sequences(reads)
    idx = MinimizerIndex(15, 5)
    idx.minimize(rs, np.arange(len(reads)))
    idx.filter(0.01)  # aggressive filter so filtered_out paths trigger
    fo = {}
    many = idx.map_many(rs, np.arange(len(reads)), filtered_out=fo)
    for i in range(len(reads)):
        f1 = []
        single = idx.map(rs, i, filtered_out=f1)
        assert np.array_equal(single, many[i])
        assert f1 == fo.get(i, [])
