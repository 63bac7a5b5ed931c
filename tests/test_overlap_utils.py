"""Vectorized overlap algebra vs a scalar transliteration oracle.

The oracle functions below implement the reference scalar semantics
(overlap_utils.cc:14-133) step by step; the production code is whole-array.
"""

import numpy as np
import pytest

from raven_tpu.graph import overlap_utils as ou
from raven_tpu.overlap.types import make_overlaps
from raven_tpu.pile.pile import K_PSS, Piles


def scalar_update(o, pb_l, pe_l, pb_r, pe_r, inv_l, inv_r):
    """Reference OverlapUpdate (overlap_utils.cc:14-80) on one overlap."""
    if inv_l or inv_r:
        return None
    lb, le, rb, re, strand = (
        o["lhs_begin"], o["lhs_end"], o["rhs_begin"], o["rhs_end"], o["strand"]
    )
    lb, le, rb, re = int(lb), int(le), int(rb), int(re)
    if lb >= pe_l or le <= pb_l or rb >= pe_r or re <= pb_r:
        return None
    if strand:
        nlb = lb + (pb_r - rb if rb < pb_r else 0)
        nle = le - (re - pe_r if re > pe_r else 0)
        nrb = rb + (pb_l - lb if lb < pb_l else 0)
        nre = re - (le - pe_l if le > pe_l else 0)
    else:
        nlb = lb + (re - pe_r if re > pe_r else 0)
        nle = le - (pb_r - rb if rb < pb_r else 0)
        nrb = rb + (le - pe_l if le > pe_l else 0)
        nre = re - (pb_l - lb if lb < pb_l else 0)
    if nlb >= pe_l or nle <= pb_l or nrb >= pe_r or nre <= pb_r:
        return None
    nlb = max(nlb, pb_l)
    nle = min(nle, pe_l)
    nrb = max(nrb, pb_r)
    nre = min(nre, pe_r)
    if nlb >= nle or nle - nlb < 84 or nrb >= nre or nre - nrb < 84:
        return None
    return nlb, nle, nrb, nre


def scalar_type(o, pb_l, pe_l, pb_r, pe_r):
    """Reference GetOverlapType (overlap_utils.cc:82-113)."""
    lhs_length = pe_l - pb_l
    lhs_begin = int(o["lhs_begin"]) - pb_l
    lhs_end = int(o["lhs_end"]) - pb_l
    rhs_length = pe_r - pb_r
    if o["strand"]:
        rhs_begin = int(o["rhs_begin"]) - pb_r
        rhs_end = int(o["rhs_end"]) - pb_r
    else:
        rhs_begin = rhs_length - (int(o["rhs_end"]) - pb_r)
        rhs_end = rhs_length - (int(o["rhs_begin"]) - pb_r)
    overhang = min(lhs_begin, rhs_begin) + min(
        lhs_length - lhs_end, rhs_length - rhs_end
    )
    if (
        lhs_end - lhs_begin < (lhs_end - lhs_begin + overhang) * 0.875
        or rhs_end - rhs_begin < (rhs_end - rhs_begin + overhang) * 0.875
    ):
        return 0
    if lhs_begin <= rhs_begin and lhs_length - lhs_end <= rhs_length - rhs_end:
        return 1
    if rhs_begin <= lhs_begin and rhs_length - rhs_end <= lhs_length - lhs_end:
        return 2
    if lhs_begin > rhs_begin:
        return 3
    return 4


@pytest.fixture
def random_case(rng):
    n_reads = 30
    lengths = rng.integers(2000, 20000, n_reads).astype(np.int64)
    piles = Piles(lengths)
    for i in range(n_reads):
        nb = int(piles.nbins[i])
        b = int(rng.integers(0, nb // 3))
        e = int(rng.integers(2 * nb // 3, nb + 1))
        piles.begin[i] = b
        piles.end[i] = e
    piles.is_invalid[rng.random(n_reads) < 0.2] = True

    m = 300
    lhs = rng.integers(0, n_reads, m)
    rhs = rng.integers(0, n_reads, m)
    keep = lhs != rhs
    lhs, rhs = lhs[keep], rhs[keep]
    lb = rng.integers(0, lengths[lhs] // 2)
    le = lb + rng.integers(100, lengths[lhs] // 2)
    rb = rng.integers(0, lengths[rhs] // 2)
    re = rb + rng.integers(100, lengths[rhs] // 2)
    o = make_overlaps(lhs, lb, le, rhs, rb, re, 0, rng.integers(0, 2, lhs.size))
    return piles, o


def test_overlap_update_matches_scalar(random_case):
    piles, o = random_case
    upd, keep = ou.overlap_update(o, piles)
    for j in range(o.size):
        i_l, i_r = int(o["lhs_id"][j]), int(o["rhs_id"][j])
        want = scalar_update(
            o[j],
            piles.begin_bases(i_l), piles.end_bases(i_l),
            piles.begin_bases(i_r), piles.end_bases(i_r),
            piles.is_invalid[i_l], piles.is_invalid[i_r],
        )
        if want is None:
            assert not keep[j], f"overlap {j} should be rejected"
        else:
            assert keep[j], f"overlap {j} should survive"
            got = (
                int(upd["lhs_begin"][j]), int(upd["lhs_end"][j]),
                int(upd["rhs_begin"][j]), int(upd["rhs_end"][j]),
            )
            assert got == want, f"overlap {j}: {got} != {want}"


def test_overlap_type_matches_scalar(random_case):
    piles, o = random_case
    upd, keep = ou.overlap_update(o, piles)
    survivors = upd[keep]
    t = ou.get_overlap_type(survivors, piles)
    for j in range(survivors.size):
        i_l = int(survivors["lhs_id"][j])
        i_r = int(survivors["rhs_id"][j])
        want = scalar_type(
            survivors[j],
            piles.begin_bases(i_l), piles.end_bases(i_l),
            piles.begin_bases(i_r), piles.end_bases(i_r),
        )
        assert int(t[j]) == want, f"overlap {j}: {t[j]} != {want}"


def test_overlap_finalize_dovetails(random_case):
    piles, o = random_case
    upd, keep = ou.overlap_update(o, piles)
    survivors = upd[keep]
    fin, fkeep = ou.overlap_finalize(survivors, piles)
    t = ou.get_overlap_type(survivors, piles)
    assert np.array_equal(fkeep, t >= 3)
    # finalized coordinates are in trimmed-sequence space
    sel = fin[fkeep]
    for j in range(sel.size):
        i_l = int(sel["lhs_id"][j])
        i_r = int(sel["rhs_id"][j])
        assert int(sel["lhs_end"][j]) <= piles.length_bases(i_l)
        assert int(sel["rhs_end"][j]) <= piles.length_bases(i_r)
