import numpy as np
import pytest

jax = pytest.importorskip("jax")

from raven_tpu.io import ReadSet
from raven_tpu.overlap.minimizer import minimize_read
from raven_tpu.ops.sketch import (
    HAS_JAX,
    UINT32_INF,
    segment_reads,
    sketch_segments_kernel,
)

pytestmark = pytest.mark.skipif(not HAS_JAX, reason="jax unavailable")


def device_sketch_multiset(readset, ids, k, w, width):
    import jax.numpy as jnp

    codes, eff, rids, base, clo, chi = segment_reads(
        readset, ids, k, w, width=width
    )
    key, rid, pos, sb = sketch_segments_kernel(
        jnp.asarray(codes),
        jnp.asarray(eff),
        jnp.asarray(rids),
        jnp.asarray(base),
        jnp.asarray(clo),
        jnp.asarray(chi),
        k,
        w,
    )
    key = np.asarray(key)
    rid = np.asarray(rid)
    pos = np.asarray(pos)
    sb = np.asarray(sb)
    valid = key != UINT32_INF
    return {
        (int(r), int(p), int(h), int(s))
        for r, p, h, s in zip(rid[valid], pos[valid], key[valid], sb[valid])
    }


@pytest.mark.parametrize("width", [256, 512])
def test_segmented_sketch_exact(rng, width):
    """Segmented device sketch must equal the per-read host sketch even for
    reads spanning many segments."""
    k, w = 15, 5
    reads = [
        rng.integers(0, 4, int(n)).astype(np.uint8)
        for n in rng.integers(40, 2000, 12)
    ]
    rs = ReadSet.from_sequences(reads)
    got = device_sketch_multiset(rs, np.arange(len(reads)), k, w, width)
    want = set()
    for i, codes in enumerate(reads):
        h, p, s = minimize_read(codes, k, w)
        for a, b, c in zip(h, p, s):
            want.add((i, int(b), int(a), int(c)))
    assert got == want


def test_segment_claims_disjoint(rng):
    k, w = 15, 5
    reads = [rng.integers(0, 4, 5000).astype(np.uint8)]
    rs = ReadSet.from_sequences(reads)
    codes, eff, rids, base, clo, chi = segment_reads(
        rs, np.array([0]), k, w, width=512
    )
    # global claim ranges tile the read without overlap
    ranges = sorted(
        (int(b + lo), int(b + hi)) for b, lo, hi in zip(base, clo, chi)
    )
    for (a1, b1), (a2, b2) in zip(ranges, ranges[1:]):
        assert b1 == a2
    assert ranges[0][0] == 0


def test_segment_reads_packed_native_parity(rng):
    """Native C++ segment+pack (native/segment_pack.cc) must be
    bit-identical to the python segment_reads + 2-bit packing pair —
    including non-contiguous id subsets and too-short reads."""
    from raven_tpu.ops.sketch import segment_reads_packed

    k, w = 15, 5
    reads = [
        rng.integers(0, 4, int(n)).astype(np.uint8)
        for n in rng.integers(5, 7000, 120)
    ]
    rs = ReadSet.from_sequences(reads)
    for ids in (
        np.arange(len(reads)),
        np.array([3, 0, 77, 119, 50]),
        np.zeros(0, np.int64),
    ):
        codes, eff, rid, base, clo, chi = segment_reads(
            rs, ids, k, w, width=2048
        )
        S = codes.shape[0]
        c4 = codes.reshape(S, 512, 4)
        want = (
            c4[..., 0]
            | (c4[..., 1] << 2)
            | (c4[..., 2] << 4)
            | (c4[..., 3] << 6)
        ).astype(np.uint8)
        p, e2, r2, b2, c2, h2 = segment_reads_packed(rs, ids, k, w)
        assert np.array_equal(p, want)
        for a, b in ((eff, e2), (rid, r2), (base, b2), (clo, c2), (chi, h2)):
            assert np.array_equal(a, b)
