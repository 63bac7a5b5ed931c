import numpy as np
import pytest

jax = pytest.importorskip("jax")

from raven_tpu.ops.sketch import HAS_JAX, sketch_compact_kernel, sketch_kernel
from raven_tpu.overlap.minimizer import minimize_read

pytestmark = pytest.mark.skipif(not HAS_JAX, reason="jax unavailable")


def host_sketch(codes, k, w):
    h, p, s = minimize_read(codes, k, w)
    return {(int(a), int(b), int(c)) for a, b, c in zip(h, p, s)}


def test_device_sketch_matches_host(rng):
    k, w = 15, 5
    B, L = 4, 1024
    lengths = rng.integers(200, L, B)
    codes = np.zeros((B, L), dtype=np.uint32)
    per_read = []
    for b in range(B):
        c = rng.integers(0, 4, int(lengths[b])).astype(np.uint8)
        per_read.append(c)
        codes[b, : c.size] = c
    h, strand, keep = sketch_kernel(
        jax.numpy.asarray(codes),
        jax.numpy.asarray(lengths.astype(np.int32)),
        k,
        w,
    )
    h = np.asarray(h)
    strand = np.asarray(strand)
    keep = np.asarray(keep)
    for b in range(B):
        got = {
            (int(h[b, p]), p, int(strand[b, p]))
            for p in np.nonzero(keep[b])[0]
        }
        assert got == host_sketch(per_read[b], k, w)


def test_device_sketch_small_k(rng):
    k, w = 7, 3
    codes = rng.integers(0, 4, 300).astype(np.uint8)
    batch = codes[None, :].astype(np.uint32)
    h, strand, keep = sketch_kernel(
        jax.numpy.asarray(batch), jax.numpy.asarray([300], dtype=np.int32), k, w
    )
    got = {
        (int(np.asarray(h)[0, p]), p)
        for p in np.nonzero(np.asarray(keep)[0])[0]
    }
    want = {(int(a), int(b)) for a, b, _ in zip(*minimize_read(codes, k, w))}
    assert got == want


def test_device_compact_sorted(rng):
    k, w = 15, 5
    B, L = 3, 512
    codes = rng.integers(0, 4, (B, L)).astype(np.uint32)
    lengths = np.full(B, L, dtype=np.int32)
    cap = B * L
    key, ids, pos, strand = sketch_compact_kernel(
        jax.numpy.asarray(codes),
        jax.numpy.asarray(lengths),
        jax.numpy.asarray(np.arange(B, dtype=np.int32)),
        k,
        w,
        cap,
    )
    key = np.asarray(key)
    valid = key != 0xFFFFFFFF
    assert valid.sum() > 0
    assert (np.diff(key[valid].astype(np.int64)) >= 0).all()
    # compare multiset of hashes with host
    host = []
    for b in range(B):
        h, p, s = minimize_read(codes[b].astype(np.uint8), k, w)
        host.extend(h.tolist())
    assert sorted(host) == sorted(key[valid].tolist())
