import numpy as np
import pytest

from raven_tpu.ops.align_dp import (
    batched_infix_align,
    batched_piece_align,
    find_window_breakpoints,
)


def test_piece_align_exact(rng):
    t = rng.integers(0, 4, (3, 100)).astype(np.uint8)
    q = np.zeros((3, 150), dtype=np.uint8)
    q[:, :100] = t
    q[:, 100:] = rng.integers(0, 4, (3, 50))
    dist, q_end = batched_piece_align(
        t, np.full(3, 100), q, np.full(3, 150)
    )
    assert (dist == 0).all()
    assert (q_end == 100).all()


def test_infix_align_finds_embedded_target(rng):
    B = 4
    t = rng.integers(0, 4, (B, 80)).astype(np.uint8)
    q = rng.integers(0, 4, (B, 200)).astype(np.uint8)
    starts = rng.integers(0, 100, B)
    for b in range(B):
        q[b, starts[b] : starts[b] + 80] = t[b]
    dist, q_start, q_end = batched_infix_align(
        t, np.full(B, 80), q, np.full(B, 200)
    )
    assert (dist == 0).all()
    assert np.array_equal(q_start, starts)
    assert np.array_equal(q_end, starts + 80)


def test_infix_align_with_errors(rng):
    t = rng.integers(0, 4, (1, 100)).astype(np.uint8)
    q = rng.integers(0, 4, (1, 300)).astype(np.uint8)
    noisy = t[0].copy()
    noisy[10] = (noisy[10] + 1) % 4
    noisy = np.delete(noisy, 50)
    q[0, 120 : 120 + noisy.size] = noisy
    dist, q_start, q_end = batched_infix_align(
        t, np.array([100]), q, np.array([300])
    )
    assert dist[0] <= 3
    assert abs(int(q_start[0]) - 120) <= 2
    assert abs(int(q_end[0]) - (120 + noisy.size)) <= 2


def test_jax_infix_matches_numpy(rng):
    jax_dp = pytest.importorskip("raven_tpu.ops.jax_dp")
    if not jax_dp.HAS_JAX:
        pytest.skip("jax unavailable")
    B = 8
    t_lens = rng.integers(20, 120, B)
    q_lens = rng.integers(50, 250, B)
    T, Q = int(t_lens.max()), int(q_lens.max())
    t = rng.integers(0, 4, (B, T)).astype(np.uint8)
    q = rng.integers(0, 4, (B, Q)).astype(np.uint8)
    # plant approximate copies
    for b in range(B):
        tl, ql = int(t_lens[b]), int(q_lens[b])
        s = int(rng.integers(0, max(1, ql - tl)))
        seg = t[b, :tl].copy()
        if seg.size > 10:
            seg[5] = (seg[5] + 1) % 4
        q[b, s : s + min(seg.size, ql - s)] = seg[: min(seg.size, ql - s)]
    d1, s1, e1 = batched_infix_align(t, t_lens, q, q_lens)
    d2, s2, e2 = jax_dp.infix_align_device(t, t_lens, q, q_lens)
    assert np.array_equal(d1, d2)
    assert np.array_equal(s1, s2)
    assert np.array_equal(e1, e2)


def test_find_window_breakpoints_clean(rng):
    target = rng.integers(0, 4, 3000).astype(np.uint8)
    q = target[250:2750].copy()
    frags = find_window_breakpoints(q, target, 250, 2750, 500)
    assert frags[0][:2] == (0, 250)
    # contiguous coverage of the query
    for a, b in zip(frags, frags[1:]):
        assert a[3] == b[2]
    assert frags[-1][3] == q.size
