import numpy as np
import pytest

jax = pytest.importorskip("jax")

from raven_tpu.ops.consensus_device import (
    HAS_JAX,
    device_window_consensus,
    nw_moves_kernel,
    traceback_kernel,
)
from raven_tpu.ops.edit_distance import edit_distance
from raven_tpu.ops.poa import poa_consensus

pytestmark = pytest.mark.skipif(not HAS_JAX, reason="jax unavailable")


def mutate(rng, codes, sub, dele, ins):
    out = []
    for c in codes:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(int(rng.integers(0, 4)))
            out.append(int(c))
            continue
        if r < dele + ins + sub:
            out.append((int(c) + int(rng.integers(1, 4))) % 4)
        else:
            out.append(int(c))
    return np.array(out, dtype=np.uint8)


def test_nw_traceback_exact_match(rng):
    import jax.numpy as jnp

    T, Q = 64, 96
    seq = rng.integers(0, 4, 50).astype(np.int32)
    cons = np.full((1, T), -1, np.int32)
    cons[0, :50] = seq
    frag = np.full((1, Q), -1, np.int32)
    frag[0, :50] = seq
    moves, end_scores, row0_score = nw_moves_kernel(
        jnp.asarray(cons), jnp.asarray([50], np.int32),
        jnp.asarray(frag), jnp.asarray([50], np.int32), T, Q,
    )
    assert int(np.asarray(end_scores).max()) == 50 * 3  # all matches
    pt, pq, pmv = traceback_kernel(
        moves, end_scores, row0_score, jnp.asarray([50], np.int32),
        T, Q, T + Q,
    )
    pmv = np.asarray(pmv)[:, 0]
    assert (pmv[pmv != 3] == 0).all()  # pure diagonal path
    assert (pmv != 3).sum() == 50


def test_fused_votes_matches_host_oracle(rng):
    """fused_votes_kernel (on-device scatter) must produce the same vote
    tables as traceback + host consensus_votes."""
    import jax.numpy as jnp

    from raven_tpu.ops.consensus_device import (
        consensus_votes,
        fused_votes_kernel,
        homopolymer_run_map,
    )

    T, Q, NWIN = 96, 128, 8
    n_win, B = 5, 24
    cons_arr = np.full((NWIN, T), -1, np.int32)
    cons_lens = np.zeros(NWIN, np.int32)
    truths = []
    for wi in range(n_win):
        truth = rng.integers(0, 4, 80).astype(np.uint8)
        bb = mutate(rng, truth, 0.05, 0.05, 0.04)[:T]
        cons_arr[wi, : bb.size] = bb
        cons_lens[wi] = bb.size
        truths.append(truth)
    frags = np.full((B, Q), -1, np.int32)
    q_lens = np.zeros(B, np.int32)
    wts = np.ones((B, Q), np.int32)
    win_of = rng.integers(0, n_win, B).astype(np.int32)
    for i in range(B):
        f = mutate(rng, truths[win_of[i]], 0.06, 0.05, 0.05)[:Q]
        frags[i, : f.size] = f
        q_lens[i] = f.size
        wts[i, : f.size] = rng.integers(1, 60, f.size)
    cons_runs = homopolymer_run_map(cons_arr, cons_lens)
    STEPS = T + Q

    bv_d, iv_d, cv_d = fused_votes_kernel(
        jnp.asarray(cons_arr), jnp.asarray(cons_lens), jnp.asarray(cons_runs),
        jnp.asarray(frags), jnp.asarray(q_lens), jnp.asarray(wts),
        jnp.asarray(win_of), T, Q, STEPS, NWIN,
    )

    moves, end_scores, row0 = nw_moves_kernel(
        jnp.asarray(cons_arr[win_of]), jnp.asarray(cons_lens[win_of]),
        jnp.asarray(frags), jnp.asarray(q_lens), T, Q,
    )
    pt, pq, pmv = traceback_kernel(
        moves, end_scores, row0, jnp.asarray(q_lens), T, Q, STEPS
    )
    bv_h, iv_h, cv_h = consensus_votes(
        np.asarray(pt), np.asarray(pq), np.asarray(pmv),
        frags, wts.astype(np.uint8), win_of, n_win, T, cons_runs=cons_runs,
    )
    assert np.array_equal(np.asarray(bv_d)[:n_win], bv_h)
    assert np.array_equal(np.asarray(iv_d)[:n_win], iv_h)
    assert np.array_equal(np.asarray(cv_d)[:n_win], cv_h)


def test_device_consensus_quality(rng):
    windows = []
    truths = []
    for _ in range(4):
        truth = rng.integers(0, 4, 300).astype(np.uint8)
        bb = mutate(rng, truth, 0.05, 0.05, 0.04)
        frags = [mutate(rng, truth, 0.05, 0.05, 0.04) for _ in range(15)]
        wts = [np.full(f.size, 11, np.uint8) for f in frags]
        windows.append((bb, frags, wts))
        truths.append(truth)
    out = device_window_consensus(
        windows, iterations=2, t_pad=384, q_pad=512, chunk=64
    )
    for cons, truth, (bb, frags, _) in zip(out, truths, windows):
        ed_before = edit_distance(bb, truth)
        ed_after = edit_distance(cons, truth)
        assert ed_after < max(4, ed_before * 0.2)


def test_device_consensus_no_fragments(rng):
    bb = rng.integers(0, 4, 100).astype(np.uint8)
    out = device_window_consensus(
        [(bb, [], None)], iterations=1, t_pad=128, q_pad=128, chunk=8
    )
    assert np.array_equal(out[0], bb)


def test_partial_fragments_do_not_erode_window(rng):
    """Fragments covering only the middle must not cause deletion votes at
    the uncovered head/tail (consensus-infix semantics)."""
    truth = rng.integers(0, 4, 300).astype(np.uint8)
    bb = truth.copy()
    frags = [truth[100:200].copy() for _ in range(8)]
    out = device_window_consensus(
        [(bb, frags, None)], iterations=2, t_pad=384, q_pad=512, chunk=8
    )
    assert np.array_equal(out[0], truth)


def test_banded_consensus_matches_full(rng):
    """A generous band must not change results on well-behaved windows
    (banded path = --device-banded-alignment, reference polish.cc:48)."""
    windows = []
    for _ in range(3):
        truth = rng.integers(0, 4, 300).astype(np.uint8)
        bb = mutate(rng, truth, 0.03, 0.03, 0.03)
        frags = [mutate(rng, truth, 0.03, 0.03, 0.03) for _ in range(10)]
        windows.append((bb, frags, None))
    full = device_window_consensus(
        windows, iterations=2, t_pad=384, q_pad=512, chunk=32
    )
    banded = device_window_consensus(
        windows, iterations=2, t_pad=384, q_pad=512, chunk=32, banded=True
    )
    for a, b in zip(full, banded):
        assert np.array_equal(a, b)


def test_sharded_consensus_matches_single_device():
    """The mesh-sharded votes step must produce bit-identical consensus
    to the single-device path (vote tables psum; integer adds commute)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from raven_tpu.ops.consensus_device import device_window_consensus
    from raven_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    windows = []
    for _ in range(6):
        truth = rng.integers(0, 4, 300).astype(np.uint8)

        def mut():
            keep = rng.random(truth.size) >= 0.05
            seg = truth[keep]
            subs = rng.random(seg.size) < 0.04
            return np.where(
                subs, (seg + 1) % 4, seg
            ).astype(np.uint8)

        frags = [mut() for _ in range(12)]
        wts = [np.full(f.size, 9, np.uint8) for f in frags]
        windows.append((mut(), frags, wts))

    single = device_window_consensus(
        windows, iterations=2, t_pad=384, q_pad=384, chunk=16
    )
    mesh = make_mesh(8)
    sharded = device_window_consensus(
        windows, iterations=2, t_pad=384, q_pad=384, chunk=16, mesh=mesh
    )
    for a, b in zip(single, sharded):
        assert np.array_equal(a, b)


def test_banded_anchored_partial_fragments():
    """The anchored banded NW (true compute savings) must reproduce the
    full kernel's consensus on realistic windows — including
    PARTIAL-window fragments (read ends), which the per-fragment span
    anchor handles and the whole-window proportional diagonal would not."""
    from raven_tpu.ops.consensus_device import device_window_consensus

    rng = np.random.default_rng(9)
    windows = []
    for _ in range(4):
        truth = rng.integers(0, 4, 500).astype(np.uint8)

        def mut(seg):
            keep = rng.random(seg.size) >= 0.05
            s = seg[keep]
            subs = rng.random(s.size) < 0.04
            s = np.where(subs, (s + 1) % 4, s).astype(np.uint8)
            ins = rng.random(s.size) < 0.05
            return np.repeat(s, 1 + ins.astype(np.int64))

        frags, spans = [], []
        for _ in range(20):
            # partial spans: some fragments cover only [r0, r1)
            if rng.random() < 0.4:
                r0 = int(rng.integers(0, 300))
                r1 = int(rng.integers(r0 + 150, 501))
            else:
                r0, r1 = 0, 500
            frags.append(mut(truth[r0:r1]))
            spans.append((r0, r1))
        wts = [np.full(f.size, 9, np.uint8) for f in frags]
        windows.append((mut(truth), frags, wts, spans))

    full = device_window_consensus(
        windows, iterations=2, t_pad=640, q_pad=768, chunk=128,
        banded=False,
    )
    band = device_window_consensus(
        windows, iterations=2, t_pad=640, q_pad=768, chunk=128,
        banded=True,
    )
    # banded must be near-identical to full: tiny ED budget per window
    from raven_tpu.ops.edit_distance import edit_distance

    for i, (a, b) in enumerate(zip(full, band)):
        ed = edit_distance(a, b)
        assert ed <= 2, f"window {i}: banded vs full ED {ed}"


def test_sharded_banded_consensus_matches_single_device():
    """banded=True must not be silently ignored on a mesh: the sharded
    banded step must agree with the single-device banded path."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from raven_tpu.ops.consensus_device import device_window_consensus
    from raven_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(15)
    windows = []
    for _ in range(5):
        truth = rng.integers(0, 4, 300).astype(np.uint8)

        def mut():
            keep = rng.random(truth.size) >= 0.05
            s = truth[keep]
            subs = rng.random(s.size) < 0.04
            return np.where(subs, (s + 1) % 4, s).astype(np.uint8)

        frags = [mut() for _ in range(12)]
        wts = [np.full(f.size, 9, np.uint8) for f in frags]
        spans = [(0, 300)] * 12
        windows.append((mut(), frags, wts, spans))

    single = device_window_consensus(
        windows, iterations=2, t_pad=384, q_pad=384, chunk=16,
        banded=True,
    )
    sharded = device_window_consensus(
        windows, iterations=2, t_pad=384, q_pad=384, chunk=16,
        banded=True, mesh=make_mesh(8),
    )
    for a, b in zip(single, sharded):
        assert np.array_equal(a, b)
