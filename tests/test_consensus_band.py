"""Shift-banded resident consensus engine (ops/consensus_band.py).

Contract: with a band covering the full DP rectangle the engine is
BIT-IDENTICAL to the full-NW engine (nw_moves + traceback +
consensus_votes, themselves oracle-tested); with the production band it
must reproduce the full engine's consensus on realistic windows.  The
reference behaviour being matched is racon's window consensus driven
from RavenLib/src/polish.cc:43-48."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from raven_tpu.ops.consensus_band import (
    HAS_JAX,
    band_votes_kernel,
    band_window_consensus,
    canonicalize_ins,
    pack_shifted_fragments,
)
from raven_tpu.ops.consensus_device import (
    consensus_votes,
    device_window_consensus,
    homopolymer_run_map,
    nw_moves_kernel,
    traceback_kernel,
)
from raven_tpu.ops.edit_distance import edit_distance

pytestmark = pytest.mark.skipif(not HAS_JAX, reason="jax unavailable")


def mutate(rng, codes, sub, dele, ins):
    keep = rng.random(codes.size) >= dele
    seg = codes[keep]
    subs = rng.random(seg.size) < sub
    seg = np.where(
        subs, (seg + rng.integers(1, 4, seg.size)) % 4, seg
    ).astype(np.uint8)
    insm = rng.random(seg.size) < ins
    return np.repeat(seg, 1 + insm.astype(np.int64))


def test_band_votes_bitexact_vs_oracle_full_rect(rng):
    """BW covering the whole rectangle -> vote tables equal the
    traceback + consensus_votes oracle bit-for-bit."""
    import jax.numpy as jnp

    T, Q, NWIN, BW = 96, 128, 8, 384
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
    frag_rows, weight_rows = [], []
    for i in range(B):
        f = mutate(rng, truths[win_of[i]], 0.06, 0.05, 0.05)[:Q]
        frags[i, : f.size] = f
        q_lens[i] = f.size
        w = rng.integers(1, 60, f.size)
        wts[i, : f.size] = w
        frag_rows.append(f)
        weight_rows.append(w.astype(np.uint8))
    cons_runs = homopolymer_run_map(cons_arr, cons_lens)

    moves, es, r0s = nw_moves_kernel(
        jnp.asarray(cons_arr[win_of]), jnp.asarray(cons_lens[win_of]),
        jnp.asarray(frags), jnp.asarray(q_lens), T, Q,
    )
    pt, pq, pmv = traceback_kernel(
        moves, es, r0s, jnp.asarray(q_lens), T, Q, T + Q
    )
    bv_h, iv_h, cv_h = consensus_votes(
        np.asarray(pt), np.asarray(pq), np.asarray(pmv),
        frags, wts.astype(np.uint8), win_of, n_win, T,
        cons_runs=cons_runs,
    )

    r0 = np.zeros(B, np.int32)
    fw_sh, ql2 = pack_shifted_fragments(
        frag_rows, weight_rows, r0, Q, T, BW
    )
    assert np.array_equal(ql2, q_lens)
    bv, ir, cv = band_votes_kernel(
        jnp.asarray(cons_arr), jnp.asarray(cons_lens),
        jnp.asarray(fw_sh), jnp.asarray(q_lens), jnp.asarray(r0),
        jnp.asarray(win_of), T, BW, NWIN,
    )
    iv = canonicalize_ins(ir, jnp.asarray(cons_runs), T)
    assert np.array_equal(np.asarray(bv)[:n_win], bv_h)
    assert np.array_equal(np.asarray(iv)[:n_win], iv_h)
    assert np.array_equal(np.asarray(cv)[:n_win], cv_h)


def test_band_driver_bitexact_full_rect(rng):
    """End-to-end driver with a full-rectangle band == full NW engine."""
    windows = []
    for _ in range(5):
        truth = rng.integers(0, 4, 80).astype(np.uint8)
        bb = mutate(rng, truth, 0.05, 0.05, 0.04)
        frags = [mutate(rng, truth, 0.06, 0.05, 0.05) for _ in range(12)]
        wts = [
            np.minimum(rng.integers(1, 60, f.size), 255).astype(np.uint8)
            for f in frags
        ]
        windows.append((bb, frags, wts))
    full = device_window_consensus(
        windows, iterations=2, t_pad=128, q_pad=128, chunk=64
    )
    band = band_window_consensus(
        windows, iterations=2, t_pad=128, q_pad=128, bw=384
    )
    for a, b in zip(full, band):
        assert np.array_equal(a, b)


def test_band_production_matches_full_on_realistic_windows(rng):
    """BW=256 on 500 bp windows with partial fragments (read ends) —
    the production configuration — must reproduce the full engine."""
    windows, truths = [], []
    for _ in range(4):
        truth = rng.integers(0, 4, 500).astype(np.uint8)
        bb = mutate(rng, truth, 0.04, 0.05, 0.05)
        frags, spans = [], []
        for _ in range(20):
            if rng.random() < 0.4:
                r0 = int(rng.integers(0, 300))
                r1 = int(rng.integers(r0 + 150, 501))
            else:
                r0, r1 = 0, 500
            frags.append(mutate(rng, truth[r0:r1], 0.04, 0.05, 0.05))
            spans.append((r0, r1))
        wts = [np.full(f.size, 11, np.uint8) for f in frags]
        windows.append((bb, frags, wts, spans))
        truths.append(truth)
    full = device_window_consensus(
        windows, iterations=2, t_pad=640, q_pad=768, chunk=128
    )
    band = band_window_consensus(
        windows, iterations=2, t_pad=640, q_pad=768, bw=256
    )
    for i, (a, b, t) in enumerate(zip(full, band, truths)):
        assert edit_distance(a, b) <= 2, f"window {i}"
        assert edit_distance(b, t) <= edit_distance(np.asarray(windows[i][0]), t)


def test_band_driver_edges(rng):
    """No-fragment windows pass through; multiple groups split/join."""
    bb = rng.integers(0, 4, 100).astype(np.uint8)
    out = band_window_consensus(
        [(bb, [], None)], iterations=1, t_pad=128, bw=384
    )
    assert np.array_equal(out[0], bb)

    # force multiple groups (group=2) and check order is preserved
    windows = []
    truths = []
    for _ in range(5):
        truth = rng.integers(0, 4, 80).astype(np.uint8)
        frags = [mutate(rng, truth, 0.05, 0.05, 0.04) for _ in range(8)]
        windows.append((mutate(rng, truth, 0.05, 0.05, 0.04), frags, None))
        truths.append(truth)
    one = band_window_consensus(
        windows, iterations=2, t_pad=128, bw=384
    )
    grouped = band_window_consensus(
        windows, iterations=2, t_pad=128, bw=384, group=2
    )
    for a, b in zip(one, grouped):
        assert np.array_equal(a, b)


def test_band_sharded_matches_single_device():
    """Mesh-sharded resident loop == single-device loop (psum of
    integer vote tables commutes)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from raven_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    windows = []
    for _ in range(6):
        truth = rng.integers(0, 4, 300).astype(np.uint8)
        frags = [mutate(rng, truth, 0.04, 0.05, 0.0) for _ in range(12)]
        wts = [np.full(f.size, 9, np.uint8) for f in frags]
        windows.append((mutate(rng, truth, 0.04, 0.05, 0.0), frags, wts))
    single = band_window_consensus(
        windows, iterations=2, t_pad=384, bw=384
    )
    sharded = band_window_consensus(
        windows, iterations=2, t_pad=384, bw=384, mesh=make_mesh(8)
    )
    for a, b in zip(single, sharded):
        assert np.array_equal(a, b)


def test_band_quality_improves(rng):
    """Consensus must converge toward truth (same bar as the full
    engine's quality test)."""
    windows, truths = [], []
    for _ in range(4):
        truth = rng.integers(0, 4, 300).astype(np.uint8)
        bb = mutate(rng, truth, 0.05, 0.05, 0.04)
        frags = [mutate(rng, truth, 0.05, 0.05, 0.04) for _ in range(15)]
        wts = [np.full(f.size, 11, np.uint8) for f in frags]
        windows.append((bb, frags, wts))
        truths.append(truth)
    out = band_window_consensus(windows, iterations=2, t_pad=384, bw=384)
    for cons, truth, (bb, _f, _w) in zip(out, truths, windows):
        ed_before = edit_distance(bb, truth)
        ed_after = edit_distance(cons, truth)
        assert ed_after < max(4, ed_before * 0.2)
