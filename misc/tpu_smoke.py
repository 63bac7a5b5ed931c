#!/usr/bin/env python3
"""On-hardware smoke suite (run EVERY round before bench.py).

CI runs CPU-only (conftest forces JAX_PLATFORMS=cpu), and the Mosaic/XLA
failure mode seen in round 1 is a SILENT miscompile (wrong lanes, no
error) — CPU-interpret parity does not imply TPU parity.  This script
re-checks the three device paths against host oracles on the real chip
in under ~5 minutes warm:

  1. Pallas segment-sketch bit-parity vs the host minimizer on λ reads;
  2. device-resident index + self-join overlap digest vs the host
     production path on λ;
  3. fused consensus kernel (NW + traceback + vote scatter) vote tables
     vs the host consensus_votes oracle, plus an end-to-end window
     quality check.

Exit 0 = all parity checks hold on this hardware.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/raven_tpu_jax")

LAMBDA = "/root/reference/RavenTest/data/ERA476754.fastq.gz"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def check_sketch_parity(readset) -> None:
    import jax.numpy as jnp

    from raven_tpu.ops.sketch import (
        UINT32_INF,
        segment_reads,
        sketch_segments_kernel,
    )
    from raven_tpu.overlap.minimizer import minimize_reads

    ids = np.arange(min(64, len(readset)))
    codes, eff, rids, base, clo, chi = segment_reads(readset, ids, 15, 5)
    for use_pallas in (False, True):
        key, rid, pos, sb = sketch_segments_kernel(
            jnp.asarray(codes), jnp.asarray(eff), jnp.asarray(rids),
            jnp.asarray(base), jnp.asarray(clo), jnp.asarray(chi),
            15, 5, use_pallas=use_pallas,
        )
        key = np.asarray(key)
        valid = key != UINT32_INF
        dev = np.stack(
            [
                key[valid].astype(np.uint64),
                np.asarray(rid)[valid].astype(np.uint64),
                np.asarray(pos)[valid].astype(np.uint64),
                np.asarray(sb)[valid].astype(np.uint64),
            ]
        )
        dev = dev[:, np.lexsort(dev[::-1])]
        h, i, p, s = minimize_reads(readset, ids, 15, 5, False)
        host = np.stack(
            [h, i.astype(np.uint64), p.astype(np.uint64), s.astype(np.uint64)]
        )
        host = host[:, np.lexsort(host[::-1])]
        assert np.array_equal(dev, host), (
            f"sketch parity FAILED (pallas={use_pallas})"
        )
        log(f"  sketch parity ok (pallas={use_pallas}, {dev.shape[1]} entries)")


def check_overlap_digest(readset) -> None:
    from raven_tpu.overlap.engine import MinimizerIndex

    def run(device):
        os.environ["RAVEN_TPU_DEVICE_MAP"] = "1" if device else "0"
        idx = MinimizerIndex(15, 5)
        ids = np.arange(len(readset))
        idx.minimize(readset, ids, with_query_flags=True)
        idx.filter(0.001)
        res = idx.map_many(readset, ids, minhash=True)
        if device:
            assert idx._device is not None, "device index did not engage"
        h = hashlib.sha256()
        n = 0
        for rid in sorted(res):
            arr = np.sort(
                res[rid], order=["rhs_id", "strand", "lhs_begin", "rhs_begin"]
            )
            n += arr.size
            h.update(arr.tobytes())
        return h.hexdigest(), n, int(idx._occurrence)

    hd, hn, hocc = run(device=False)
    dd, dn, docc = run(device=True)
    assert docc == hocc, f"occurrence {docc} != host {hocc}"
    assert (dd, dn) == (hd, hn), f"overlap digest FAILED ({dn} vs {hn})"
    log(f"  overlap digest ok ({hn} overlaps, occurrence {hocc})")


def check_consensus_parity(rng) -> None:
    import jax.numpy as jnp

    from raven_tpu.ops.consensus_device import (
        consensus_votes,
        device_window_consensus,
        fused_votes_kernel,
        homopolymer_run_map,
        nw_moves_kernel,
        traceback_kernel,
    )
    from raven_tpu.ops.edit_distance import edit_distance

    def mutate(truth):
        keep = rng.random(truth.size) >= 0.05
        seg = truth[keep]
        subs = rng.random(seg.size) < 0.04
        seg = np.where(
            subs, (seg + rng.integers(1, 4, seg.size)) % 4, seg
        ).astype(np.uint8)
        ins = rng.random(seg.size) < 0.05
        return np.repeat(seg, 1 + ins.astype(np.int64))

    # vote-table parity: fused on-device scatter vs host oracle
    T, Q, NWIN, B = 128, 192, 8, 48
    cons_arr = np.full((NWIN, T), -1, np.int32)
    cons_lens = np.zeros(NWIN, np.int32)
    truths = []
    for wi in range(6):
        truth = rng.integers(0, 4, 100).astype(np.uint8)
        bb = mutate(truth)[:T]
        cons_arr[wi, : bb.size] = bb
        cons_lens[wi] = bb.size
        truths.append(truth)
    frags = np.full((B, Q), -1, np.int32)
    q_lens = np.zeros(B, np.int32)
    wts = np.ones((B, Q), np.int32)
    win_of = rng.integers(0, 6, B).astype(np.int32)
    for i in range(B):
        f = mutate(truths[win_of[i]])[:Q]
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
        frags, wts.astype(np.uint8), win_of, 6, T, cons_runs=cons_runs,
    )
    assert np.array_equal(np.asarray(bv_d)[:6], bv_h), "base votes FAILED"
    assert np.array_equal(np.asarray(iv_d)[:6], iv_h), "ins votes FAILED"
    assert np.array_equal(np.asarray(cv_d)[:6], cv_h), "cover FAILED"
    log("  fused vote tables match host oracle")

    # Mosaic parity of the fused Pallas consensus kernel (interpret-mode
    # CPU parity is asserted in tests; this validates the REAL compile)
    try:
        from raven_tpu.ops.pallas_consensus import (
            HAS_PALLAS,
            fused_votes_pallas,
        )

        import jax as _jax

        if HAS_PALLAS and _jax.default_backend() != "cpu":
            bv_p, iv_p, cv_p = fused_votes_pallas(
                jnp.asarray(cons_arr), jnp.asarray(cons_lens),
                jnp.asarray(cons_runs), jnp.asarray(frags),
                jnp.asarray(q_lens), jnp.asarray(wts),
                jnp.asarray(win_of), T, Q, NWIN, interpret=False,
            )
            assert np.array_equal(
                np.asarray(bv_p), np.asarray(bv_d)
            ), "pallas base votes FAILED"
            assert np.array_equal(
                np.asarray(iv_p), np.asarray(iv_d)
            ), "pallas ins votes FAILED"
            assert np.array_equal(
                np.asarray(cv_p), np.asarray(cv_d)
            ), "pallas cover FAILED"
            log("  pallas fused consensus kernel matches (Mosaic)")
    except Exception as e:  # noqa: BLE001
        log(f"  pallas fused consensus: FAILED ({e}) — keep it opt-in!")

    # anchored banded NW parity (true banded path, default on)
    bwins, truthsb = [], []
    for _ in range(4):
        truth = rng.integers(0, 4, 300).astype(np.uint8)
        frags2 = [mutate(truth) for _ in range(15)]
        spans = [(0, 300)] * 15
        bwins.append((mutate(truth), frags2, None, spans))
        truthsb.append(truth)
    out_full = device_window_consensus(
        bwins, iterations=2, t_pad=384, q_pad=512, chunk=64,
        banded=False,
    )
    out_band = device_window_consensus(
        bwins, iterations=2, t_pad=384, q_pad=512, chunk=64,
        banded=True,
    )
    for a, b in zip(out_full, out_band):
        assert edit_distance(a, b) <= 2, "banded vs full diverged"
    log("  banded consensus matches full on hardware")

    # end-to-end window quality on device
    windows, truths2 = [], []
    for _ in range(4):
        truth = rng.integers(0, 4, 300).astype(np.uint8)
        frags2 = [mutate(truth) for _ in range(15)]
        windows.append((mutate(truth), frags2, None))
        truths2.append(truth)
    out = device_window_consensus(
        windows, iterations=2, t_pad=384, q_pad=512, chunk=64
    )
    for cons, truth, (bb, _, _) in zip(out, truths2, windows):
        before = edit_distance(bb, truth)
        after = edit_distance(cons, truth)
        assert after < max(4, before * 0.2), f"window ED {before} -> {after}"
    log("  device window consensus quality ok")


def main() -> int:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/root/.cache/raven_tpu_jax"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")
    if backend == "cpu":
        log("WARNING: no accelerator — this run does NOT validate hardware")

    from raven_tpu.io import parse_file

    readset = parse_file(LAMBDA)
    rng = np.random.default_rng(33)

    t0 = time.perf_counter()
    check_sketch_parity(readset)
    check_overlap_digest(readset)
    check_consensus_parity(rng)
    log(f"ALL HARDWARE PARITY CHECKS PASSED ({time.perf_counter()-t0:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
