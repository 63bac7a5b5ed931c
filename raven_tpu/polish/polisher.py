"""Racon-equivalent consensus polisher.

Reference behaviour being reproduced (use site RavenLib/src/polish.cc:43-51
plus the racon library dependency it drives):

  1. map reads to target contigs with the minimizer engine (k=15, w=5,
     freq=0.001), keeping each read's longest overlap;
  2. drop overlaps whose span error 1 - min(span)/max(span) > 0.3;
  3. split every overlap at 500-base target window boundaries (progressive
     piecewise alignment, raven_tpu.ops.align_dp — batched across overlaps);
  4. drop fragments shorter than 2% of the window or with mean quality
     below the dataset average;
  5. per-window POA consensus (backbone + fragments, NW 3/-5/-4) with
     coverage trimming; windows with fewer than 2 fragments stay unpolished;
  6. contigs are re-assembled from window consensuses and named with an
     ` XC:f:<polished fraction>` suffix — the value after the last ':'
     is what raven's Polish parses (polish.cc:57-59).
"""

from __future__ import annotations

import sys
import time

import numpy as np

from raven_tpu.io.readset import reverse_complement
from raven_tpu.overlap.engine import MinimizerIndex
from raven_tpu.overlap.types import overlap_length
from raven_tpu.ops.align_dp import batched_infix_align
from raven_tpu.ops.poa import poa_consensus

MAP_K = 15  # read->contig mapping k-mer length (racon's ram default)
WINDOW_LEN = 500  # polish.cc:44 (racon window_length)
ERROR_THRESHOLD = 0.3  # polish.cc:44
MIN_FRAGMENT = int(WINDOW_LEN * 0.02)
POA_BATCH_TARGET = 256  # device batch size for the JAX POA path


_POA_JOBS = None
_POA_SELF = None


def _poa_pool_worker(i):
    _, _, backbone, frag_codes, weights = _POA_JOBS[i]
    s = _POA_SELF
    return poa_consensus(
        backbone, frag_codes, weights, s.match, s.mismatch, s.gap, s.trim
    )


class _SeqView:
    def __init__(self, codes_list):
        self.codes_list = codes_list
        self.lengths = np.array([c.size for c in codes_list], dtype=np.int64)

    def __len__(self):
        return len(self.codes_list)

    def sequence(self, i, begin=0, length=None):
        c = self.codes_list[i]
        if length is None:
            length = c.size - begin
        return c[begin : begin + length]


class Polisher:
    def __init__(
        self,
        quality_threshold: float = 0.0,
        error_threshold: float = ERROR_THRESHOLD,
        window_len: int = WINDOW_LEN,
        trim: bool = True,
        match: int = 3,
        mismatch: int = -5,
        gap: int = -4,
        use_device: bool | None = None,
        device_cfg=None,
    ):
        self.quality_threshold = quality_threshold
        self.error_threshold = error_threshold
        self.window_len = window_len
        self.trim = trim
        self.match = match
        self.mismatch = mismatch
        self.gap = gap
        self.use_device = use_device
        # DeviceCfg (reference CudaCfg analog, polish.hpp:19-23):
        # poa_batches > 0 forces the batched device consensus (chunk size
        # poa_batches * 256 fragment rows per dispatch), alignment_batches
        # > 0 forces the device window-placement DP, banded_alignment
        # restricts the consensus NW to a diagonal corridor
        self.device_cfg = device_cfg
        # consensus backend override: None = follow use_device/auto; the
        # graph-level driver schedules POA rounds + a device-voting final
        # round (see raven_tpu.polish.polish)
        self.use_device_consensus: bool | None = None

    # ------------------------------------------------------------------
    def _infix_align(self, tgt_arr, t_lens, qry_arr, q_lens):
        """Dispatch the window-placement DP to the device (JAX) when
        available, else the numpy reference."""
        use_dev = self.use_device
        if self.device_cfg is not None and self.device_cfg.alignment_batches > 0:
            use_dev = True
        if use_dev is None:
            # default: device path only on an actual accelerator — the CPU
            # XLA backend loses to the numpy prefix-trick implementation
            try:
                import jax

                use_dev = jax.default_backend() != "cpu"
            except Exception:
                use_dev = False
        if use_dev:
            try:
                from raven_tpu.ops.jax_dp import HAS_JAX, infix_align_device

                if HAS_JAX and tgt_arr.shape[1] + qry_arr.shape[1] < 3500:
                    _, qs, qe = infix_align_device(
                        tgt_arr, t_lens, qry_arr, q_lens
                    )
                    return qs, qe
            except Exception:
                if self.use_device:
                    raise
        _, qs, qe = batched_infix_align(tgt_arr, t_lens, qry_arr, q_lens)
        return qs, qe

    # ------------------------------------------------------------------
    def _find_overlaps(self, targets, readset):
        """Longest passing overlap per read with its chain anchors (racon
        keeps each read's best overlap)."""
        view = _SeqView([codes for _, codes in targets])
        index = MinimizerIndex(15, 5)
        index.minimize(view, np.arange(len(targets)))
        index.filter(0.001)

        anchors_map: dict = {}
        results: dict = {}
        CHUNK = 4096  # bound the expanded match arrays
        for c0 in range(0, len(readset), CHUNK):
            results.update(
                index.map_many(
                    readset,
                    np.arange(c0, min(c0 + CHUNK, len(readset))),
                    avoid_equal=False,
                    avoid_symmetric=False,
                    anchors_out=anchors_map,
                )
            )
        chosen = []
        for i in range(len(readset)):
            ovl = results[i]
            if ovl.size == 0:
                continue
            bi = int(np.argmax(overlap_length(ovl)))
            best = ovl[bi]
            lspan = int(best["lhs_end"]) - int(best["lhs_begin"])
            rspan = int(best["rhs_end"]) - int(best["rhs_begin"])
            err = 1.0 - min(lspan, rspan) / max(lspan, rspan)
            if err > self.error_threshold:
                continue
            chosen.append((best, anchors_map[i][bi]))
        return chosen

    # ------------------------------------------------------------------
    def _fragments(self, overlaps, targets, readset):
        """Window fragments per target via anchor-guided infix alignment.

        For every (overlap, target-window) pair, the chain's minimizer
        anchors interpolate the expected query interval; a batched infix DP
        (target piece consumed fully, query start/end free within a slack
        corridor) places it exactly.  Every piece of every overlap aligns
        independently — one rectangular batch, no sequential chain — which
        is what makes the device path a single dispatch.

        Returns {target_id: {window_id: [(win_rel_begin, codes, quals)]}}.
        """
        w = self.window_len
        jobs = []  # (state_idx, win_id, rel_begin, t0, t1, q_lo, q_hi)
        states = []
        for o, (aq, at) in overlaps:
            rid = int(o["lhs_id"])
            tid = int(o["rhs_id"])
            qb, qe = int(o["lhs_begin"]), int(o["lhs_end"])
            tb, te = int(o["rhs_begin"]), int(o["rhs_end"])
            strand = int(o["strand"])
            q = readset.sequence(rid, qb, qe - qb)
            qq = readset.quality(rid, qb, qe - qb)
            if not strand:
                q = reverse_complement(q)
                qq = qq[::-1] if qq.size else qq
            # anchors in (target_pos, oriented_query_pos), ascending in t
            if strand:
                ta = at.astype(np.int64)
                qa = (aq - qb).astype(np.int64)
            else:
                ta = at[::-1].astype(np.int64)
                qa = (qe - (aq[::-1] + MAP_K)).astype(np.int64)
            # extend with overlap endpoints for extrapolation
            ta = np.concatenate([[tb], ta, [te]])
            qa = np.concatenate([[0], qa, [q.size]])
            # enforce monotonicity (guard against stray anchors)
            keep = np.ones(ta.size, dtype=bool)
            running = -1
            for idx in range(ta.size):
                if ta[idx] <= running:
                    keep[idx] = False
                else:
                    running = ta[idx]
            ta, qa = ta[keep], np.maximum.accumulate(qa[keep])

            si = len(states)
            states.append({"tid": tid, "q": q, "qq": qq})
            t0 = tb
            while t0 < te:
                t1 = min(((t0 // w) + 1) * w, te)
                piece = t1 - t0
                q_lo = int(np.interp(t0, ta, qa))
                q_hi = int(np.interp(t1, ta, qa))
                slack = 100 + int(0.1 * piece)
                q_lo = max(0, q_lo - slack)
                q_hi = min(q.size, q_hi + slack)
                if q_hi - q_lo >= 1 and piece >= 1:
                    jobs.append((si, t0 // w, t0 % w, t0, t1, q_lo, q_hi))
                t0 = t1

        out: dict[int, dict[int, list]] = {}
        if not jobs:
            return out

        # one rectangular batch over all pieces (chunked to bound memory)
        CHUNK = 4096
        for c0 in range(0, len(jobs), CHUNK):
            chunk = jobs[c0 : c0 + CHUNK]
            T = max(j[4] - j[3] for j in chunk)
            Q = max(j[6] - j[5] for j in chunk)
            B = len(chunk)
            tgt_arr = np.zeros((B, T), dtype=np.uint8)
            qry_arr = np.zeros((B, Q), dtype=np.uint8)
            t_lens = np.zeros(B, dtype=np.int64)
            q_lens = np.zeros(B, dtype=np.int64)
            for bi, (si, win_id, rel, t0, t1, q_lo, q_hi) in enumerate(chunk):
                tgt = targets[states[si]["tid"]][1][t0:t1]
                qry = states[si]["q"][q_lo:q_hi]
                tgt_arr[bi, : tgt.size] = tgt
                qry_arr[bi, : qry.size] = qry
                t_lens[bi] = tgt.size
                q_lens[bi] = qry.size
            q_starts, q_ends = self._infix_align(tgt_arr, t_lens, qry_arr, q_lens)
            for bi, (si, win_id, rel, t0, t1, q_lo, q_hi) in enumerate(chunk):
                fb = q_lo + int(q_starts[bi])
                fe = q_lo + int(q_ends[bi])
                states[si].setdefault("placed", []).append(
                    (win_id, rel, fb, fe)
                )

        # stitch adjacent windows of each read to the midpoint: free-ended
        # placements clip noisy fragment edges, which would starve support
        # at window boundaries; contiguous tiling keeps every query base
        for s in states:
            placed = s.get("placed", [])
            for a in range(len(placed) - 1):
                w0, r0, b0, e0 = placed[a]
                w1, r1, b1, e1 = placed[a + 1]
                mid = (e0 + b1) // 2
                mid = max(min(mid, e1), b0)
                placed[a] = (w0, r0, b0, mid)
                placed[a + 1] = (w1, r1, mid, e1)
            for win_id, rel, fb, fe in placed:
                if fe - fb < MIN_FRAGMENT:
                    continue
                quals = s["qq"][fb:fe] if s["qq"].size else None
                if (
                    quals is not None
                    and self.quality_threshold > 0
                    and quals.mean() < self.quality_threshold
                ):
                    continue
                out.setdefault(s["tid"], {}).setdefault(win_id, []).append(
                    (rel, s["q"][fb:fe], quals)
                )
        return out

    # ------------------------------------------------------------------
    def polish(self, targets, readset, include_unpolished: bool = False):
        """targets: list of (name, codes).  Returns list of (name', codes')
        where name' carries the ` XC:f:<fraction>` suffix; unpolished
        targets are included only when include_unpolished (the raven call
        site passes False, polish.cc:51)."""
        t0 = time.perf_counter()
        overlaps = self._find_overlaps(targets, readset)
        frag_map = self._fragments(overlaps, targets, readset)
        print(
            f"[raven_tpu::Polisher] aligned {len(overlaps)} reads "
            f"{time.perf_counter() - t0:.6f}s",
            file=sys.stderr,
        )

        t0 = time.perf_counter()
        w = self.window_len
        per_target = []  # (name, codes, pieces, jobs, polished_count)
        all_jobs = []  # (target_idx, slot, backbone, frag_codes, weights)
        for tid, (name, codes) in enumerate(targets):
            windows = frag_map.get(tid, {})
            num_windows = (codes.size + w - 1) // w
            polished_count = 0
            pieces = []
            for win_id in range(num_windows):
                backbone = codes[win_id * w : min((win_id + 1) * w, codes.size)]
                frags = sorted(
                    windows.get(win_id, []), key=lambda f: f[0]
                )
                if len(frags) < 2:  # racon: < 3 sequences incl. backbone
                    pieces.append(backbone)
                    continue
                polished_count += 1
                frag_codes = [f[1] for f in frags]
                if all(f[2] is not None for f in frags):
                    weights = [
                        np.minimum(f[2].astype(np.int64) + 1, 255).astype(
                            np.uint8
                        )
                        for f in frags
                    ]
                else:
                    weights = None
                pieces.append(None)
                all_jobs.append(
                    (tid, len(pieces) - 1, backbone, frag_codes, weights)
                )
            per_target.append((name, codes, pieces, polished_count, num_windows))

        consensi = self._run_consensus(all_jobs)
        for (tid, slot, *_), cons in zip(all_jobs, consensi):
            per_target[tid][2][slot] = cons

        results = []
        for name, codes, pieces, polished_count, num_windows in per_target:
            fraction = polished_count / max(num_windows, 1)
            if fraction == 0 and not include_unpolished:
                continue
            polished = np.concatenate(pieces) if pieces else codes
            results.append((f"{name} XC:f:{fraction:.6f}", polished))
        print(
            f"[raven_tpu::Polisher] generated consensus "
            f"{time.perf_counter() - t0:.6f}s",
            file=sys.stderr,
        )
        return results

    # ------------------------------------------------------------------
    def _run_consensus(self, jobs):
        """Dispatch window consensus jobs: batched device kernel on an
        accelerator (the reference's CUDA-POA analog), C++/python POA on
        host."""
        use_dev = self.use_device_consensus
        dc = self.device_cfg
        if dc is not None and dc.poa_batches > 0:
            use_dev = True
        if use_dev is None:
            use_dev = self.use_device
        if use_dev is None:
            try:
                import jax

                use_dev = jax.default_backend() != "cpu"
            except Exception:
                use_dev = False
        if use_dev and jobs:
            try:
                from raven_tpu.ops.consensus_device import (
                    device_window_consensus,
                )

                windows = [
                    (backbone, frag_codes, weights)
                    for _, _, backbone, frag_codes, weights in jobs
                ]
                kwargs = {}
                if dc is not None and dc.poa_batches > 0:
                    kwargs["chunk"] = 256 * dc.poa_batches
                if dc is not None and dc.banded_alignment:
                    kwargs["banded"] = True
                print(
                    f"[raven_tpu::Polisher] device consensus "
                    f"{len(windows)} windows {kwargs}",
                    file=sys.stderr,
                )
                return device_window_consensus(
                    windows, iterations=4, **kwargs
                )
            except Exception:
                if self.use_device or (dc is not None and dc.poa_batches > 0):
                    raise
        return self._run_poa_host(jobs)

    def _run_poa_host(self, jobs):
        """C++ POA over all windows; windows are independent, so large
        batches fan out over a fork pool (the reference's racon runs its
        windows on a thread pool likewise)."""
        import os
        import sys

        def run_one(job):
            _, _, backbone, frag_codes, weights = job
            return poa_consensus(
                backbone,
                frag_codes,
                weights,
                self.match,
                self.mismatch,
                self.gap,
                self.trim,
            )

        from raven_tpu.config import worker_count

        workers = worker_count()
        if (
            len(jobs) >= 64
            and workers > 1
            and sys.platform.startswith("linux")
            and os.environ.get("RAVEN_TPU_NO_MP") != "1"
        ):
            import multiprocessing as mp

            global _POA_JOBS, _POA_SELF
            _POA_JOBS = jobs
            _POA_SELF = self
            try:
                ctx = mp.get_context("fork")
                with ctx.Pool(workers) as pool:
                    chunk = max(1, len(jobs) // (workers * 4))
                    return pool.map(_poa_pool_worker, range(len(jobs)), chunk)
            finally:
                _POA_JOBS = None
                _POA_SELF = None
        return [run_one(j) for j in jobs]
