"""Shift-banded window consensus: the gather-free polish engine.

TPU-native successor of ops/consensus_device.py's full-rectangle NW and
anchored-banded kernels (both kept as oracles/fallbacks).  Replaces the
reference's CUDA POA batches (racon dependency, use site
RavenLib/src/polish.cc:43-48) with a formulation chosen for this
hardware's measured limits (NOTES.md round 4): XLA gathers/scatters move
~38 M elements/s on the chip, so the classic traceback walk
(moves-gather per step) and vote scatter were the consensus wall — NOT
the DP compute.  Everything here is static slices, shifts, cumulative
ops and one-hot MXU matmuls; the hot path performs ZERO gathers and
ZERO scatters.

Design
------
1. **Slope-1 banded NW with host pre-shifted fragments.**  Each
   fragment is stored at column offset ``r0 + BW/2 + 1`` (its placement
   start row on the window backbone): in shifted coordinates every
   fragment's band corridor advances EXACTLY one column per DP row, so
   the band regather from the previous row is a static 1-shift (the
   r03 anchored-banded kernel did 3 ``take_along_axis`` per row and
   measured 23x slower than full NW for this reason).  Work per
   fragment: T*BW cells instead of T*(Q+1).
2. **Mask-walk traceback + votes in one reverse row scan.**  Instead of
   walking (t, j) pointers with per-step gathers, the path position is
   carried as a ONE-HOT lane mask over the band.  Per consensus row:
   consume the insertion run (a cumulative-max slide), extract the
   move/base/weight under the mask (masked reductions), emit the row's
   vote packed into a scan-indexed [T, B] array — which replaces the
   unique-index scatter of the old path entirely — and shift the mask
   for the next row (diag: same lane, up: +1 lane).  Per-window
   reduction stays the exact one-hot f32 matmul (sums << 2^24).
3. Alignment semantics (scores 3/-5/-4, free consensus prefix/suffix,
   left-closure tie-breaks, homopolymer-canonical insertion votes,
   quality weighting) match nw_moves_kernel + traceback_kernel +
   consensus_votes bit-for-bit whenever the optimal path stays inside
   the band; parity is tested with a band covering the full rectangle.

Weights are packed with the base into one uint8 (base | min(w,63)<<2):
quality weights cap at 63 on this engine (phred > 63 does not occur in
real FASTQ; the full-NW engine keeps the uncapped path).
"""

from __future__ import annotations

import functools

import numpy as np

try:
    import jax
    import jax.numpy as jnp

    from raven_tpu.utils.jaxcfg import ensure_jax_cache

    ensure_jax_cache()
    HAS_JAX = True
except Exception:  # pragma: no cover
    HAS_JAX = False

NEG = -(1 << 20)
MATCH, MISMATCH, GAP = 3, -5, -4
WCAP = 63  # quality weight cap (2 bits base + 6 bits weight per byte)


def pack_shifted_fragments(
    frag_rows, weight_rows, r0, q_pad: int, t_pad: int, bw: int
):
    """Host prep: [B, SW] uint8 of (base | weight<<2), fragment i stored
    at column offset r0[i] + bw//2 + 1.  Chars the band never reads
    (beyond SW) are dropped; the j<=qlen mask in the kernel uses the
    full length.  Returns (packed, q_lens)."""
    B = len(frag_rows)
    SW = t_pad + bw + 1
    packed = np.zeros((B, SW), dtype=np.uint8)
    q_lens = np.zeros(B, dtype=np.int32)
    half = bw // 2 + 1
    for i, f in enumerate(frag_rows):
        f = np.asarray(f, np.uint8)[:q_pad]
        q_lens[i] = f.size
        off = int(r0[i]) + half
        n = min(f.size, max(SW - off, 0))
        if n <= 0:
            continue
        w = (
            np.minimum(weight_rows[i][:n], WCAP).astype(np.uint8)
            if weight_rows is not None
            else np.ones(n, np.uint8)
        )
        packed[i, off : off + n] = f[:n] | (w << 2)
    return packed, q_lens


if HAS_JAX:

    @functools.partial(jax.jit, static_argnames=("T", "BW"))
    def band_forward(cw, t_lens, fw_sh, q_lens, r0, T: int, BW: int):
        """Slope-1 banded NW forward.

        cw [B, T] int32 per-fragment consensus rows (pad < 0), t_lens
        [B], fw_sh [B, T+BW+1] uint8 packed shifted fragments, q_lens
        [B], r0 [B] placement start rows.  At DP row r the band covers
        absolute fragment columns j = r + u - BW/2 - r0 for lane
        u in [0, BW); the fragment char feeding column j sits at shifted
        column r + u (static slice).  Returns (moves [T, B, BW//16]
        int32 2-bit-packed, end_scores [T, B], row0_score [B]).
        Move codes: 0 diag, 1 up/free-column, 2 left.
        """
        B = cw.shape[0]
        u = jnp.arange(BW, dtype=jnp.int32)
        half = BW // 2
        shifts2 = (2 * jnp.arange(16, dtype=jnp.int32))[None, None, :]

        # DP row 0: j = u - half - r0
        j0 = u[None, :] - half - r0[:, None]
        row0 = jnp.where(
            (j0 >= 0) & (j0 <= q_lens[:, None]), j0 * GAP, NEG
        ).astype(jnp.int32)

        def step(prev, r):
            # j for THIS row r+1 (r is 0-based scan index, DP row r+1)
            j = (r + 1) + u[None, :] - half - r0[:, None]
            fw = jax.lax.dynamic_slice_in_dim(
                fw_sh, r + 1, BW, axis=1
            ).astype(jnp.int32)
            fchar = fw & 3
            tchar = jax.lax.dynamic_slice_in_dim(cw, r, 1, axis=1)
            sub = jnp.where(fchar == tchar, MATCH, MISMATCH)
            # prev row: diag = prev at same lane (j-1), up = prev at
            # lane u+1 (same j) — the slope-1 static shift
            up_prev = jnp.concatenate(
                [prev[:, 1:], jnp.full((B, 1), NEG, jnp.int32)], axis=1
            )
            diag = prev + sub
            up = up_prev + GAP
            take_diag = diag >= up
            e = jnp.where(take_diag, diag, up)
            mv = jnp.where(take_diag, jnp.int32(0), jnp.int32(1))
            # free consensus prefix: column j == 0 restarts at 0
            at0 = j == 0
            e = jnp.where(at0, 0, e)
            mv = jnp.where(at0, jnp.int32(1), mv)
            # left closure within the band (insertion runs)
            closed = jax.lax.cummax(e - u[None, :] * GAP, axis=1) + (
                u[None, :] * GAP
            )
            left = closed > e
            cur = jnp.where(left, closed, e)
            mv = jnp.where(left, jnp.int32(2), mv)
            # fragment domain
            cur = jnp.where((j >= 0) & (j <= q_lens[:, None]), cur, NEG)
            # end score: D[r+1][q_len] when this row exists
            in_row = (r < t_lens)[:, None]
            end = jnp.max(
                jnp.where((j == q_lens[:, None]) & in_row, cur, NEG),
                axis=1,
            )
            word = (
                (mv.reshape(B, BW // 16, 16) << shifts2)
                .sum(axis=2)
                .astype(jnp.int32)
            )
            return cur, (word, end)

        _, (moves, end_scores) = jax.lax.scan(
            step, row0, jnp.arange(T, dtype=jnp.int32), unroll=2
        )
        row0_score = (q_lens * GAP).astype(jnp.int32)
        return moves, end_scores, row0_score

    @functools.partial(jax.jit, static_argnames=("T", "BW", "NWIN"))
    def mask_walk_votes(
        moves,
        end_scores,
        row0_score,
        fw_sh,
        q_lens,
        r0,
        win_idx,
        T: int,
        BW: int,
        NWIN: int,
    ):
        """Traceback + vote emission as ONE reverse row scan, gather-free.

        Path position = one-hot lane mask over the band.  Per row:
        entry-init fragments whose best end row is this row, slide the
        insertion run (cumulative ops), extract move/base/weight by
        masked reduction, emit packed votes; shift the mask (diag: same
        lane, up: +1 lane).  Returns (base_votes [NWIN, T, 5],
        ins_raw [NWIN, T+1, 4], cover [NWIN, T]) — ins_raw is keyed by
        RAW junction row; homopolymer canonicalization happens after
        (one tiny per-iteration pass), matching consensus_votes'
        cons_runs lookup exactly.
        """
        B = q_lens.shape[0]
        u = jnp.arange(BW, dtype=jnp.int32)
        half = BW // 2
        shifts2 = (2 * jnp.arange(16, dtype=jnp.int32))[None, None, :]

        best_r = jnp.argmax(end_scores, axis=0)
        best = jnp.max(end_scores, axis=0)
        t0 = jnp.where(row0_score >= best, 0, best_r + 1).astype(jnp.int32)

        def row_step(m, r):
            # r = DP row (T..1); move row = moves[r-1]; chars at
            # shifted cols [r, r+BW) = frag[j-1] for j of row r
            word = jax.lax.dynamic_slice_in_dim(moves, r - 1, 1, axis=0)[0]
            mv = (word[:, :, None] >> shifts2) & 3
            mv = mv.reshape(B, BW)
            fw = jax.lax.dynamic_slice_in_dim(
                fw_sh, r, BW, axis=1
            ).astype(jnp.int32)
            j = r + u[None, :] - half - r0[:, None]
            # entry: fragments whose walk starts at this row
            u_init = q_lens + half + r0 - r
            enter = (t0 == r)[:, None] & (u[None, :] == u_init[:, None])
            m = m | enter
            # insertion-run slide: highest lane q <= p with mv != 2 and
            # j >= 1 (positions between are all mv == 2 by maximality)
            le_p = (
                jnp.cumsum(m[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1]
                > 0
            )
            cand = le_p & (mv != 2) & (j >= 1)
            sfx = jnp.cumsum(
                cand[:, ::-1].astype(jnp.int32), axis=1
            )[:, ::-1]
            at = cand & (sfx == 1)  # one-hot of the vote position
            # insertion vote: first left of the run, at the ENTRY lane
            ins_here = m & (mv == 2) & (j >= 1)
            ins_val = jnp.sum(
                jnp.where(ins_here, fw, 0), axis=1
            )  # the packed byte: base | weight<<2
            has_ins = jnp.any(ins_here, axis=1)
            # diag/up vote at the slid position
            mv_at = jnp.sum(jnp.where(at, mv, 0), axis=1)
            fw_at = jnp.sum(jnp.where(at, fw, 0), axis=1)
            has_at = jnp.any(at, axis=1)
            is_diag = has_at & (mv_at == 0)
            is_up = has_at & (mv_at == 1)
            col = jnp.where(is_diag, fw_at & 3, jnp.int32(4))
            wt = jnp.where(is_diag | is_up, fw_at >> 2, 0)
            vote = jnp.where(
                is_diag | is_up, 1 | (col << 1) | (wt << 4), 0
            )
            ins_pack = jnp.where(has_ins, 1 | (ins_val << 1), 0)
            # next row's mask: diag -> same lane (j-1), up -> lane +1
            # (same j; the band origin moves one column per row)
            m_diag = at & (mv == 0)
            m_up = at & (mv == 1)
            m_next = m_diag | jnp.concatenate(
                [jnp.zeros((B, 1), bool), m_up[:, :-1]], axis=1
            )
            # the path ends once it reaches column j == 0 (free prefix);
            # next-row j at lane v is j(v) - 1, so keep lanes with j > 1
            # for diag survivors and j(v)-1 = j_diag >= 1 for up lanes
            # (up keeps j: lane v = u'+1 has j(v) - 1 = j(u') = j' >= 1,
            # so the guard only prunes diag lanes reaching j == 0)
            m_next = m_next & (j > 1)
            return m_next, (vote, ins_pack)

        m0 = jnp.zeros((B, BW), dtype=bool)
        rows = jnp.arange(T, 0, -1, dtype=jnp.int32)
        m_last, (votes, ins_rows) = jax.lax.scan(
            row_step, m0, rows, unroll=2
        )
        # row 0: any fragment still active (or starting at t0 == 0)
        # consumes pure insertions; one run vote at its current lane
        j_last = 0 + u[None, :] - half - r0[:, None]
        enter0 = (t0 == 0)[:, None] & (
            u[None, :] == (q_lens + half + r0)[:, None]
        )
        m_fin = (m_last | enter0) & (j_last >= 1)
        fw0 = jax.lax.dynamic_slice_in_dim(fw_sh, 0, BW, axis=1).astype(
            jnp.int32
        )
        ins0_val = jnp.sum(jnp.where(m_fin, fw0, 0), axis=1)
        ins0 = jnp.where(jnp.any(m_fin, axis=1), 1 | (ins0_val << 1), 0)

        # votes[s] is row r = T - s -> consensus row r-1 = T-1-s: a flip
        votes = votes[::-1].swapaxes(0, 1)  # [B, T] row-major
        ins_rows = ins_rows[::-1].swapaxes(0, 1)  # [B, T] junction r=1..T
        # junction table [B, T+1]: row-0 insertions at junction 0
        ins_all = jnp.concatenate([ins0[:, None], ins_rows], axis=1)

        onehot = (
            win_idx.astype(jnp.int32)[None, :]
            == jnp.arange(NWIN, dtype=jnp.int32)[:, None]
        ).astype(jnp.float32)

        def seg_sum(x):
            return jnp.rint(
                jax.lax.dot(
                    onehot,
                    x.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
            ).astype(jnp.int32)

        has = votes & 1
        colv = (votes >> 1) & 7
        wv = votes >> 4
        base_votes = jnp.stack(
            [
                seg_sum(jnp.where((has == 1) & (colv == c), wv, 0))
                for c in range(5)
            ],
            axis=2,
        )
        cover = seg_sum(has)
        ihas = ins_all & 1
        ib = (ins_all >> 1) & 3
        iw = ins_all >> 3
        ins_raw = jnp.stack(
            [
                seg_sum(jnp.where((ihas == 1) & (ib == c), iw, 0))
                for c in range(4)
            ],
            axis=2,
        )
        return base_votes, ins_raw, cover

    @functools.partial(jax.jit, static_argnames=("T", "BW", "NWIN"))
    def band_votes_kernel(
        cons_arr,
        cons_lens,
        fw_sh,
        q_lens,
        r0,
        win_idx,
        T: int,
        BW: int,
        NWIN: int,
    ):
        """Forward + mask-walk votes for one fragment chunk.  The
        per-fragment consensus rows come via a one-hot MXU matmul
        (values are exact small ints in f32), NOT a [B, T] gather."""
        onehot = (
            win_idx.astype(jnp.int32)[:, None]
            == jnp.arange(NWIN, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)
        cw = jnp.rint(
            jax.lax.dot(
                onehot,
                cons_arr.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        ).astype(jnp.int32)
        t_lens = jnp.rint(
            onehot @ cons_lens.astype(jnp.float32)
        ).astype(jnp.int32)
        moves, end_scores, row0_score = band_forward(
            cw, t_lens, fw_sh, q_lens, r0, T, BW
        )
        return mask_walk_votes(
            moves, end_scores, row0_score, fw_sh, q_lens, r0, win_idx,
            T, BW, NWIN,
        )

    def _run_map_device(cons_arr, T: int):
        """Device twin of homopolymer_run_map (same cummax formulation)."""
        NWIN = cons_arr.shape[0]
        is_b = cons_arr[:, :, None] == jnp.arange(4, dtype=cons_arr.dtype)
        breaks = jnp.where(
            is_b,
            0,
            jnp.arange(1, T + 1, dtype=jnp.int32)[None, :, None],
        )
        breaks = jax.lax.cummax(breaks, axis=1)
        return jnp.concatenate(
            [jnp.zeros((NWIN, 1, 4), jnp.int32), breaks], axis=1
        )

    def _rebuild_device(cons_arr, cons_lens, bv, iv, cv, T: int):
        """Device twin of rebuild_consensus, vectorized over windows.

        Returns (toks [NWIN, 2T+1] int32 compacted, lens [NWIN]): the
        full unclipped token stream (the host twin's output before any
        t_pad clipping).  One unique-index scatter per iteration."""
        NWIN = cons_arr.shape[0]
        t_idx = jnp.arange(T, dtype=jnp.int32)
        tj_idx = jnp.arange(T + 1, dtype=jnp.int32)
        L = cons_lens
        iv_sum = iv.sum(axis=2)
        ib = jnp.argmax(iv, axis=2)
        iv_best = jnp.max(iv, axis=2)
        bv_sums = bv.sum(axis=2)
        col_w = jnp.concatenate([bv_sums[:, :1], bv_sums], axis=1)
        ins_on = (
            (iv_sum > 0)
            & (iv_best * 4 > col_w)
            & (tj_idx[None, :] <= L[:, None])
        )
        bb = jnp.argmax(bv, axis=2)
        unvoted = bv_sums == 0
        base_sym = jnp.where(unvoted, cons_arr, bb)
        base_on = (unvoted | (bb < 4)) & (t_idx[None, :] < L[:, None])
        # interleave [i0, b0, i1, b1, ..., i_{T-1}, b_{T-1}, i_T]
        pair_t = jnp.stack([ib[:, :T], base_sym], axis=2).reshape(
            NWIN, 2 * T
        )
        pair_on = jnp.stack([ins_on[:, :T], base_on], axis=2).reshape(
            NWIN, 2 * T
        )
        toks = jnp.concatenate([pair_t, ib[:, T:]], axis=1)
        on = jnp.concatenate([pair_on, ins_on[:, T:]], axis=1)
        CAP = 2 * T + 1
        pos = jnp.cumsum(on.astype(jnp.int32), axis=1) - 1
        lens = jnp.minimum(pos[:, -1] + 1, CAP)
        w_off = jnp.arange(NWIN, dtype=jnp.int32)[:, None] * CAP
        flat_idx = jnp.where(on, w_off + pos, NWIN * CAP)
        out = (
            jnp.full(NWIN * CAP + 1, -1, jnp.int32)
            .at[flat_idx.reshape(-1)]
            .set(toks.reshape(-1), unique_indices=True, mode="drop")
        )
        return out[:-1].reshape(NWIN, CAP), lens

    @functools.partial(
        jax.jit, static_argnames=("T", "BW", "NWIN", "ITERS")
    )
    def resident_consensus(
        cons0,
        lens0,
        fw_sh,
        q_lens,
        r0,
        win_idx,
        T: int,
        BW: int,
        NWIN: int,
        ITERS: int,
    ):
        """The full refinement loop in ONE device dispatch: per
        iteration run the banded forward + mask-walk votes over the
        whole fragment batch, canonicalize insertions, rebuild every
        window's consensus on device, feed it to the next iteration.
        Only the final token streams leave the device (~1 MB), replacing
        per-iteration vote-table d2h + consensus re-upload round trips
        through the remote-TPU tunnel."""

        def iteration(carry, _):
            cons_arr, cons_lens = carry
            runs = _run_map_device(cons_arr, T)
            bv, ir, cv = band_votes_kernel(
                cons_arr, cons_lens, fw_sh, q_lens, r0, win_idx,
                T, BW, NWIN,
            )
            iv = canonicalize_ins(ir, runs, T)
            toks, lens = _rebuild_device(
                cons_arr, cons_lens, bv, iv, cv, T
            )
            new_cons = toks[:, :T]
            new_lens = jnp.minimum(lens, T)
            return (new_cons, new_lens), (toks, lens)

        (_, _), (toks_all, lens_all) = jax.lax.scan(
            iteration, (cons0, lens0), None, length=ITERS
        )
        return toks_all[-1].astype(jnp.int8), lens_all[-1]

    @functools.lru_cache(maxsize=None)
    def _resident_consensus_sharded(mesh, T, BW, NWIN, ITERS):
        """Multi-chip twin: fragments shard over the mesh, vote tables
        psum inside each iteration, rebuild replicated (deterministic) —
        output bit-identical to the single-device loop (integer adds
        commute across the psum)."""
        from jax.sharding import PartitionSpec as P

        names = mesh.axis_names
        axis = names[0] if len(names) == 1 else tuple(names)

        def step(cons0, lens0, fw_sh, q_lens, r0, win_idx):
            def iteration(carry, _):
                cons_arr, cons_lens = carry
                runs = _run_map_device(cons_arr, T)
                bv, ir, cv = band_votes_kernel(
                    cons_arr, cons_lens, fw_sh, q_lens, r0, win_idx,
                    T, BW, NWIN,
                )
                bv = jax.lax.psum(bv, axis)
                ir = jax.lax.psum(ir, axis)
                cv = jax.lax.psum(cv, axis)
                iv = canonicalize_ins(ir, runs, T)
                toks, lens = _rebuild_device(
                    cons_arr, cons_lens, bv, iv, cv, T
                )
                return (
                    (toks[:, :T], jnp.minimum(lens, T)),
                    (toks, lens),
                )

            (_, _), (toks_all, lens_all) = jax.lax.scan(
                iteration, (cons0, lens0), None, length=ITERS
            )
            return toks_all[-1].astype(jnp.int8), lens_all[-1]

        in_specs = (P(), P(), P(axis), P(axis), P(axis), P(axis))
        try:
            from jax import shard_map

            return jax.jit(
                shard_map(
                    step, mesh=mesh, in_specs=in_specs,
                    out_specs=(P(), P()), check_vma=False,
                )
            )
        except (ImportError, TypeError):  # older jax
            from jax.experimental.shard_map import shard_map as _sm

            return jax.jit(
                _sm(
                    step, mesh=mesh, in_specs=in_specs,
                    out_specs=(P(), P()), check_rep=False,
                )
            )

    @functools.partial(jax.jit, static_argnames=("T",))
    def canonicalize_ins(ins_raw, cons_runs, T: int):
        """Move raw-junction insertion votes to their homopolymer run
        starts (cons_runs [NWIN, T+1, 4] from homopolymer_run_map).
        One small scatter-add per iteration — NOT in the per-chunk hot
        path.  Exactly consensus_votes' junction lookup."""
        NWIN = ins_raw.shape[0]
        w = jnp.arange(NWIN, dtype=jnp.int32)[:, None, None]
        b = jnp.arange(4, dtype=jnp.int32)[None, None, :]
        idx = (w * (T + 1) + cons_runs) * 4 + b
        return (
            jnp.zeros(NWIN * (T + 1) * 4, jnp.int32)
            .at[idx.reshape(-1)]
            .add(ins_raw.reshape(-1))
            .reshape(NWIN, T + 1, 4)
        )


def _pow2(v: int, lo: int) -> int:
    c = lo
    while c < v:
        c <<= 1
    return c


def band_window_consensus(
    windows,
    iterations: int = 2,
    t_pad: int = 640,
    q_pad: int = 768,
    bw: int = 256,
    group: int | None = None,
    max_rows: int = 32768,
    mesh=None,
):
    """Batched window consensus on the shift-banded resident engine.

    windows: [(backbone, fragments, weights-or-None[, spans])]; same
    contract as consensus_device.device_window_consensus.  Windows are
    split into groups; each group runs its full refinement loop in one
    device dispatch, and groups pipeline (dispatch all, then collect),
    so the remote-tunnel round trip amortizes over the whole call.

    Group size trades the quadratic one-hot matmuls (consensus-row
    expansion + vote segment-sums are O(NWIN * B * T), i.e. O(group^2)
    per group) against dispatch count; measured on a v5e through the
    remote tunnel (2048 windows x 30 frags): group 1024 -> 218 k
    bases/s, 512 -> 487 k, 128 -> 568 k.  Default 128; override with
    RAVEN_TPU_CONSENSUS_GROUP.
    """
    if group is None:
        import os

        group = int(os.environ.get("RAVEN_TPU_CONSENSUS_GROUP", "128"))
    if not HAS_JAX:
        raise RuntimeError("jax unavailable")
    n_win = len(windows)
    windows = [
        (w[0], w[1], w[2], w[3] if len(w) > 3 else None) for w in windows
    ]
    out: list = [None] * n_win
    pending = []  # (win_lo, n_local, toks_dev, lens_dev)

    wi = 0
    while wi < n_win:
        # group boundary: window count AND fragment-row budget
        lo = wi
        rows = 0
        while wi < n_win and (wi - lo) < group:
            r = len(windows[wi][1])
            if rows + r > max_rows and wi > lo:
                break
            rows += r
            wi += 1
        grp = windows[lo:wi]
        n_local = len(grp)

        frag_rows: list = []
        weight_rows: list = []
        win_of: list = []
        r0_list: list = []
        for gi, (bb, frags, wts, spans) in enumerate(grp):
            for fi, f in enumerate(frags):
                frag_rows.append(np.asarray(f, np.uint8))
                weight_rows.append(
                    np.asarray(wts[fi], np.uint8)
                    if wts is not None
                    else np.ones(len(f), np.uint8)
                )
                win_of.append(gi)
                r0_list.append(
                    int(spans[fi][0]) if spans is not None else 0
                )
        B_total = len(frag_rows)
        NWIN = _pow2(n_local, 8)
        B_pad = _pow2(max(B_total, 1), 256)
        if mesh is not None:
            n_dev = mesh.devices.size
            B_pad = -(-B_pad // n_dev) * n_dev
        r0 = np.zeros(B_pad, np.int32)
        r0[:B_total] = np.clip(r0_list, 0, t_pad - 1)
        fw_sh = np.zeros((B_pad, t_pad + bw + 1), np.uint8)
        q_lens = np.zeros(B_pad, np.int32)
        if B_total:
            fw_sh[:B_total], q_lens[:B_total] = pack_shifted_fragments(
                frag_rows, weight_rows, r0, q_pad, t_pad, bw
            )
        win_of_arr = np.zeros(B_pad, np.int32)
        win_of_arr[:B_total] = win_of
        cons0 = np.full((NWIN, t_pad), -1, np.int32)
        lens0 = np.zeros(NWIN, np.int32)
        for gi, (bb, _f, _w, _s) in enumerate(grp):
            bb = np.asarray(bb, np.uint8)
            cl = min(bb.size, t_pad)
            cons0[gi, :cl] = bb[:cl]
            lens0[gi] = cl

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            names = mesh.axis_names
            ax = names[0] if len(names) == 1 else tuple(names)
            sh = NamedSharding(mesh, P(ax))
            sh2 = NamedSharding(mesh, P(ax, None))
            step = _resident_consensus_sharded(
                mesh, t_pad, bw, NWIN, int(iterations)
            )
            toks, lens = step(
                jnp.asarray(cons0),
                jnp.asarray(lens0),
                jax.device_put(jnp.asarray(fw_sh), sh2),
                jax.device_put(jnp.asarray(q_lens), sh),
                jax.device_put(jnp.asarray(r0), sh),
                jax.device_put(jnp.asarray(win_of_arr), sh),
            )
        else:
            toks, lens = resident_consensus(
                jnp.asarray(cons0),
                jnp.asarray(lens0),
                jnp.asarray(fw_sh),
                jnp.asarray(q_lens),
                jnp.asarray(r0),
                jnp.asarray(win_of_arr),
                t_pad,
                bw,
                NWIN,
                int(iterations),
            )
        pending.append((lo, n_local, toks, lens))

    for lo, n_local, toks, lens in pending:
        toks_np = np.asarray(toks)
        lens_np = np.asarray(lens)
        for gi in range(n_local):
            out[lo + gi] = toks_np[gi, : int(lens_np[gi])].astype(np.uint8)
    return out
