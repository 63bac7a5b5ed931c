"""Pallas TPU kernel: window-consensus NW + traceback, fused in VMEM.

The XLA consensus path (ops/consensus_device.py) materializes a
[T, B, Q] move matrix in HBM and walks it back with a [STEPS]-long chain
of XLA gathers — gather throughput (~1 element/cycle) bounds the whole
polish stage.  This kernel keeps everything for a block of FB=8
fragments on-core:

  * the forward NW runs vectorized on the VPU ([8, Q] int32 rows, the
    same 3/-5/-4 scores, free consensus prefix/suffix, tie-breaks
    identical to nw_moves_kernel);
  * each row's 2-bit move codes pack 8-per-f32-word with one small MXU
    dot_general straight into a [T, PW, FB] VMEM scratch (lane axis =
    fragment, so the traceback's per-fragment loads index the lane
    STATICALLY — Mosaic rejects dynamic-lane scalar loads);
  * the traceback runs on the scalar core per fragment, accumulating
    per-row vote primitives (column symbol + weight, insertion-run
    starts) into SMEM scratch via scalar stores (legal in SMEM; the
    r03 kernel died on "Cannot store scalars to VMEM"), packed one
    int32 per (fragment, row).

Vote-table aggregation stays in XLA (votes_from_primitives): one
scatter-add over the primitives reproduces fused_votes_kernel's tables
bit-exactly (each alignment path visits every consensus row at most
once, so per-row primitives lose nothing).

Mosaic workarounds (NOTES.md): int32 lanes everywhere, pltpu.roll
instead of unaligned lane slices, jnp.where instead of bool casts,
SMEM for all scalar-indexed stores, static-lane VMEM scratch loads.
"""

from __future__ import annotations

import functools

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

FB = 8  # fragments per grid step (sublane dimension)
MATCH, MISMATCH, GAP = 3, -5, -4
NEG = -(1 << 20)
_NEG2 = -(1 << 26)  # below any adjusted closure value
PACK = 8  # move codes per packed f32 word (4^8 = 65536 < 2^24, exact)


def _compiler_params():
    """Raise the scoped-VMEM ceiling: the [T, PW, FB] packed-move
    scratch plus pallas double buffers exceed the 16 MB default at
    production shapes (measured 16.14 MB at T=Q=256)."""
    try:
        return pltpu.CompilerParams(
            vmem_limit_bytes=repr(96 * 1024 * 1024) and 96 * 1024 * 1024
        )
    except Exception:
        try:
            return pltpu.TPUCompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024
            )
        except Exception:
            return None


if HAS_PALLAS:
    _COMPILER_PARAMS = _compiler_params()

    def _prefix_max_lanes(x, Q):
        """Inclusive prefix max along lanes via log-step circular rolls
        (wrapped lanes masked; aligned — dynamic lane slices miscompile)."""
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        s = 1
        while s < Q:
            shifted = pltpu.roll(x, shift=s, axis=1)
            x = jnp.maximum(
                x, jnp.where(lane >= s, shifted, jnp.int32(_NEG2))
            )
            s <<= 1
        return x

    def _consensus_block_kernel(
        cons_ref,
        tlens_ref,
        frags_ref,
        qlens_ref,
        wts_ref,
        packmat_ref,
        fw_smem_ref,
        col_smem,
        ins_smem,
        packed_ref,
        *,
        T,
        Q,
        PW,
        TP,
    ):
        cons = cons_ref[:]  # [FB, T] int32
        frags = frags_ref[:]  # [FB, Q] int32
        tlens = tlens_ref[:]  # [FB, 1]
        qlens = qlens_ref[:]  # [FB, 1]
        packmat = packmat_ref[:]  # [Q, PW] f32

        lane = jax.lax.broadcasted_iota(jnp.int32, (FB, Q), 1)
        jg = (lane + 1) * GAP  # j * GAP at array column j-1
        q_onehot = lane == (qlens - 1)  # column of j == q_len

        # DP row 0: D[0][j] = j * GAP (j = lane + 1); D[r][0] == 0 always
        row0 = jg

        def row_body(r, carry):
            prev, best_val, best_r = carry
            # consensus char of row r per fragment: roll lane r to 0
            tch = pltpu.roll(cons, shift=T - r, axis=1)[:, :1]
            sub = jnp.where(frags == tch, MATCH, MISMATCH)
            prev_shift = pltpu.roll(prev, shift=1, axis=1)
            prev_jm1 = jnp.where(lane == 0, 0, prev_shift)  # D[r][0] = 0
            diag = prev_jm1 + sub
            up = prev + GAP
            take_diag = diag >= up
            e = jnp.maximum(diag, up)
            mv = jnp.where(take_diag, jnp.int32(0), jnp.int32(1))
            # left closure seeded by the free j=0 column (value 0)
            cm = _prefix_max_lanes(e - jg, Q)
            closed = jnp.maximum(cm, 0) + jg
            left = closed > e
            cur = jnp.where(left, closed, e)
            mv = jnp.where(left, jnp.int32(2), mv)

            # pack this row's move codes 8-per-word, transposed so the
            # scratch lane axis is the FRAGMENT (static in the walk):
            # word_T[p, l] = sum_q packmat[q, p] * mv[l, q]
            packed_ref[r] = jax.lax.dot_general(
                packmat,
                mv.astype(jnp.float32),
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            act = r < tlens  # [FB, 1]
            endv = jnp.max(
                jnp.where(q_onehot & act, cur, jnp.int32(NEG)),
                axis=1,
                keepdims=True,
            )
            better = endv > best_val  # argmax keeps the first max row
            best_val = jnp.where(better, endv, best_val)
            best_r = jnp.where(better, jnp.int32(r), best_r)
            return cur, best_val, best_r

        _, best_val, best_r = jax.lax.fori_loop(
            0,
            T,
            row_body,
            (
                row0,
                jnp.full((FB, 1), NEG, jnp.int32),
                jnp.zeros((FB, 1), jnp.int32),
            ),
        )

        # zero the SMEM output accumulators (scalar stores; ~10k cycles)
        def zero_col(i, _):
            col_smem[i // T, i % T] = 0
            return 0

        jax.lax.fori_loop(0, FB * T, zero_col, 0)

        def zero_ins(i, _):
            ins_smem[i // TP, i % TP] = 0
            return 0

        jax.lax.fori_loop(0, FB * TP, zero_ins, 0)

        # traceback per fragment on the scalar core, vote primitives
        # accumulated in SMEM: col entry = 1 | sym<<1 | weight<<4,
        # ins entry = 1 | base<<1 | weight<<3 (each (l, row) written at
        # most once per walk — paths visit each consensus row once and
        # insertion runs start at distinct rows)
        for l in range(FB):
            q_len = qlens_ref[l, 0]
            row0_score = q_len * GAP
            bv = best_val[l, 0]
            t0 = jnp.where(
                row0_score >= bv, 0, best_r[l, 0] + 1
            ).astype(jnp.int32)

            def walk(step, carry, l=l):
                t, j, prev_mv = carry
                active = j > 0
                tm1 = jnp.maximum(t - 1, 0)
                jm1 = jnp.maximum(j - 1, 0)
                word = packed_ref[tm1, jm1 // PACK, l].astype(jnp.int32)
                loaded = (word >> (2 * (jm1 % PACK))) & 3
                mv = jnp.where(t == 0, jnp.int32(2), loaded)
                mv = jnp.where(active, mv, jnp.int32(3))
                # frags/wts live in VMEM (vector forward); the walk's
                # dynamic-lane scalar loads come from the SMEM copy
                pk = fw_smem_ref[l, jm1]
                fb = pk & 3
                fw = pk >> 2
                is_diag = mv == 0
                is_up = mv == 1
                is_ins = (mv == 2) & (prev_mv != 2)

                @pl.when(is_diag | is_up)
                def _():
                    sym = jnp.where(is_diag, fb, jnp.int32(4))
                    col_smem[l, tm1] = 1 | (sym << 1) | (fw << 4)

                @pl.when(is_ins)
                def _():
                    ins_smem[l, t] = 1 | (fb << 1) | (fw << 3)

                dt = jnp.where((mv == 0) | (mv == 1), 1, 0)
                dj = jnp.where((mv == 0) | (mv == 2), 1, 0)
                return t - dt, j - dj, mv

            jax.lax.fori_loop(
                0,
                T + Q,
                walk,
                (t0, q_len.astype(jnp.int32), jnp.int32(3)),
            )


    @functools.partial(
        jax.jit, static_argnames=("T", "Q", "interpret")
    )
    def pallas_votes_primitives(
        cw, tlens, frags, qlens, wts, T: int, Q: int, interpret: bool
    ):
        """Run the fused block kernel over all fragments.

        cw [B, T] int32 per-fragment window consensus (pad < 0),
        frags/wts [B, Q] int32, tlens/qlens [B] int32.
        Returns (col_sym [B, T], col_w [B, T], ins_b [B, TP], ins_w
        [B, TP]) with TP = T + 1 rounded up to a lane multiple.
        """
        B = cw.shape[0]
        assert B % FB == 0
        PW = -(-(Q // PACK) // 128) * 128
        TP = -(-(T + 1) // 128) * 128
        # pack matrix: column j contributes 4^(j%PACK) to word j//PACK
        pm = np.zeros((Q, PW), np.float32)
        j = np.arange(Q)
        pm[j, j // PACK] = (4.0 ** (j % PACK)).astype(np.float32)

        grid = (B // FB,)
        kernel = functools.partial(
            _consensus_block_kernel, T=T, Q=Q, PW=PW, TP=TP
        )
        out_shapes = [
            jax.ShapeDtypeStruct((B, T), jnp.int32),
            jax.ShapeDtypeStruct((B, TP), jnp.int32),
        ]
        blk = lambda w: pl.BlockSpec((FB, w), lambda i: (i, 0))
        sblk = lambda w: pl.BlockSpec(
            (FB, w), lambda i: (i, 0), memory_space=pltpu.SMEM
        )
        col_pack, ins_pack = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                blk(T),
                blk(1),
                blk(Q),
                blk(1),
                blk(Q),
                pl.BlockSpec((Q, PW), lambda i: (0, 0)),
                sblk(Q),
            ],
            out_specs=[sblk(T), sblk(TP)],
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((T, PW, FB), jnp.float32),
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(
            cw.astype(jnp.int32),
            tlens.astype(jnp.int32).reshape(B, 1),
            frags.astype(jnp.int32),
            qlens.astype(jnp.int32).reshape(B, 1),
            wts.astype(jnp.int32),
            jnp.asarray(pm),
            jnp.clip(frags.astype(jnp.int32), 0, 3)
            | (wts.astype(jnp.int32) << 2),
        )
        col_has = (col_pack & 1) != 0
        col_sym = jnp.where(col_has, (col_pack >> 1) & 7, jnp.int32(5))
        col_w = jnp.where(col_has, col_pack >> 4, 0)
        ins_has = (ins_pack & 1) != 0
        ins_b = jnp.where(ins_has, (ins_pack >> 1) & 3, jnp.int32(-1))
        ins_w = jnp.where(ins_has, ins_pack >> 3, 0)
        return col_sym, col_w, ins_b, ins_w

    @functools.partial(jax.jit, static_argnames=("T", "NWIN"))
    def votes_from_primitives(
        col_sym, col_w, ins_b, ins_w, win_idx, cons_runs, T: int,
        NWIN: int,
    ):
        """Aggregate per-fragment primitives into the per-window vote
        tables — bit-identical to fused_votes_kernel's outputs."""
        B = col_sym.shape[0]
        w = win_idx.astype(jnp.int32)
        t_idx = jnp.arange(T, dtype=jnp.int32)
        valid = col_sym < 5
        col = jnp.clip(col_sym, 0, 4)
        base_idx = (w[:, None] * T + t_idx[None, :]) * 5 + col
        base_votes = (
            jnp.zeros(NWIN * T * 5, jnp.int32)
            .at[jnp.where(valid, base_idx, 0).reshape(-1)]
            .add(jnp.where(valid, col_w, 0).reshape(-1))
            .reshape(NWIN, T, 5)
        )
        cover = (
            jnp.zeros(NWIN * T, jnp.int32)
            .at[
                jnp.where(
                    valid, w[:, None] * T + t_idx[None, :], 0
                ).reshape(-1)
            ]
            .add(jnp.where(valid, 1, 0).reshape(-1))
            .reshape(NWIN, T)
        )
        TP = ins_b.shape[1]
        tj = jnp.arange(TP, dtype=jnp.int32)
        imask = (ins_b >= 0) & (tj[None, :] <= T)
        fb = jnp.clip(ins_b, 0, 3)
        junction = cons_runs[
            w[:, None], jnp.minimum(tj, T)[None, :], fb
        ]
        ins_idx = (w[:, None] * (T + 1) + junction) * 4 + fb
        ins_votes = (
            jnp.zeros(NWIN * (T + 1) * 4, jnp.int32)
            .at[jnp.where(imask, ins_idx, 0).reshape(-1)]
            .add(jnp.where(imask, ins_w, 0).reshape(-1))
            .reshape(NWIN, T + 1, 4)
        )
        return base_votes, ins_votes, cover

    @functools.partial(
        jax.jit,
        static_argnames=("T", "Q", "NWIN", "interpret"),
    )
    def fused_votes_pallas(
        cons_arr,
        cons_lens,
        cons_runs,
        frags,
        q_lens,
        wts,
        win_idx,
        T: int,
        Q: int,
        NWIN: int,
        interpret: bool = False,
    ):
        """Drop-in replacement for fused_votes_kernel (band=0) backed by
        the Pallas block kernel."""
        cw = cons_arr[win_idx]
        cwl = cons_lens[win_idx]
        col_sym, col_w, ins_b, ins_w = pallas_votes_primitives(
            cw, cwl, frags, q_lens, wts, T, Q, interpret
        )
        return votes_from_primitives(
            col_sym, col_w, ins_b, ins_w, win_idx, cons_runs, T, NWIN
        )
