"""Device anchor chaining: minimizer matches -> overlap coordinates on TPU.

The last host-side stage of the device overlap path (reference equivalent:
the chaining inside ram's Map, used from construct.cc:57-113) moves on
device: with it, the production join transfers only the overlap result
columns (~megabytes) instead of every minimizer match (hundreds of
megabytes whose d2h transfer + host chaining dominated the stage wall
time through the remote tunnel).

Semantics are exactly raven_tpu/overlap/chain.py (the ram replacement):

  * matches are grouped by (query, target, relative strand) and banded by
    diagonal (consecutive sorted diagonals differ by <= DIAGONAL_BAND);
  * each group with >= MIN_MATCHES anchors is chained by one longest
    strictly monotonic subsequence over target positions after sorting by
    (query, target) position — the backtrack ties match the host patience
    algorithm's exactly (prev = top of the previous pile at insert time);
  * chains split where consecutive anchors jump more than MAX_GAP on
    either sequence; sub-chains shorter than MIN_MATCHES anchors or
    MIN_SPAN bases are dropped.

The TPU formulation is sort-based and fixed-shape: one global sort forms
the groups, group descriptors are bucket-sorted by size (8..512), and
each bucket runs a batched patience scan over [n_groups, G] matrices —
the same pow2 shape-bucket + sentinel-compaction-sort toolkit as the
device join.  Groups larger than the top bucket make the caller fall
back to host chaining (unseen below repeat-heavy metagenome scales).

Output overlaps are sorted by (group rank, piece) which reproduces the
host emission order exactly, so per-read overlap arrays are identical to
chain.py's (oracle-tested in tests/test_chain_device.py).
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

from raven_tpu.overlap.types import OVERLAP_DTYPE


def _chprof(label, t0):
    from raven_tpu.overlap.device_index import _PROF, _prof

    if _PROF:
        return _prof(label, t0)
    return t0

DIAGONAL_BAND = 500
MIN_MATCHES = 4
MAX_GAP = 10000
MIN_SPAN = 100

BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)
I32_INF = 2**31 - 1  # sentinel (also the padded-row query id)


def _pow2_at_least(n: int, lo: int, hi: int) -> int:
    c = lo
    while c < n and c < hi:
        c <<= 1
    return c


if HAS_JAX:

    def _blocked_cummax(x):
        """Inclusive cummax via row scans + row carry (the blocked pattern
        from device_index; avoids giant single-axis scans)."""
        (n,) = x.shape
        c = min(n, 1 << 13)
        if n % c != 0:
            c = n
        r = n // c
        xb = x.reshape(r, c)
        row = jax.lax.cummax(xb, axis=1)
        carry = jax.lax.cummax(row[:, -1])
        carry = jnp.concatenate(
            [jnp.full((1,), jnp.iinfo(x.dtype).min, x.dtype), carry[:-1]]
        )
        return jnp.maximum(row, carry[:, None]).reshape(-1)

    def _blocked_cummin_rev(x):
        (n,) = x.shape
        c = min(n, 1 << 13)
        if n % c != 0:
            c = n
        r = n // c
        xb = x.reshape(r, c)
        row = jax.lax.cummin(xb, axis=1, reverse=True)
        carry = jax.lax.cummin(row[:, 0], reverse=True)
        carry = jnp.concatenate(
            [carry[1:], jnp.full((1,), jnp.iinfo(x.dtype).max, x.dtype)]
        )
        return jnp.minimum(row, carry[:, None]).reshape(-1)

    def _prepare_core(q_id, q_pos, t_id, t_pos, same, n_buckets):
        """Stage A: group formation + descriptors.

        Flat match columns in ([Np] int32; padded rows carry q_id < 0).
        Returns device-resident intermediates for _chain_lis (sorted
        anchor columns; size-bucket-sorted group descriptors) plus the
        small host-synced arrays: per-bucket group counts and the max
        group size (> top bucket -> host fallback).
        """
        diag = jnp.where(same != 0, t_pos - q_pos, t_pos + q_pos)
        s_d = (
            (same.astype(jnp.uint32) << 31)
            | (diag + (1 << 30)).astype(jnp.uint32)
        )
        qk = jnp.where(q_id < 0, jnp.int32(I32_INF), q_id)
        # one global sort = every read's (tid, strand, diagonal) order;
        # t_pos is NOT carried — it is a function of (same, diag, q_pos)
        # and rebuilt below, one fewer operand in the dominant sort
        qs, ts, sds, qp = jax.lax.sort(
            (qk, t_id, s_d, q_pos), num_keys=3
        )
        n = qs.shape[0]
        valid = qs != I32_INF
        diag_s = (sds & jnp.uint32((1 << 31) - 1)).astype(jnp.int32) - (
            1 << 30
        )
        same_s = (sds >> 31).astype(jnp.int32)
        tp = jnp.where(same_s != 0, diag_s + qp, diag_s - qp)
        newg = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                (qs[1:] != qs[:-1])
                | (ts[1:] != ts[:-1])
                | (same_s[1:] != same_s[:-1])
                | (diag_s[1:] - diag_s[:-1] > DIAGONAL_BAND),
            ]
        )
        idx = jnp.arange(n, dtype=jnp.int32)
        gstart = _blocked_cummax(jnp.where(newg, idx, jnp.int32(-1)))
        gend = _blocked_cummin_rev(
            jnp.concatenate(
                [
                    jnp.where(newg[1:], idx[1:], jnp.int32(n)),
                    jnp.full((1,), n, jnp.int32),
                ]
            )
        )
        gsize = gend - gstart

        is_desc = newg & valid & (gsize >= MIN_MATCHES)
        max_size = jnp.where(newg & valid, gsize, 0).max()
        size_d = jnp.where(is_desc, gsize, jnp.int32(I32_INF))
        bidx = jnp.zeros(n, jnp.int32)
        for b_i in range(1, n_buckets):
            bidx = jnp.where(size_d > BUCKETS[b_i - 1], b_i, bidx)
        # groups beyond the top bucket go to the oversize pseudo-bucket
        # (index n_buckets) and are chained per-group on the host; the
        # rest of the batch stays on device
        bidx = jnp.where(
            (size_d > BUCKETS[n_buckets - 1]) & (size_d != I32_INF),
            jnp.int32(n_buckets),
            bidx,
        )
        bkey = jnp.where(is_desc, bidx, jnp.int32(I32_INF))
        # group order key = gstart (strictly increasing in the global
        # (read, tid, strand, diagonal) order), so the final
        # (gid, piece) sort reproduces host emission order without a
        # separate rank column — one fewer operand in this sort
        bkey_s, dstart, dsize = jax.lax.sort(
            (
                bkey,
                jnp.where(is_desc, gstart, jnp.int32(I32_INF)),
                size_d,
            ),
            num_keys=2,
        )
        dgid = dstart
        # counts per bucket + the oversize pseudo-bucket (last entry)
        n_per_bucket = jnp.stack(
            [
                (bkey_s == b_i).sum(dtype=jnp.int32)
                for b_i in range(n_buckets + 1)
            ]
        )
        return (
            (qs, ts, same_s, qp, tp),
            (dstart, dsize, dgid),
            n_per_bucket,
            max_size,
        )

    _chain_prepare = functools.partial(jax.jit, static_argnames=("n_buckets",))(
        _prepare_core
    )

    def _lis_keep(vals, size, G):
        """Patience LIS + backtrack over one bucket's [n_g, G] rows of
        strictly-increasing targets; returns keep mask [n_g, G] matching
        the host patience algorithm's backtrack choices exactly."""
        n_g = vals.shape[0]
        cols = jnp.arange(G, dtype=jnp.int32)
        active_all = cols[None, :] < size[:, None]

        tails0 = jnp.full((n_g, G), jnp.int32(I32_INF))
        tidx0 = jnp.zeros((n_g, G), jnp.int32)

        def step(carry, j):
            tails, tidx = carry
            x = vals[:, j]
            act = active_all[:, j]
            p = (tails < x[:, None]).sum(axis=1, dtype=jnp.int32)
            upd = (cols[None, :] == p[:, None]) & act[:, None]
            tails = jnp.where(upd, x[:, None], tails)
            tidx = jnp.where(upd, j, tidx)
            # prev = top of pile p-1 at insert time (unaffected by the
            # update at pile p)
            prev_one = cols[None, :] == (p - 1)[:, None]
            prev_j = jnp.where(
                (p > 0) & act,
                (jnp.where(prev_one, tidx, 0)).sum(axis=1, dtype=jnp.int32),
                jnp.int32(-1),
            )
            return (tails, tidx), prev_j

        (tails, tidx), prev_cols = jax.lax.scan(
            step, (tails0, tidx0), jnp.arange(G, dtype=jnp.int32)
        )
        prev = jnp.transpose(prev_cols)  # [n_g, G]
        L = (tails < I32_INF).sum(axis=1, dtype=jnp.int32)
        top = (
            jnp.where(cols[None, :] == (L - 1)[:, None], tidx, 0)
        ).sum(axis=1, dtype=jnp.int32)

        def back(carry, _):
            cur, keep = carry
            on = cur >= 0
            hit = (cols[None, :] == cur[:, None]) & on[:, None]
            keep = keep | hit
            # gather prev[cur] via one-hot; +1/-1 keeps -1 intact
            pv = (jnp.where(hit, prev + 1, 0)).sum(
                axis=1, dtype=jnp.int32
            ) - 1
            cur = jnp.where(on, pv, jnp.int32(-1))
            return (cur, keep), None

        start = jnp.where(L > 0, top, jnp.int32(-1))
        (_, keep), _ = jax.lax.scan(
            back,
            (start, jnp.zeros((n_g, G), bool)),
            None,
            length=G,
        )
        return keep

    def _bucket_overlaps(anchors, descs, off, nb, n_g, G, kmer):
        """One size bucket: gather members, LIS, gap-split, emit packed
        piece columns [n_g * P] (P = G // MIN_MATCHES pieces max)."""
        qs, ts, same_s, qp, tp = anchors
        dstart, dsize, dgid = descs
        st = jax.lax.dynamic_slice_in_dim(dstart, off, n_g)
        sz = jax.lax.dynamic_slice_in_dim(dsize, off, n_g)
        gi = jax.lax.dynamic_slice_in_dim(dgid, off, n_g)
        rows = jnp.arange(n_g, dtype=jnp.int32)
        # rows beyond this bucket's true count alias the next bucket's
        # descriptors (or padding): mask them out entirely
        pad_g = (rows >= nb) | (sz == I32_INF)
        sz = jnp.where(pad_g, 0, sz)
        st_c = jnp.where(pad_g, 0, st)

        cols = jnp.arange(G, dtype=jnp.int32)
        mem = jnp.clip(st_c[:, None] + cols[None, :], 0, qs.shape[0] - 1)
        q = qp[mem]
        t = tp[mem]
        head = jnp.clip(st_c, 0, qs.shape[0] - 1)
        qid_g = qs[head]
        tid_g = ts[head]
        same_g = same_s[head]

        # LIS needs (q, t) order; the global sort gave diagonal order
        in_row = cols[None, :] < sz[:, None]
        qk = jnp.where(in_row, q, jnp.int32(I32_INF))
        tk = jnp.where(in_row, t, jnp.int32(I32_INF))
        q, t = jax.lax.sort((qk, tk), dimension=1, num_keys=2)

        vals = jnp.where(same_g[:, None] != 0, t, -t)
        keep = _lis_keep(vals, sz, G)

        # compact kept anchors left, preserving index order
        ck = jnp.where(keep, cols[None, :], G + cols[None, :])
        _, qc, tc = jax.lax.sort((ck, q, t), dimension=1, num_keys=1)
        L = keep.sum(axis=1, dtype=jnp.int32)
        jpos = jnp.broadcast_to(cols[None, :], qc.shape)
        in_chain = jpos < L[:, None]

        dq = jnp.abs(qc[:, 1:] - qc[:, :-1])
        dt = jnp.abs(tc[:, 1:] - tc[:, :-1])
        cut = jnp.concatenate(
            [
                jnp.zeros((n_g, 1), bool),
                jnp.maximum(dq, dt) > MAX_GAP,
            ],
            axis=1,
        )
        newp = (jpos == 0) | cut
        piece = jnp.cumsum(newp.astype(jnp.int32), axis=1) - 1
        ps = jax.lax.cummax(
            jnp.where(newp, jpos, jnp.int32(-1)), axis=1
        )
        cnt = jpos - ps + 1
        q_first = jnp.take_along_axis(qc, jnp.clip(ps, 0, G - 1), axis=1)

        def seg_op(a, b):
            af, amin, amax = a
            bf, bmin, bmax = b
            return (
                af | bf,
                jnp.where(bf, bmin, jnp.minimum(amin, bmin)),
                jnp.where(bf, bmax, jnp.maximum(amax, bmax)),
            )

        _, t_min, t_max = jax.lax.associative_scan(
            seg_op, (newp, tc, tc), axis=1
        )

        nxt_cut = jnp.concatenate(
            [cut[:, 1:], jnp.ones((n_g, 1), bool)], axis=1
        )
        is_end = in_chain & (nxt_cut | (jpos == L[:, None] - 1))
        lhs_b = q_first
        lhs_e = qc + kmer
        rhs_b = t_min
        rhs_e = t_max + kmer
        emit = (
            is_end
            & (cnt >= MIN_MATCHES)
            & (lhs_e - lhs_b >= MIN_SPAN)
            & (rhs_e - rhs_b >= MIN_SPAN)
            & ~pad_g[:, None]
        )

        # pack emitted pieces to the row head; a piece has >= MIN_MATCHES
        # anchors, so P = G // MIN_MATCHES can never overflow
        P = max(1, G // MIN_MATCHES)
        ek = jnp.where(emit, piece, jnp.int32(I32_INF))
        egid = jnp.where(emit, gi[:, None], jnp.int32(I32_INF))
        ek_s, egid_s, lb_s, le_s, rb_s, re_s, cnt_s = jax.lax.sort(
            (ek, egid, lhs_b, lhs_e, rhs_b, rhs_e, cnt),
            dimension=1,
            num_keys=1,
        )

        def sl(a):
            return a[:, :P].reshape(-1)

        rep = lambda v: jnp.broadcast_to(v[:, None], (n_g, P)).reshape(-1)
        # pack (cnt, same) into one int32 lane (cnt <= G < 2^30): one
        # fewer sort operand here and one fewer d2h column downstream
        return (
            sl(egid_s),
            sl(ek_s),
            rep(qid_g),
            rep(tid_g),
            sl(lb_s),
            sl(le_s),
            sl(rb_s),
            sl(re_s),
            sl(cnt_s) | (rep(same_g) << 30),
        )

    @functools.partial(
        jax.jit, static_argnames=("bucket_ns", "kmer", "with_gid", "narrow")
    )
    def _chain_lis(anchors, descs, offs, nbs, bucket_ns, kmer,
                   with_gid=True, narrow=False):
        """Stage B (one dispatch): every non-empty size bucket's LIS +
        emission, then the global (gid, piece) sort that reproduces host
        emission order.  bucket_ns: static per-bucket padded group counts
        (0 = bucket empty).  Returns stacked overlap columns [8|7|4, cap]
        (gid-sorted, sentinel-keyed tail) + the valid count.

        with_gid=False drops the gid column from the output (the d2h
        transfer is the chain stage's top cost through the remote
        tunnel); callers that merge host-chained oversize groups by gid
        must keep it.

        narrow=True (caller guarantees ids and positions+k < 2^16) packs
        the six id/coordinate columns pairwise into three int32 lanes —
        the d2h bytes drop ~43% on a ~20 MB/s tunnel."""
        # bucket slices may reach past the descriptor array on small
        # inputs (pow2 row padding): extend with sentinel descriptors
        pad = max(bucket_ns)
        descs = tuple(
            jnp.concatenate([a, jnp.full((pad,), jnp.int32(I32_INF))])
            for a in descs
        )
        parts = []
        for b_i, n_g in enumerate(bucket_ns):
            if n_g == 0:
                continue
            parts.append(
                _bucket_overlaps(
                    anchors, descs, offs[b_i], nbs[b_i], n_g,
                    BUCKETS[b_i], kmer,
                )
            )
        cat = [
            jnp.concatenate([p[c] for p in parts]) for c in range(9)
        ]
        srt = jax.lax.sort(tuple(cat), num_keys=2)
        count = (srt[0] != I32_INF).sum(dtype=jnp.int32)
        # [gid,] qid, tid, lhs_b, lhs_e, rhs_b, rhs_e, cnt|same<<30 (gid
        # kept when host-chained oversize groups must merge in emission
        # order)
        lead = (srt[0],) if with_gid else ()
        if narrow:
            pk = lambda hi, lo: (hi << 16) | (lo & jnp.int32(0xFFFF))
            return (
                jnp.stack(
                    lead
                    + (
                        pk(srt[2], srt[3]),
                        pk(srt[4], srt[5]),
                        pk(srt[6], srt[7]),
                        srt[8],
                    )
                ),
                count,
            )
        return jnp.stack(lead + srt[2:]), count

    @functools.partial(jax.jit, static_argnames=("take",))
    def _slice_cols(stacked, take):
        return jax.lax.slice_in_dim(stacked, 0, take, axis=1)


def chain_oversize_groups_host(
    anchors, descs, off_over: int, n_over: int, k, base: int = 0
):
    """Host-chain the oversize pseudo-bucket's groups (> top LIS bucket):
    gather just those groups' anchor spans to the host and run the host
    chain oracle per group.  Returns (overlap rows [OVERLAP_DTYPE], gid
    per row) — merged into the device emission stream by gid.  `base`
    shifts descriptor-local anchor starts into the global anchor arrays
    (the sharded path's per-shard offsets)."""
    from raven_tpu.overlap.chain import chain_matches

    qs, ts, same_s, qp, tp = anchors
    dstart, dsize, dgid = descs
    st = np.asarray(
        jax.lax.dynamic_slice_in_dim(dstart, off_over, n_over)
    )
    sz = np.asarray(
        jax.lax.dynamic_slice_in_dim(dsize, off_over, n_over)
    )
    gi = np.asarray(
        jax.lax.dynamic_slice_in_dim(dgid, off_over, n_over)
    )
    if n_over > 16:
        # many oversize groups: one bulk transfer beats per-group
        # device-slice round trips (each costs a tunnel dispatch)
        qs, ts, same_s, qp, tp = (
            np.asarray(a) for a in (qs, ts, same_s, qp, tp)
        )
    rows: list[np.ndarray] = []
    gids: list[np.ndarray] = []
    for s, z, g in zip(st.tolist(), sz.tolist(), gi.tolist()):
        if z <= 0 or z == I32_INF:
            continue
        s += base
        sl = slice(s, s + z)
        qid_g = int(np.asarray(qs[s]))
        ovl = chain_matches(
            qid_g,
            np.asarray(ts[sl]).astype(np.uint32),
            np.asarray(same_s[sl]).astype(np.uint8),
            np.asarray(qp[sl]).astype(np.int64),
            np.asarray(tp[sl]).astype(np.int64),
            int(k),
        )
        if ovl.size:
            rows.append(ovl)
            gids.append(np.full(ovl.size, g, dtype=np.int64))
    if not rows:
        return (
            np.zeros(0, dtype=OVERLAP_DTYPE),
            np.zeros(0, dtype=np.int64),
        )
    return np.concatenate(rows), np.concatenate(gids)


def _assemble_overlaps(cols, count, host_rows=None, host_gids=None):
    """Build the {read_id: overlaps} dict from device chain columns
    (emission-ordered; gid-led 8-col or gid-less 7-col wide layout, or
    the `narrow` 5/4-col layout with id/coordinate pairs packed into
    int32 lanes; cnt and same packed in one lane), merging host-chained
    oversize groups at their gid rank."""
    if len(cols) in (4, 5):
        gid = cols[0] if len(cols) == 5 else None
        p_it, p_le, p_re, cs = cols[-4:]

        def unpk(x):
            u = np.asarray(x).astype(np.int32).view(np.uint32)
            return (u >> 16).astype(np.int64), (u & 0xFFFF).astype(np.int64)

        qid, tid = unpk(p_it)
        lhs_b, lhs_e = unpk(p_le)
        rhs_b, rhs_e = unpk(p_re)
    elif len(cols) == 8:
        gid, qid, tid, lhs_b, lhs_e, rhs_b, rhs_e, cs = cols
    else:
        qid, tid, lhs_b, lhs_e, rhs_b, rhs_e, cs = cols
        gid = None
    cs = np.asarray(cs)
    big = np.zeros(count, dtype=OVERLAP_DTYPE)
    big["lhs_id"] = qid
    big["lhs_begin"] = lhs_b
    big["lhs_end"] = lhs_e
    big["rhs_id"] = tid
    big["rhs_begin"] = rhs_b
    big["rhs_end"] = rhs_e
    big["score"] = cs & ((1 << 30) - 1)
    big["strand"] = (cs >> 30) & 1
    if host_rows is not None and host_rows.size:
        gid = gid.astype(np.int64)
        big = np.concatenate([big, host_rows])
        gid = np.concatenate([gid, host_gids])
        order = np.argsort(gid, kind="stable")
        big = big[order]
    out: dict[int, np.ndarray] = {}
    uniq, starts = np.unique(big["lhs_id"], return_index=True)
    for u, piece in zip(uniq, np.split(big, starts[1:])):
        out[int(u)] = piece
    return out


def chain_from_prepared(prepared, k, narrow=False):
    """Finish chaining from _chain_prepare/_prepare_core outputs: size
    bucketing, the LIS dispatch, host assembly of the per-read overlap
    dict.  Groups beyond the top size bucket are chained per-group on the
    host and merged back in emission order — the rest of the batch stays
    on device.  narrow=True: ids and positions+k fit 2^16 (caller
    checked), pack the d2h columns pairwise."""
    anchors, descs, n_per_bucket, max_size = prepared
    n_per_bucket = np.asarray(n_per_bucket)
    n_over = int(n_per_bucket[len(BUCKETS)])

    offs = np.zeros(len(BUCKETS), dtype=np.int32)
    np.cumsum(n_per_bucket[: len(BUCKETS) - 1], out=offs[1:])
    bucket_ns = tuple(
        0 if int(nb) == 0 else _pow2_at_least(int(nb), 256, 1 << 26)
        for nb in n_per_bucket[: len(BUCKETS)]
    )
    host_rows = host_gids = None
    if n_over:
        off_over = int(n_per_bucket[: len(BUCKETS)].sum())
        host_rows, host_gids = chain_oversize_groups_host(
            anchors, descs, off_over, n_over, k
        )
    if not any(bucket_ns):
        if host_rows is None or not host_rows.size:
            return {}
        empty = (np.zeros(0, np.int64),) * 8
        return _assemble_overlaps(empty, 0, host_rows, host_gids)

    import time as _time

    # gid is only consumed by the host-merge of oversize groups; without
    # them, skip its d2h column entirely
    with_gid = bool(host_rows is not None and host_rows.size)
    t0 = _time.perf_counter()
    stacked, count = _chain_lis(
        anchors,
        descs,
        jnp.asarray(offs),
        jnp.asarray(n_per_bucket[: len(BUCKETS)].astype(np.int32)),
        bucket_ns,
        int(k),
        with_gid=with_gid,
        narrow=bool(narrow),
    )
    count = int(count)
    t0 = _chprof("chain.lis", t0)
    if count == 0 and (host_rows is None or not host_rows.size):
        return {}
    # 64k-granular slice: the pow2 round-up nearly doubled the d2h bytes
    # (each distinct `take` compiles only a trivial slice kernel)
    take = max(
        1,
        min(-(-max(count, 1) // 65536) * 65536, int(stacked.shape[1])),
    )
    cols = np.asarray(_slice_cols(stacked, take))[:, :count]
    t0 = _chprof("chain.cols_d2h", t0)
    out = _assemble_overlaps(cols, count, host_rows, host_gids)
    _chprof("chain.assemble_host", t0)
    return out


def chain_matches_device(q_id, q_pos, t_id, t_pos, same, k):
    """Chain flat device match columns into overlaps on device.

    Inputs are jax int32 arrays (padded rows: q_id < 0).  Returns a dict
    {read_id: structured overlap array} identical to the host
    chain_per_read result, or None when the input needs the host path
    (no jax, or a group exceeds the top size bucket).
    """
    if not HAS_JAX:
        return None
    if int(q_id.shape[0]) == 0:
        return {}
    prepared = _chain_prepare(q_id, q_pos, t_id, t_pos, same, len(BUCKETS))
    return chain_from_prepared(prepared, k)
