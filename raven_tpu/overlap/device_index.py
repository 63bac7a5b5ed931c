"""Device-resident minimizer index + self-join mapping (the TPU production
overlap path).

This is the accelerator implementation of the construct phase's hot loop —
the reference's ram Minimize/Filter/Map fan-out (construct.cc:42-44, 57-113)
— restructured for the TPU's compilation model:

  * the index is built on device: chunked fixed-shape segment sketching
    (ops/sketch.py, bit-exact vs the host sketch), on-device compaction and
    one global key sort; nothing but tiny scalar counts crosses the PCIe/
    tunnel boundary during the build;
  * minhash ("micromizer") membership flags are computed on device by a
    (read, hash, pos) sort + segmented rank — the budget-smallest-hashes
    selection of minimizer.py:102-109 without any host loop;
  * the all-vs-all mapping is the self-join distance formulation of
    overlap/selfjoin.py: after the key sort every candidate pair lies within
    a run of equal keys, so the join is `maxd` shifted elementwise compares
    — no per-minimizer searches, no large-array gathers;
  * candidate matches are compacted on device (per-distance sort-based
    compaction into static-capacity buffers, then one flattening sort) and
    transferred back as dense int32 planes; chaining stays on host
    (overlap/chain.py) so the emitted overlap set is byte-identical to the
    host path's.

Every buffer has a static shape chosen from power-of-two buckets so the
persistent compile cache absorbs compilation; every capacity is checked on
device and an overflow makes the caller fall back to the host path rather
than silently dropping data.

Scans over the big arrays use a two-level blocked formulation ([R, C] row
scan + tiny row-carry scan) — single flat scans and 1e8-element gathers are
the two operations that do not survive this TPU's compiler at full index
size.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

_PROF = os.environ.get("RAVEN_TPU_PROFILE") == "1"


def _prof(label: str, t0: float) -> float:
    """Sub-phase wall timer, enabled by RAVEN_TPU_PROFILE=1 (the callers
    block on device results first so the numbers are attributable).
    Returns a fresh t0."""
    t1 = time.perf_counter()
    if _PROF:
        print(
            f"[raven_tpu::prof] {label} {t1 - t0:.3f}s",
            file=sys.stderr,
            flush=True,
        )
    return t1


def _prof_size(label: str, **sizes) -> None:
    if _PROF:
        print(
            "[raven_tpu::prof] size " + label + " "
            + " ".join(f"{k}={v}" for k, v in sizes.items()),
            file=sys.stderr,
            flush=True,
        )

try:
    import jax
    import jax.numpy as jnp

    from raven_tpu.utils.jaxcfg import ensure_jax_cache

    ensure_jax_cache()
    HAS_JAX = True
except Exception:  # pragma: no cover
    HAS_JAX = False

from raven_tpu.ops.sketch import (
    UINT32_INF,
    segment_reads_packed,
    sketch_segments_kernel,
)

SEG_WIDTH = 2048
# Static distance-unroll cap; occurrence > MAX_D + 1 -> host fallback.
# 40 covers the synthetic ladder's occurrence values (ecoli@50x filters
# to occ=35; the old cap of 32 silently host-joined that whole
# construct) while keeping SAFE_JOIN_ENTRIES (~104.7M) above the
# worst-case usable fraction (~40%) of the largest single-sort index
# (2^28 entries) AND of a PART_TARGET partition (201M entries).
# Raising it further shrinks the encodable-table bound below that
# envelope — RAVEN_TPU_MAX_D overrides for exotic coverage profiles.
MAX_D = int(os.environ.get("RAVEN_TPU_MAX_D", "40"))
# Pair codes pack (compacted index, distance) as uint32 gidx*(MAX_D+1)+d.
# The largest encodable table: every code must stay strictly below the
# 0xFFFFFFFF sentinel, so gidx <= (2^32-2-MAX_D)//(MAX_D+1).  Joins over
# more usable entries than this return None (host fallback) — without the
# bound, gidx wraps modulo 2^32 and decodes wrong pairs.
SAFE_JOIN_ENTRIES = (0xFFFFFFFE - MAX_D) // (MAX_D + 1) + 1

# packed position column: pos | strand << 29 | flag << 30  (pos < 2^29)
_STRAND_BIT = 29
_FLAG_BIT = 30
_POS_MASK = (1 << _STRAND_BIT) - 1

_INVALID_RID = np.int32(2**31 - 1)


def _pow2_at_least(n: int, lo: int, hi: int) -> int:
    c = lo
    while c < n and c < hi:
        c <<= 1
    return c


def _quarter_at_least(n: int, lo: int, hi: int) -> int:
    """Smallest m * 2^k >= n with m in {4,5,6,7} (quarter-pow2 steps),
    clamped to [lo, hi]; plain pow2 below 2^16.

    The big sorts dominate the device stage and scale with the PADDED
    size — pow2 rounding wastes up to 50% (e.g. 38.3M index entries pad
    to 2^26 = 67.1M).  Quarter steps cap the waste at 12.5% while
    keeping every size divisible by 2^14 (the blocked-kernel row width)
    above 2^16."""
    if n <= lo or n < (1 << 16):
        return _pow2_at_least(n, lo, hi)
    k = max((n - 1).bit_length() - 3, 14)  # m = n/2^k in (4, 8]
    c = ((n + (1 << k) - 1) >> k) << k
    return max(lo, min(c, hi))


def _split_rc(n: int) -> tuple[int, int]:
    """Factor the pow2 n into [R, C] with R <= C for blocked scans."""
    b = n.bit_length() - 1
    r = 1 << (b // 2)
    return r, n // r


if HAS_JAX:

    def _blocked_cummax(x):
        """Inclusive cummax over a flat pow2-length int32 array via a row
        scan + row-carry scan (avoids one full-length scan)."""
        (n,) = x.shape
        R, C = _split_rc(n)
        xb = x.reshape(R, C)
        row = jax.lax.cummax(xb, axis=1)
        carry = jax.lax.cummax(row[:, -1])
        carry = jnp.concatenate(
            [jnp.full((1,), jnp.iinfo(x.dtype).min, x.dtype), carry[:-1]]
        )
        return jnp.maximum(row, carry[:, None]).reshape(-1)

    def _blocked_cummin_rev(x):
        """Inclusive reverse cummin (same blocked structure)."""
        (n,) = x.shape
        R, C = _split_rc(n)
        xb = x.reshape(R, C)
        row = jax.lax.cummin(xb, axis=1, reverse=True)
        carry = jax.lax.cummin(row[:, 0], reverse=True)
        carry = jnp.concatenate(
            [carry[1:], jnp.full((1,), jnp.iinfo(x.dtype).max, x.dtype)]
        )
        return jnp.minimum(row, carry[:, None]).reshape(-1)

    @functools.partial(
        jax.jit,
        static_argnames=(
            "k", "w", "use_pallas", "cap", "with_flags", "narrow_sort",
            "cap_row",
        ),
    )
    def _chunk_sketch_compact(
        codes, eff, rids, base, clo, chi, budget_tbl, k, w, use_pallas,
        cap, with_flags, narrow_sort=False, cap_row=SEG_WIDTH,
    ):
        """Sketch ALL segment chunks in one dispatch (lax.scan over the
        leading chunk axis — the per-chunk dispatches each paid a ~0.3 s
        tunnel round trip) and compact each chunk's entries to `cap` by a
        local sort; returns (key, rid, packed_pos) [n_chunks * cap]
        (chunk-concatenated) + the true per-chunk valid counts [n_chunks]
        (count > cap means the capacity clipped real entries).

        codes arrive 2-bit packed (4 bases/byte, [.., width/4] uint8) and
        unpack on device — the h2d transfer of the base codes was the
        build's largest cost through the tunnel.

        with_flags=True computes the minhash-subset flag IN-CHUNK: the
        segment packer aligns reads to chunk boundaries (CHUNK_ALIGN),
        so sorting the chunk by (rid, key, pos<<1|strand) yields every
        read's complete entry list in (hash, pos)-ascending order — the
        read's budget-smallest entries (minimizer.py:102-109, ties by
        position exactly like the host argsort) are flagged without the
        full-index (rid, key, pos) sort that used to dominate finalize.
        The chunk sort gains two tiebreak keys but no extra operand."""

        def one_chunk(_, ch):
            cp, ef, ri, ba, cl, ch_hi = ch
            u = cp.astype(jnp.int32)
            co = jnp.stack(
                [(u >> (2 * b)) & 3 for b in range(4)], axis=2
            ).reshape(u.shape[0], u.shape[1] * 4)
            key, ids, pos, sb = sketch_segments_kernel(
                co, ef, ri, ba, cl, ch_hi, k, w, use_pallas=use_pallas
            )
            valid = key != UINT32_INF
            count = valid.sum(dtype=jnp.int32)
            rid = jnp.where(valid, ids, _INVALID_RID)
            if not with_flags:
                packed = jnp.where(
                    valid, pos | (sb << _STRAND_BIT), 0
                ).astype(jnp.int32)
                key_s, rid_s, packed_s = jax.lax.sort(
                    (key, rid, packed), num_keys=1
                )
                return None, (
                    key_s[:cap], rid_s[:cap], packed_s[:cap], count
                )
            pos1 = jnp.where(valid, (pos << 1) | sb, 0).astype(jnp.int32)
            # row pre-compaction: every segment row belongs to ONE read
            # with ascending positions, so a shallow row sort by
            # (key, pos1) moves its valid entries to a dense prefix and
            # the expensive full-depth chunk sort runs on half the
            # slots.  cap_row bounds one row's minimizer count
            # (winnowing density ~0.33; overflow forces the ladder's
            # next rung where cap_row == SEG_WIDTH disables compaction).
            if cap_row < SEG_WIDTH:
                key2 = key.reshape(-1, SEG_WIDTH)
                pos1_2 = pos1.reshape(-1, SEG_WIDTH)
                rid_row = rid.reshape(-1, SEG_WIDTH).min(axis=1)
                key_rs, pos1_rs = jax.lax.sort(
                    (key2, pos1_2), dimension=1, num_keys=2
                )
                rowcnt = (key_rs != UINT32_INF).sum(
                    axis=1, dtype=jnp.int32
                )
                row_over = (rowcnt > cap_row).any()
                colr = jnp.arange(cap_row, dtype=jnp.int32)
                key = key_rs[:, :cap_row].reshape(-1)
                pos1 = pos1_rs[:, :cap_row].reshape(-1)
                rid = jnp.where(
                    colr[None, :] < rowcnt[:, None],
                    rid_row[:, None],
                    _INVALID_RID,
                ).reshape(-1)
                # a clipped row must fail the chunk-capacity check so
                # the caller's ladder retries at the uncompacted rung
                count = jnp.where(
                    row_over, jnp.int32(cap + 1), count
                )
            if narrow_sort:
                # pack the 3 lexicographic sort keys into 2 u32 lanes —
                # 1/3 less sort traffic, and this full-chunk sort is the
                # build's hot kernel.  Layout: A = rid(16) | key>>14(16),
                # B = key&0x3FFF(14) | pos1(18).  Caller guarantees
                # rid < 0xFFFF, pos1 < 2^18; hashes are < 2^30 always.
                # Invalid entries pack to A == 0xFFFFFFFF (sort last).
                rid_p = jnp.where(
                    rid == _INVALID_RID, jnp.uint32(0xFFFF),
                    rid.astype(jnp.uint32),
                )
                key_c = jnp.minimum(key, jnp.uint32((1 << 30) - 1))
                a = (rid_p << 16) | (key_c >> 14)
                b = ((key_c & jnp.uint32(0x3FFF)) << 18) | pos1.astype(
                    jnp.uint32
                )
                a_s, b_s = jax.lax.sort((a, b), num_keys=2)
                rid16 = (a_s >> 16).astype(jnp.int32)
                inval = rid16 == 0xFFFF
                rid_s = jnp.where(inval, _INVALID_RID, rid16)
                key_s = jnp.where(
                    inval,
                    UINT32_INF,
                    ((a_s & jnp.uint32(0xFFFF)) << 14)
                    | (b_s >> 18),
                )
                pos1_s = (
                    b_s & jnp.uint32((1 << 18) - 1)
                ).astype(jnp.int32)
            else:
                rid_s, key_s, pos1_s = jax.lax.sort(
                    (rid, key, pos1), num_keys=3
                )
            # valid entries occupy a dense prefix (the sort is rid-major
            # and every invalid entry carries rid == _INVALID_RID, the
            # max id) — so ranks, budgets and flags only need the [cap]
            # slice, ~3x less scan+gather work than the full chunk
            rid_s, key_s, pos1_s = rid_s[:cap], key_s[:cap], pos1_s[:cap]
            idx = jnp.arange(cap, dtype=jnp.int32)
            newread = jnp.concatenate(
                [jnp.ones((1,), bool), rid_s[1:] != rid_s[:-1]]
            )
            start = _blocked_cummax(
                jnp.where(newread, idx, jnp.int32(-1))
            )
            rid_c = jnp.clip(rid_s, 0, budget_tbl.shape[0] - 1)
            flag = (
                (idx - start < budget_tbl[rid_c])
                & (rid_s != _INVALID_RID)
            )
            packed_s = (
                (pos1_s >> 1)
                | ((pos1_s & 1) << _STRAND_BIT)
                | (flag.astype(jnp.int32) << _FLAG_BIT)
            )
            return None, (key_s, rid_s, packed_s, count)

        _, (keys, rids_o, packeds, counts) = jax.lax.scan(
            one_chunk, None, (codes, eff, rids, base, clo, chi)
        )
        return keys.reshape(-1), rids_o.reshape(-1), packeds.reshape(-1), counts

    @functools.partial(
        jax.jit,
        static_argnames=("n_reads", "k", "w", "use_pallas", "cap"),
    )
    def _chunk_sketch_compact_range(
        codes, eff, rids, base, clo, chi, lo, hi, n_reads, k, w,
        use_pallas, cap
    ):
        """_chunk_sketch_compact restricted to hash range [lo, hi): the
        hash-range-partitioned build re-runs the sketch once per partition
        (device FLOPs are cheap; the packed codes upload once and stay
        resident) and compacts only in-range entries, so each partition's
        index fits the single-index envelope.  Also returns per-read
        in-range entry counts [n_reads] (the flags pass needs each read's
        global hash-ascending rank = sum of counts in lower partitions +
        local rank)."""

        def one_chunk(_, ch):
            cp, ef, ri, ba, cl, ch_hi = ch
            u = cp.astype(jnp.int32)
            co = jnp.stack(
                [(u >> (2 * b)) & 3 for b in range(4)], axis=2
            ).reshape(u.shape[0], u.shape[1] * 4)
            key, ids, pos, sb = sketch_segments_kernel(
                co, ef, ri, ba, cl, ch_hi, k, w, use_pallas=use_pallas
            )
            valid = (key != UINT32_INF) & (key >= lo) & (key < hi)
            key = jnp.where(valid, key, UINT32_INF)
            count = valid.sum(dtype=jnp.int32)
            rid = jnp.where(valid, ids, _INVALID_RID)
            packed = jnp.where(valid, pos | (sb << _STRAND_BIT), 0).astype(
                jnp.int32
            )
            rid_flat = jnp.where(valid, ids, 0).reshape(-1)
            per_read = (
                jnp.zeros((n_reads,), jnp.int32)
                .at[jnp.clip(rid_flat, 0, n_reads - 1)]
                .add(jnp.where(valid.reshape(-1), 1, 0))
            )
            key_s, rid_s, packed_s = jax.lax.sort(
                (key.reshape(-1), rid.reshape(-1), packed.reshape(-1)),
                num_keys=1,
            )
            return None, (
                key_s[:cap], rid_s[:cap], packed_s[:cap], count, per_read
            )

        _, (keys, rids_o, packeds, counts, per_read) = jax.lax.scan(
            one_chunk, None, (codes, eff, rids, base, clo, chi)
        )
        return (
            keys.reshape(-1),
            rids_o.reshape(-1),
            packeds.reshape(-1),
            counts,
            per_read.sum(axis=0),
        )

    @jax.jit
    def _flags_kernel(key, rid, packed, budget_tbl, rank_off_tbl):
        """Minhash-subset membership per entry (minimizer.py:102-109).

        Sorts by (rid, key, pos); rank r of an entry among its read's
        entries (hash-ascending, ties by position) is flagged iff
        r < budget[rid] = read_len // k.  Returns the same columns, flag
        folded into bit _FLAG_BIT of packed (arrays stay (rid,key,pos)-
        sorted; the caller re-sorts by key for the index anyway).
        """
        pos = packed & _POS_MASK
        rid_sorted, key_sorted, _, packed_sorted = jax.lax.sort(
            (rid, key, pos, packed), num_keys=3
        )
        n = rid_sorted.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        newread = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                rid_sorted[1:] != rid_sorted[:-1],
            ]
        )
        start = _blocked_cummax(jnp.where(newread, idx, jnp.int32(-1)))
        rid_clamped = jnp.clip(rid_sorted, 0, budget_tbl.shape[0] - 1)
        # rank_off: each read's entry count in LOWER hash partitions
        # (zeros for the single-partition build) — partition ranges are
        # hash-disjoint and ascending, so global hash-ascending rank =
        # offset + local rank
        rank = idx - start + rank_off_tbl[rid_clamped]
        budget = budget_tbl[rid_clamped]
        flag = (rank < budget) & (rid_sorted != _INVALID_RID)
        packed_flagged = jnp.where(
            flag, packed_sorted | (1 << _FLAG_BIT), packed_sorted
        )
        return key_sorted, rid_sorted, packed_flagged

    @functools.partial(jax.jit, static_argnames=("drop_unflagged",))
    def _index_sort(key, rid, packed, drop_unflagged):
        """Global key sort building the final index order.  When
        drop_unflagged (minhash build), entries outside the minhash subset
        are turned into sentinels first (ram Minimize(minhash=true))."""
        if drop_unflagged:
            flag = (packed >> _FLAG_BIT) & 1
            key = jnp.where(flag == 1, key, UINT32_INF)
        key_s, rid_s, packed_s = jax.lax.sort(
            (key, rid, packed), num_keys=1
        )
        n_valid = (key_s != UINT32_INF).sum(dtype=jnp.int32)
        return key_s, rid_s, packed_s, n_valid

    @functools.partial(
        jax.jit, static_argnames=("need_flags", "drop_unflagged")
    )
    def _finalize_index(key, rid, packed, budget_tbl, rank_off_tbl,
                        need_flags, drop_unflagged):
        """Flags + final key sort in one dispatch."""
        if need_flags:
            key, rid, packed = _flags_kernel(
                key, rid, packed, budget_tbl, rank_off_tbl
            )
        return _index_sort(key, rid, packed, drop_unflagged)

    @jax.jit
    def _run_lengths(key):
        """Per-entry run length of equal keys (blocked scans, no gathers)."""
        n = key.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        newrun = jnp.concatenate(
            [jnp.ones((1,), bool), key[1:] != key[:-1]]
        )
        start = _blocked_cummax(jnp.where(newrun, idx, jnp.int32(-1)))
        nxt = _blocked_cummin_rev(
            jnp.concatenate(
                [
                    jnp.where(newrun[1:], idx[1:], jnp.int32(n)),
                    jnp.full((1,), n, jnp.int32),
                ]
            )
        )
        return nxt - start, newrun

    @jax.jit
    def _num_runs_kernel(key, newrun):
        return (newrun & (key != UINT32_INF)).sum(dtype=jnp.int32)

    _RHBINS = 4096  # run-length histogram bins (partitioned Filter)

    @jax.jit
    def _run_hist_kernel(key, counts, newrun):
        """Clipped run-length histogram [RHBINS] — the partitioned
        build's Filter quantile sums these across partitions (runs never
        cross hash-partition boundaries)."""
        isrun = newrun & (key != UINT32_INF)
        return (
            jnp.zeros(_RHBINS, jnp.int32)
            .at[jnp.where(isrun, jnp.clip(counts, 0, _RHBINS - 1), 0)]
            .add(jnp.where(isrun, 1, 0))
            .at[0]
            .set(0)
        )

    @jax.jit
    def _le_count_kernel(key, counts, newrun, t):
        """#distinct runs with length <= t (partitioned exact-quantile
        fallback when the histogram tail clips)."""
        isrun = newrun & (key != UINT32_INF)
        return jnp.where(isrun & (counts <= t), jnp.int32(1), 0).sum()

    @jax.jit
    def _occurrence_search(key, counts, newrun, target):
        """ram Filter semantics on device: occurrence = counts_sorted[i]
        at i = `target` over the distinct-key counts — found by binary
        search over the threshold value (28 masked reductions instead of a
        value sort).  `target` is computed on the host in float64 exactly
        as the host filter does (float32 would round at 1e7+ runs)."""
        isrun = newrun & (key != UINT32_INF)

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) // 2
            le = jnp.where(isrun & (counts <= mid), jnp.int32(1), 0).sum()
            good = le >= target + 1
            return jnp.where(good, lo, mid + 1), jnp.where(good, mid, hi)

        lo, _ = jax.lax.fori_loop(
            0, 28, body, (jnp.int32(1), jnp.int32(1) << 27)
        )
        return lo

    @jax.jit
    def _join_summary(count_parts, overflows):
        """[total matches, any overflow] in one tiny dispatch/fetch."""
        tot = jnp.stack(
            [c.sum(dtype=jnp.int32) for c in count_parts]
        ).sum(dtype=jnp.int32)
        ovf = jnp.stack([o.any() for o in overflows]).any()
        return jnp.stack([tot, ovf.astype(jnp.int32)])

    @jax.jit
    def _entry_inbatch(rid, batch_tbl):
        """Per-entry batch membership (one small-table gather, computed
        once per join call instead of once per distance)."""
        rid_c = jnp.clip(rid, 0, batch_tbl.shape[0] - 1)
        return (batch_tbl[rid_c] != 0) & (rid != _INVALID_RID)

    @jax.jit
    def _usable_count(key, counts, occ):
        """Entries participating in the join: run length in [2, occ]."""
        usable = (key != UINT32_INF) & (counts >= 2) & (counts <= occ)
        return usable.sum(dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=("M",))
    def _compact_usable(key, rid, packed, counts, occ, M):
        """Count-sorted compaction of the join-usable entries.

        60%+ of index entries sit in singleton runs (unique minimizers) and
        a few more in too-frequent runs; none of them can emit a pair.  One
        (count, key) sort moves the usable entries to a dense prefix in
        run-length order, so (a) every per-distance pass runs over the
        small compacted table instead of the full index, and (b) distance d
        only needs the suffix where count > d (a run of length c emits
        pairs only at distances < c).  Runs stay contiguous: all entries of
        a run share (count, key).  Returns the compacted columns [:M], plus
        suffix[d] = #usable entries with count > d for d in [0, MAX_D]
        (suffix[0] = total usable).
        """
        usable = (key != UINT32_INF) & (counts >= 2) & (counts <= occ)
        primary = jnp.where(usable, counts, jnp.int32(2**31 - 1))
        # primary doubles as the counts payload: usable entries carry
        # their exact run length, non-usable the 2^31-1 sentinel, which
        # fails every downstream `counts <= occurrence` test just like
        # the raw too-frequent count would — one less 42M sort operand
        p_s, key_s, rid_s, packed_s = jax.lax.sort(
            (primary, key, rid, packed), num_keys=2
        )
        suffix = jnp.stack(
            [
                (usable & (counts > d)).sum(dtype=jnp.int32)
                for d in range(0, MAX_D + 1)
            ]
        )
        return key_s[:M], rid_s[:M], packed_s[:M], p_s[:M], suffix

    @functools.partial(
        jax.jit, static_argnames=("S", "capd", "need_flags")
    )
    def _join_distances_bucket(
        key, rid, packed, counts, inb, occurrence, ds, starts, S, capd,
        need_flags,
    ):
        """All distance passes sharing one slab-size bucket in a single
        device dispatch (lax.scan over the (d, start) pairs) — the
        per-distance dispatches each cost a ~0.3 s round trip through the
        remote-TPU tunnel, which dominated the join wall time.

        Each pass works on a length-S slab of the count-sorted compacted
        table at traced offset start[i] (the suffix where runs are long
        enough to emit distance-d pairs; see _compact_usable).  Each start
        is chosen on the host so the slab's left edge is either the exact
        count>d run boundary or inside the count<=d region, where no
        distance-d pair can cross it.  Emitted codes carry the GLOBAL
        compacted index (start + local).  Returns (codes [nd*capd],
        counts [nd], overflows [nd])."""

        def one_distance(_, dstart):
            d, start = dstart
            k_s = jax.lax.dynamic_slice_in_dim(key, start, S)
            r_s = jax.lax.dynamic_slice_in_dim(rid, start, S)
            p_s = jax.lax.dynamic_slice_in_dim(packed, start, S)
            c_s = jax.lax.dynamic_slice_in_dim(counts, start, S)
            b_s = jax.lax.dynamic_slice_in_dim(inb, start, S)

            pad = jnp.full((MAX_D,), UINT32_INF, k_s.dtype)
            kp = jnp.concatenate([pad, k_s])
            rp = jnp.concatenate(
                [jnp.full((MAX_D,), _INVALID_RID, r_s.dtype), r_s]
            )
            pp = jnp.concatenate([jnp.zeros((MAX_D,), p_s.dtype), p_s])
            bp = jnp.concatenate([jnp.zeros((MAX_D,), bool), b_s])
            sh = MAX_D - d
            key_j = jax.lax.dynamic_slice_in_dim(kp, sh, S)
            rid_j = jax.lax.dynamic_slice_in_dim(rp, sh, S)
            packed_j = jax.lax.dynamic_slice_in_dim(pp, sh, S)
            inb_j = jax.lax.dynamic_slice_in_dim(bp, sh, S)

            eq = (k_s == key_j) & (k_s != UINT32_INF)
            ok = c_s <= occurrence
            idne = r_s != rid_j
            i_is_q = r_s < rid_j
            inbatch = jnp.where(i_is_q, b_s, inb_j)
            mask = eq & ok & idne & inbatch
            if need_flags:
                q_packed = jnp.where(i_is_q, p_s, packed_j)
                mask &= ((q_packed >> _FLAG_BIT) & 1) == 1
            gidx = start.astype(jnp.uint32) + jnp.arange(
                S, dtype=jnp.uint32
            )
            codes = jnp.where(
                mask,
                gidx * jnp.uint32(MAX_D + 1) + d.astype(jnp.uint32),
                jnp.uint32(0xFFFFFFFF),
            )
            count = mask.sum(dtype=jnp.int32)
            C = min(S, 1 << 14)
            R = S // C
            capr = capd // R
            codes_s = jax.lax.sort(codes.reshape(R, C), dimension=1)
            rowcounts = mask.reshape(R, C).sum(axis=1, dtype=jnp.int32)
            overflow = (rowcounts > capr).any()
            # prefix-compact the kept rows inside the kernel (sequential
            # dynamic updates at cumulative row counts; each row's INF
            # tail is overwritten by the next row) so the downstream
            # flatten needs NO global sort — at shift 2 the padded code
            # stream is ~10x the real pair count (95.3M sorted for 9.7M
            # pairs on the 115 Mbp bench), and that sort dominated
            # join.finish
            rows_kept = codes_s[:, :capr]
            buf0 = jnp.full((capd + capr,), jnp.uint32(0xFFFFFFFF))

            def wr(carry, xs):
                buf, off = carry
                row, cnt = xs
                buf = jax.lax.dynamic_update_slice(buf, row, (off,))
                return (buf, off + jnp.minimum(cnt, capr)), None

            (buf, _), _ = jax.lax.scan(
                wr, (buf0, jnp.int32(0)), (rows_kept, rowcounts)
            )
            return None, (buf[:capd], count, overflow)

        _, (codes, count, overflow) = jax.lax.scan(
            one_distance, None, (ds, starts)
        )
        return codes.reshape(-1), count, overflow

    def _join_flatten_fast(code_parts, count_parts, capj):
        """Dense compaction of the per-distance code buffers WITHOUT a
        global sort: each distance's capd-window arrives prefix-compacted
        (see _join_distances_bucket), so an ascending chain of dynamic
        updates at traced cumulative-count offsets compacts everything —
        each window writes its full extent and the next write overwrites
        the previous INF tail.  Replaces the old sort-based flatten
        (95.3M u32 sorted for 9.7M real pairs at the 115 Mbp bench).
        The output is exactly capj long, INF-padded, so the slab walk
        never hits a dynamic_slice start clamp.  Codes are only blockwise
        ascending (not globally sorted) — group formation and chaining
        are order-invariant: _prepare_core's sort is fully keyed and
        _bucket_overlaps re-sorts members by (q_pos, t_pos)."""
        slack = max(
            int(p.shape[0]) // int(c.shape[0])
            for p, c in zip(code_parts, count_parts)
        )
        out = jnp.full((capj + slack,), jnp.uint32(0xFFFFFFFF))
        off = jnp.int32(0)
        for part, cnts in zip(code_parts, count_parts):
            nd = int(cnts.shape[0])
            capd = int(part.shape[0]) // nd
            for d in range(nd):
                win = jax.lax.slice_in_dim(part, d * capd, (d + 1) * capd)
                out = jax.lax.dynamic_update_slice(out, win, (off,))
                off = off + jnp.minimum(cnts[d], jnp.int32(capd))
        return out[:capj]

    _flatten_recon_jit = functools.partial(
        jax.jit, static_argnames=("capj",)
    )(_join_flatten_fast)

    # pair/entry reconstruction runs in fixed slabs: a single gather over
    # the whole compacted stream at full index size is exactly the
    # 1e8-element-gather shape that faults this TPU's worker
    RECON_SLAB = 1 << 21  # finer slabs -> capj tracks `total` within 2M

    @functools.partial(
        jax.jit, static_argnames=("capj", "n_slabs", "n_buckets")
    )
    def _join_finish(
        code_parts, count_parts, rid, packed, capj, n_slabs, n_buckets
    ):
        """Flatten + reconstruct + chain-prepare in ONE dispatch (each
        round trip through the remote tunnel costs ~0.3 s).  Returns the
        reconstructed match columns (for the host-chain fallback) plus
        the chain-prepare outputs (see ops/chain_device._prepare_core)."""
        from raven_tpu.ops.chain_device import _prepare_core

        codes = _join_flatten_fast(code_parts, count_parts, capj)
        L = min(RECON_SLAB, capj)
        rows = codes[: n_slabs * L].reshape(n_slabs, L)
        cols = _join_reconstruct_scan(rows, rid, packed)
        q_id, q_pos, t_id, t_pos, same = cols
        prepared = _prepare_core(
            q_id, q_pos, t_id, t_pos, same.astype(jnp.int32), n_buckets
        )
        return cols, prepared

    @jax.jit
    def _join_reconstruct_scan(codes_rows, rid, packed):
        """All reconstruction slabs in one dispatch (scan over the slab
        rows; the per-slab gathers stay bounded).  Returns flat columns
        [n_slabs * L].  rid and packed gather as one [N, 2] row table —
        two row gathers per slab instead of four element gathers."""
        table = jnp.stack([rid, packed], axis=1)

        def body(_, row):
            return None, _join_reconstruct_slab(row, table)

        _, cols = jax.lax.scan(body, None, codes_rows)
        return tuple(c.reshape(-1) for c in cols)

    @jax.jit
    def _join_reconstruct_slab(codes, table):
        """Decode one slab of compacted pair codes into match columns
        (table = stacked (rid, packed) rows; one row gather serves both
        columns)."""
        i = (codes // jnp.uint32(MAX_D + 1)).astype(jnp.int32)
        d = (codes % jnp.uint32(MAX_D + 1)).astype(jnp.int32)
        valid = codes != jnp.uint32(0xFFFFFFFF)
        i = jnp.where(valid, i, 0)
        j = jnp.maximum(i - d, 0)
        rows_i = table[i]
        rows_j = table[j]
        rid_i, packed_i = rows_i[:, 0], rows_i[:, 1]
        rid_j, packed_j = rows_j[:, 0], rows_j[:, 1]
        i_is_q = rid_i < rid_j
        q_id = jnp.minimum(rid_i, rid_j)
        t_id = jnp.maximum(rid_i, rid_j)
        q_packed = jnp.where(i_is_q, packed_i, packed_j)
        t_packed = jnp.where(i_is_q, packed_j, packed_i)
        same = (
            (q_packed >> _STRAND_BIT) & 1
        ) == ((t_packed >> _STRAND_BIT) & 1)
        return (
            jnp.where(valid, q_id, -1),
            q_packed & _POS_MASK,
            t_id,
            t_packed & _POS_MASK,
            same.astype(jnp.int8),
        )

    @functools.partial(jax.jit, static_argnames=("capf", "use_flags"))
    def _filtered_compact(
        key, rid, packed, counts, batch_tbl, occurrence, capf, use_flags
    ):
        """Query-side entries of too-frequent runs (feed Pile.AddKmers,
        reference construct.cc:377-383): compacted entry indices with run
        length > occurrence, subset flag set, and rid in batch."""
        n = key.shape[0]
        rid_c = jnp.clip(rid, 0, batch_tbl.shape[0] - 1)
        mask = (
            (key != UINT32_INF)
            & (counts > occurrence)
            & (batch_tbl[rid_c] != 0)
        )
        if use_flags:
            mask &= ((packed >> _FLAG_BIT) & 1) == 1
        codes = jnp.where(
            mask, jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0xFFFFFFFF)
        )
        (codes_s,) = jax.lax.sort((codes,), num_keys=1)
        return codes_s[:capf], mask.sum(dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def _take_prefix(a, n: int):
        """Static prefix slice (pow2-bucketed by the caller so compiled
        variants stay bounded)."""
        return jax.lax.slice_in_dim(a, 0, n)

    @jax.jit
    def _entry_gather_slab(codes, rid, packed):
        i = jnp.where(
            codes != jnp.uint32(0xFFFFFFFF), codes, 0
        ).astype(jnp.int32)
        return rid[i], packed[i] & _POS_MASK


class DeviceIndex:
    """Accelerator-resident minimizer index (see module docstring).

    Construction may return None (caller falls back to the host build) when
    jax is unavailable or a static capacity would be exceeded.
    """

    def __init__(self, key, rid, packed, n_entries, has_flags, k, w):
        self._key = key  # [N] uint32, sorted, UINT32_INF padding
        self._rid = rid  # [N] int32
        self._packed = packed  # [N] int32: pos | strand<<29 | flag<<30
        self._counts = None  # [N] int32 run lengths (lazy)
        self._newrun = None
        self._jcache = None  # (occurrence, key, rid, packed, counts, M,
        #                      suffix[]) — count-sorted compacted join table
        self.n_entries = int(n_entries)
        self.has_flags = has_flags
        self.k = k
        self.w = w

    # ----------------------------------------------------------------- build
    @classmethod
    def build(cls, readset, ids, k, w, minhash, with_flags):
        if not HAS_JAX or 2 * k > 30:
            return None
        ids = np.asarray(ids, dtype=np.int64)
        use_pallas = jax.default_backend() == "tpu"

        t0 = time.perf_counter()
        codes, eff, rids, base, clo, chi = segment_reads_packed(
            readset, ids, k, w, width=SEG_WIDTH
        )
        t0 = _prof("build.segment_pack", t0)
        S = codes.shape[0]
        if S == 0:
            return None
        chunk = _pow2_at_least(S, 256, 8192)
        n_chunks = (S + chunk - 1) // chunk
        need_flags = bool(minhash or with_flags)
        budget = (
            np.asarray(readset.lengths, dtype=np.int64) // k
        ).astype(np.int32)
        budget_dev = jnp.asarray(budget)
        # 2-lane packed chunk sort: every rid must stay under the 0xFFFF
        # packed-invalid sentinel and pos<<1|strand under 2^18
        narrow_sort = bool(
            need_flags
            and ids.size
            and int(ids.max()) < 0xFFFF
            and int(np.asarray(readset.lengths).max()) < (1 << 17)
        )
        # stack the segment arrays [n_chunks, chunk, ...]; the chunks are
        # dispatched in TWO groups so the second group's h2d transfer
        # overlaps the first group's sketch+sort (the ~30 MB upload costs
        # ~1 s through the remote tunnel when serialized)
        S_pad = n_chunks * chunk
        stacks = []
        for a in (codes, eff, rids, base, clo, chi):
            if S_pad != S:
                a = np.concatenate(
                    [a, np.zeros((S_pad - S,) + a.shape[1:], dtype=a.dtype)]
                )
            stacks.append(a.reshape((n_chunks, chunk) + a.shape[1:]))
        # ~8 groups: only the first group's transfer is exposed; the rest
        # streams behind the previous group's sketch+sort
        gsz = max(1, -(-n_chunks // 8))
        group_slices = [
            slice(s, min(s + gsz, n_chunks))
            for s in range(0, n_chunks, gsz)
        ]
        dev_groups: list = [None] * len(group_slices)
        t0 = _prof("build.h2d_upload", t0)
        # per-chunk compaction capacity ladder: robust winnowing density
        # is ~2/(w+1) (measured 0.30 at w=5 on the 115 Mbp bench) — the
        # tight cap shrinks every downstream sort; rare dense batches
        # retry at the generous cap (true counts checked below)
        cap_row_first = int(
            os.environ.get("RAVEN_TPU_CAP_ROW", "1024")
        )
        for density, cap_row in (
            (0.35, cap_row_first), (0.45, SEG_WIDTH),
        ):
            # 4096-multiple: the in-chunk rank scan blocks on 2^12 rows
            cap = max(
                4096, int(chunk * SEG_WIDTH * density) // 4096 * 4096
            )
            parts = []
            for gi, sl in enumerate(group_slices):
                if dev_groups[gi] is None:
                    dev_groups[gi] = [jnp.asarray(a[sl]) for a in stacks]
                parts.append(
                    _chunk_sketch_compact(
                        *dev_groups[gi], budget_dev, k, w, use_pallas,
                        cap, need_flags, narrow_sort=narrow_sort,
                        cap_row=cap_row if need_flags else SEG_WIDTH,
                    )
                )
            if len(parts) == 1:
                key, rid, packed, counts_dev = parts[0]
                counts = [int(c) for c in np.asarray(counts_dev)]
            else:
                # one concatenated d2h for all group counts (per-part
                # fetches serialized on the tunnel round trip)
                counts = [
                    int(c)
                    for c in np.asarray(
                        jnp.concatenate([p[3] for p in parts])
                    )
                ]
                key = jnp.concatenate([p[0] for p in parts])
                rid = jnp.concatenate([p[1] for p in parts])
                packed = jnp.concatenate([p[2] for p in parts])
            if _PROF:
                jax.block_until_ready(key)
            t0 = _prof("build.sketch_compact", t0)
            if all(c <= cap for c in counts):
                break
        else:
            return None  # compaction would clip real entries
        total = sum(counts)

        # 2^28 entries (~800 Mb of bases at w=5 density) verified to sort
        # on a 16 GB v5e; larger index batches fall back to the host path
        N = _quarter_at_least(max(total, 1), 1 << 12, 1 << 28)
        if total > N:
            return None  # beyond the largest supported bucket
        _prof_size("build", total=total, N=N, S=S, chunk=chunk, cap=cap)
        pad_n = N - n_chunks * cap
        if pad_n < 0:
            # n_chunks * cap > N needs NO pre-compaction sort: the final
            # key sort moves every sentinel (UINT32_INF key) past the
            # `total` real entries, so slicing its output to N afterwards
            # is lossless.  Flags were computed in-chunk, so finalize is
            # ONE key sort at n_chunks * cap — no padding needed at all.
            pad_n = 0
        if pad_n > 0:
            key = jnp.concatenate(
                [key, jnp.full((pad_n,), UINT32_INF, jnp.uint32)]
            )
            rid = jnp.concatenate(
                [rid, jnp.full((pad_n,), _INVALID_RID, jnp.int32)]
            )
            packed = jnp.concatenate([packed, jnp.zeros((pad_n,), jnp.int32)])

        key, rid, packed, n_valid = _index_sort(
            key, rid, packed, drop_unflagged=bool(minhash)
        )
        if key.shape[0] > N:
            key, rid, packed = key[:N], rid[:N], packed[:N]
        n_valid = int(n_valid)
        _prof("build.finalize", t0)
        return cls(key, rid, packed, n_valid, need_flags, k, w)

    # ---------------------------------------------------------------- filter
    def _ensure_counts(self):
        if self._counts is None:
            self._counts, self._newrun = _run_lengths(self._key)

    def occurrence_for(self, frequency: float) -> int:
        if frequency <= 0 or self.n_entries == 0:
            return np.iinfo(np.int64).max
        self._ensure_counts()
        n_runs = int(_num_runs_kernel(self._key, self._newrun))
        if n_runs == 0:
            return np.iinfo(np.int64).max
        # exact host-filter index semantics (engine.filter): float64 on host
        target = min(int((1.0 - frequency) * n_runs), n_runs - 1)
        occ = _occurrence_search(
            self._key, self._counts, self._newrun, jnp.int32(target)
        )
        return int(occ)

    # ------------------------------------------------------------------ join
    def distance_join(
        self,
        occurrence: int,
        batch: np.ndarray,
        need_flags: bool,
        filtered_out: dict | None = None,
        chain_k: int | None = None,
        device_cols: bool = False,
        narrow: bool = False,
    ):
        """Self-join matches (q_id, q_pos, t_id, t_pos, same) as numpy
        arrays, exactly the host selfjoin.distance_join contract; None on
        any static-capacity overflow (caller falls back to the host path).

        With device_cols=True the reconstructed match columns stay
        device-resident and the return value is ((cols tuple | None),
        total) — the partitioned index concatenates per-partition columns
        before chaining.

        With chain_k set, chaining also runs on device (ops/chain_device)
        and the return value is the {read_id: overlaps} dict instead — the
        match columns never leave the device.  Returns the matches tuple
        as usual when the device chain declines (oversized group).
        """
        if occurrence > MAX_D + 1:
            return None
        if need_flags and not self.has_flags:
            return None
        t0 = time.perf_counter()
        self._ensure_counts()
        if _PROF:
            jax.block_until_ready(self._counts)
        t0 = _prof("join.run_lengths", t0)
        maxd = min(MAX_D, max(occurrence - 1, 1))

        # count-sorted compacted join table (cached per occurrence):
        # singleton and too-frequent runs can never pair, so every
        # per-distance pass runs over the usable prefix only, and distance
        # d over just the suffix of runs longer than d
        if self._jcache is None or self._jcache[0] != occurrence:
            n_usable = int(
                _usable_count(
                    self._key, self._counts, jnp.int32(occurrence)
                )
            )
            if n_usable > SAFE_JOIN_ENTRIES:
                return None  # uint32 pair codes would wrap (see SAFE_JOIN_ENTRIES)
            M = _quarter_at_least(max(n_usable, 1), 1 << 12, 1 << 27)
            if n_usable > M:
                return None
            jkey, jrid, jpacked, jcounts, suffix = _compact_usable(
                self._key,
                self._rid,
                self._packed,
                self._counts,
                jnp.int32(occurrence),
                M,
            )
            self._jcache = (
                occurrence, jkey, jrid, jpacked, jcounts, M,
                np.asarray(suffix),
            )
        _, jkey, jrid, jpacked, jcounts, M, suffix = self._jcache
        n_usable = int(suffix[0])
        t0 = _prof("join.compact_usable", t0)

        batch_tbl = jnp.asarray(batch.astype(np.uint8))
        inb = _entry_inbatch(jrid, batch_tbl)
        occ = jnp.int32(occurrence)
        # group the distance passes by slab-size bucket: suffix[d] is
        # non-increasing in d, so equal-S distances are consecutive and one
        # lax.scan dispatch serves each bucket (dispatch round trips
        # through the remote tunnel dominated the per-distance loop)
        buckets: list[tuple[int, list[int], list[int]]] = []
        for d in range(1, maxd + 1):
            suf = int(suffix[d]) if d <= MAX_D else 0
            if suf <= 0:
                break
            S = _quarter_at_least(suf, 1 << 12, M)
            start = max(0, min(n_usable - suf, M - S))
            if buckets and buckets[-1][0] == S:
                buckets[-1][1].append(d)
                buckets[-1][2].append(start)
            else:
                buckets.append((S, [d], [start]))

        code_parts = counts = None
        # row-capacity ladder: the tight capacity wins at assembly scale;
        # dense small inputs retry wider (shift 0 = uncapped rows, cannot
        # overflow, so the device join never falls back for capacity)
        for shift in (2, 0):
            code_parts = []
            count_parts = []
            overflows = []
            for S, ds, starts in buckets:
                C = min(S, 1 << 14)
                capd = (S // C) * max(64, C >> shift)
                codes_b, count_b, ovf_b = _join_distances_bucket(
                    jkey,
                    jrid,
                    jpacked,
                    jcounts,
                    inb,
                    occ,
                    jnp.asarray(ds, jnp.int32),
                    jnp.asarray(starts, jnp.int32),
                    S,
                    capd,
                    bool(need_flags),
                )
                code_parts.append(codes_b)
                count_parts.append(count_b)
                overflows.append(ovf_b)
            # ONE d2h answers both ladder questions (per-bucket fetches
            # serialized on the tunnel round trip): [0] = total matches,
            # [1] = any row-capacity overflow
            if not buckets:
                summary = np.zeros(2, np.int32)
                break
            summary = np.asarray(
                _join_summary(count_parts, overflows)
            )
            if not bool(summary[1]):
                break
            code_parts = None
        t0 = _prof("join.distance_buckets", t0)
        total = int(summary[0])
        _prof_size(
            "join",
            n_usable=n_usable,
            M=M,
            sum_capd=sum(int(c.shape[0]) for c in code_parts),
            total=total,
        )
        # above one slab, capj must be a RECON_SLAB multiple so the slab
        # walk tiles it exactly (n_slabs * L == capj)
        if total <= RECON_SLAB:
            capj = _pow2_at_least(max(total, 1), 1 << 14, RECON_SLAB)
        else:
            capj = min(-(-total // RECON_SLAB) * RECON_SLAB, 1 << 30)
        if total > capj:
            return None  # > 2^30 matches: beyond any supported bucket

        res = None
        dev_cols = None
        if total > 0:
            # flatten + reconstruct (+ chain-prepare) in one dispatch;
            # rows beyond `total` decode the flatten sentinels (q_id = -1)
            L = min(RECON_SLAB, capj)
            n_slabs = -(-total // L)
            if chain_k is not None:
                from raven_tpu.ops.chain_device import (
                    BUCKETS,
                    chain_from_prepared,
                )

                dev_cols, prepared = _join_finish(
                    code_parts, count_parts, jrid, jpacked, capj,
                    n_slabs, len(BUCKETS),
                )
                if _PROF:
                    jax.block_until_ready(prepared)
                t0 = _prof("join.finish", t0)
                res = chain_from_prepared(
                    prepared, chain_k, narrow=narrow
                )
                t0 = _prof("join.chain", t0)
            else:
                codes = _flatten_recon_jit(
                    code_parts, count_parts, capj
                )
                rows = codes[: n_slabs * L].reshape(n_slabs, L)
                dev_cols = _join_reconstruct_scan(rows, jrid, jpacked)
        if device_cols:
            res = (dev_cols, total)
        if res is None:
            if total == 0:
                res = (
                    np.empty(0, np.int64),
                    np.empty(0, np.int64),
                    np.empty(0, np.int64),
                    np.empty(0, np.int64),
                    np.empty(0, np.uint8),
                )
            else:
                res = (
                    np.asarray(dev_cols[0][:total]).astype(np.int64),
                    np.asarray(dev_cols[1][:total]).astype(np.int64),
                    np.asarray(dev_cols[2][:total]).astype(np.int64),
                    np.asarray(dev_cols[3][:total]).astype(np.int64),
                    np.asarray(dev_cols[4][:total]).astype(np.uint8),
                )

        if filtered_out is not None:
            capf = max(1 << 12, self._key.shape[0] >> 3)
            fcodes, f_count = _filtered_compact(
                self._key,
                self._rid,
                self._packed,
                self._counts,
                batch_tbl,
                occ,
                capf,
                bool(need_flags),
            )
            f_count = int(f_count)
            if f_count > capf:
                return None
            for s0 in range(0, f_count, RECON_SLAB):
                take = min(RECON_SLAB, f_count - s0)
                slab = jax.lax.dynamic_slice_in_dim(
                    fcodes, s0, min(RECON_SLAB, capf)
                )
                f_rid, f_pos = _entry_gather_slab(
                    slab, self._rid, self._packed
                )
                f_rid = np.asarray(f_rid[:take])
                f_pos = np.asarray(f_pos[:take])
                for r, p in zip(f_rid.tolist(), f_pos.tolist()):
                    filtered_out.setdefault(int(r), []).append(int(p))
        return res

    # ------------------------------------------------------------ run stats
    def run_hist(self) -> np.ndarray:
        """Clipped run-length histogram (partitioned Filter quantile)."""
        self._ensure_counts()
        return np.asarray(
            _run_hist_kernel(self._key, self._counts, self._newrun)
        ).astype(np.int64)

    def le_count(self, t: int) -> int:
        """#distinct runs with length <= t (partitioned exact quantile)."""
        self._ensure_counts()
        return int(
            _le_count_kernel(
                self._key, self._counts, self._newrun, jnp.int32(t)
            )
        )

    # ------------------------------------------------------------- host view
    def to_host(self):
        """Materialize host columns (hash-sorted) for generic lookup
        callers: (hashes u64, ids u32, pos u32, strand u8, flags|None)."""
        n = self.n_entries
        key = np.asarray(self._key[:n]).astype(np.uint64)
        rid = np.asarray(self._rid[:n]).astype(np.uint32)
        packed = np.asarray(self._packed[:n])
        pos = (packed & _POS_MASK).astype(np.uint32)
        strand = ((packed >> _STRAND_BIT) & 1).astype(np.uint8)
        flags = (
            ((packed >> _FLAG_BIT) & 1).astype(bool)
            if self.has_flags
            else None
        )
        return key, rid, pos, strand, flags


class PartitionedIndex:
    """Hash-range-partitioned device index: H DeviceIndex parts, each
    covering a disjoint range of the hash space (runs never cross hash
    boundaries, so Filter and the self-join decompose exactly).

    Raises the device-resident envelope past the single-sort 2^28-entry
    cap (the gate to fly/human-scale index batches, reference
    construct.cc:35 4 GiB batching): the packed read segments upload once
    and stay resident while the sketch re-runs per partition with a fused
    hash-range filter — device FLOPs are cheap, H2D through the remote
    tunnel is not.  Minhash flags need each read's GLOBAL hash-ascending
    rank; partition ranges ascend, so rank = (entries of the read in
    lower partitions) + local rank — the per-partition per-read counts
    accumulate into the next partition's rank-offset table.

    Same duck-typed contract as DeviceIndex (build/occurrence_for/
    distance_join/to_host/n_entries/has_flags).
    """

    # target per-partition fill: 75% of the 2^28 single-sort cap
    PART_TARGET = 3 << 26
    # resident ceiling: key+rid+packed at 12 B/entry must leave join
    # workspace headroom in 16 GB HBM
    MAX_TOTAL_ENTRIES = 3 << 28

    def __init__(self, parts, k, w, has_flags):
        self.parts = parts
        self.n_entries = sum(p.n_entries for p in parts)
        self.has_flags = has_flags
        self.k = k
        self.w = w

    @classmethod
    def build(cls, readset, ids, k, w, minhash, with_flags, n_parts):
        if not HAS_JAX or 2 * k > 30 or n_parts < 2:
            return None
        ids = np.asarray(ids, dtype=np.int64)
        use_pallas = jax.default_backend() == "tpu"

        codes, eff, rids, base, clo, chi = segment_reads_packed(
            readset, ids, k, w, width=SEG_WIDTH
        )
        S = codes.shape[0]
        if S == 0:
            return None
        chunk = _pow2_at_least(S, 256, 8192)
        n_chunks = (S + chunk - 1) // chunk
        cap_full = max(256, int(chunk * SEG_WIDTH * 0.45) // 256 * 256)
        # in-range density is ~1/n_parts of the full sketch; 2.5x headroom
        cap = max(
            256,
            int(chunk * SEG_WIDTH * 0.45 * 2.5 / n_parts) // 256 * 256,
        )
        cap = min(cap, cap_full)

        S_pad = n_chunks * chunk
        args = []
        for a in (codes, eff, rids, base, clo, chi):
            if S_pad != S:
                a = np.concatenate(
                    [a, np.zeros((S_pad - S,) + a.shape[1:], dtype=a.dtype)]
                )
            args.append(
                jnp.asarray(a.reshape((n_chunks, chunk) + a.shape[1:]))
            )

        n_reads = int(readset.lengths.size)
        budget = (
            np.asarray(readset.lengths, dtype=np.int64) // k
        ).astype(np.int32)
        budget_dev = jnp.asarray(budget)
        need_flags = bool(minhash or with_flags)

        HASH_SPACE = 1 << 30  # sketch hashes are < 2^30 (ops/sketch.py)
        bounds = [
            (HASH_SPACE * h) // n_parts for h in range(n_parts + 1)
        ]
        bounds[-1] = 1 << 31  # inclusive top (hashes never reach it)

        rank_off = np.zeros(max(n_reads, 1), dtype=np.int64)
        parts: list[DeviceIndex] = []
        for h in range(n_parts):
            key, rid, packed, counts_dev, per_read = (
                _chunk_sketch_compact_range(
                    *args,
                    jnp.uint32(bounds[h]),
                    jnp.uint32(bounds[h + 1]),
                    max(n_reads, 1),
                    k,
                    w,
                    use_pallas,
                    cap,
                )
            )
            counts = np.asarray(counts_dev)
            if (counts > cap).any():
                return None  # compaction would clip real entries
            total = int(counts.sum())
            N = _quarter_at_least(max(total, 1), 1 << 12, 1 << 28)
            if total > N:
                return None
            pad_n = N - n_chunks * cap
            if pad_n > 0:
                key = jnp.concatenate(
                    [key, jnp.full((pad_n,), UINT32_INF, jnp.uint32)]
                )
                rid = jnp.concatenate(
                    [rid, jnp.full((pad_n,), _INVALID_RID, jnp.int32)]
                )
                packed = jnp.concatenate(
                    [packed, jnp.zeros((pad_n,), jnp.int32)]
                )
            if pad_n < 0:
                key, rid, packed = jax.lax.sort(
                    (key, rid, packed), num_keys=1
                )
                key, rid, packed = key[:N], rid[:N], packed[:N]

            key, rid, packed, n_valid = _finalize_index(
                key,
                rid,
                packed,
                budget_dev,
                jnp.asarray(
                    np.minimum(rank_off, 2**30).astype(np.int32)
                ),
                need_flags,
                bool(minhash),
            )
            rank_off += np.asarray(per_read).astype(np.int64)
            parts.append(
                DeviceIndex(
                    key, rid, packed, int(n_valid), need_flags, k, w
                )
            )
        return cls(parts, k, w, need_flags)

    # ---------------------------------------------------------------- filter
    def occurrence_for(self, frequency: float) -> int:
        if frequency <= 0 or self.n_entries == 0:
            return np.iinfo(np.int64).max
        hist = np.zeros(_RHBINS, dtype=np.int64)
        for p in self.parts:
            hist += p.run_hist()
        n_runs = int(hist.sum())
        if n_runs == 0:
            return np.iinfo(np.int64).max
        target = min(int((1.0 - frequency) * n_runs), n_runs - 1)
        cum = np.cumsum(hist)
        occ = int(np.searchsorted(cum, target + 1))
        if occ >= _RHBINS - 1:
            # clipped tail: exact global binary search over the threshold
            lo, hi = 1, 1 << 27
            while lo < hi:
                mid = (lo + hi) // 2
                le = sum(p.le_count(mid) for p in self.parts)
                if le >= target + 1:
                    hi = mid
                else:
                    lo = mid + 1
            occ = lo
        return occ

    # ------------------------------------------------------------------ join
    def distance_join(
        self,
        occurrence: int,
        batch: np.ndarray,
        need_flags: bool,
        filtered_out: dict | None = None,
        chain_k: int | None = None,
        narrow: bool = False,
    ):
        """Per-partition self-joins; match columns concatenate on device
        (runs never cross partitions, so the union is exact) and chaining
        runs once over the union.  Contract identical to
        DeviceIndex.distance_join."""
        cols_parts = []
        total = 0
        for p in self.parts:
            r = p.distance_join(
                occurrence,
                batch,
                need_flags,
                filtered_out=filtered_out,
                chain_k=None,
                device_cols=True,
            )
            if r is None:
                return None  # capacity overflow: host fallback
            cols, t = r
            if t > 0 and cols is not None:
                keep = _pow2_at_least(t, 1 << 12, 1 << 30)
                keep = min(keep, int(cols[0].shape[0]))
                cols_parts.append(
                    tuple(_take_prefix(c, keep) for c in cols)
                )
                total += t

        if total == 0:
            if chain_k is not None:
                return {}
            return (
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.uint8),
            )
        cat = [
            jnp.concatenate([cp[c] for cp in cols_parts])
            for c in range(5)
        ]
        if chain_k is not None:
            from raven_tpu.ops.chain_device import (
                BUCKETS,
                _chain_prepare,
                chain_from_prepared,
            )

            prepared = _chain_prepare(
                cat[0].astype(jnp.int32),
                cat[1].astype(jnp.int32),
                cat[2].astype(jnp.int32),
                cat[3].astype(jnp.int32),
                cat[4].astype(jnp.int32),
                len(BUCKETS),
            )
            return chain_from_prepared(prepared, chain_k, narrow=narrow)
        q_id = np.asarray(cat[0])
        valid = q_id >= 0
        return (
            q_id[valid].astype(np.int64),
            np.asarray(cat[1])[valid].astype(np.int64),
            np.asarray(cat[2])[valid].astype(np.int64),
            np.asarray(cat[3])[valid].astype(np.int64),
            np.asarray(cat[4])[valid].astype(np.uint8),
        )

    # ------------------------------------------------------------- host view
    def to_host(self):
        """Concatenate per-partition host views (ranges ascend, so the
        concatenation stays key-sorted)."""
        views = [p.to_host() for p in self.parts]
        key = np.concatenate([v[0] for v in views])
        rid = np.concatenate([v[1] for v in views])
        pos = np.concatenate([v[2] for v in views])
        strand = np.concatenate([v[3] for v in views])
        flags = (
            np.concatenate([v[4] for v in views])
            if self.has_flags
            else None
        )
        return key, rid, pos, strand, flags
