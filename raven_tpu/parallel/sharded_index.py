"""Hash-range-sharded minimizer index over a device mesh.

The multi-chip analog of the reference's single-address-space hash table
(ram MinimizerEngine): each device sketches its own shard of the read batch
(data-parallel), minimizers are exchanged with a single all-to-all so that
device d ends up owning hash range [d, d+1) * 2^(2k) / n, and every device
then joins its range locally.  Candidate counts reduce with a psum.

Collectives ride ICI inside a slice (DCN across hosts when the mesh spans
hosts).  This mirrors SURVEY.md §2.4's TPU mapping: index sharded by hash
bucket (the TP analog), reads data-parallel, all-to-all pair exchange.
"""

from __future__ import annotations

import functools
import os

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from raven_tpu.utils.jaxcfg import ensure_jax_cache

    ensure_jax_cache()  # persistent compile cache (jax may be preloaded)
    HAS_JAX = True
except Exception:  # pragma: no cover
    HAS_JAX = False

from raven_tpu.ops.sketch import UINT32_INF


def _note_fallback(why: str) -> None:
    """Every sharded-path degradation is observable: one stderr line in the
    reference's [scope] convention (silent host fallback on one hot hash
    range would otherwise mask a whole-stage slowdown)."""
    import sys

    print(f"[raven_tpu::ShardedIndex] host fallback: {why}", file=sys.stderr)

if HAS_JAX:
    from raven_tpu.ops.sketch import sketch_kernel

    def _local_sketch_flat(codes, lengths, read_ids, k, w, capacity):
        """Sketch the local read shard -> (key, id, pos, strand) sorted by
        key, sentinel-padded to `capacity`."""
        B, L = codes.shape
        h, strand, keep = sketch_kernel(codes, lengths, k, w)
        key = jnp.where(keep, h, UINT32_INF).reshape(-1)
        ids = jnp.broadcast_to(read_ids[:, None], (B, L)).reshape(-1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1).reshape(-1)
        sb = strand.reshape(-1).astype(jnp.int32)
        key_s, ids_s, pos_s, sb_s = jax.lax.sort(
            (key, ids, pos, sb), num_keys=1
        )
        return key_s[:capacity], ids_s[:capacity], pos_s[:capacity], sb_s[:capacity]

    def sharded_candidate_step(mesh, k: int, w: int, capacity: int, occurrence: int):
        """Build the jitted sharded step.

        Input arrays are sharded on the leading (read-batch) axis; the
        returned function computes the global candidate-pair count with the
        index sharded by hash range over ALL mesh axes (multi-host meshes
        use ('data', 'shard'): the hash exchange then spans the full slice,
        with neighbouring hash ranges placed along the ICI-fast axis).

        capacity: per-device minimizer capacity (static). The all-to-all
        slot size is capacity // n_shards per (source, range) pair.
        """
        n = mesh.devices.size
        axis = (
            mesh.axis_names[0]
            if len(mesh.axis_names) == 1
            else tuple(mesh.axis_names)
        )
        # per-destination slot with 2x headroom over the balanced share —
        # hash ranges are near-uniform but not exactly balanced
        slot = min(capacity, (2 * capacity) // n)
        bits = 2 * k

        def step(codes, lengths, read_ids):
            key, ids, pos, sb = _local_sketch_flat(
                codes, lengths, read_ids, k, w, capacity
            )
            # destination shard by hash range (keys already sorted, so each
            # destination's entries are contiguous)
            edges = (
                jnp.arange(1, n, dtype=jnp.uint32) * jnp.uint32(2**bits // n)
            )
            starts = jnp.searchsorted(key, edges).astype(jnp.int32)
            starts = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), starts, jnp.full(1, capacity, jnp.int32)]
            )

            # pack each destination's entries into its fixed slot
            def take(d):
                s = starts[d]
                e = jnp.minimum(starts[d + 1], s + slot)
                idx = s + jnp.arange(slot, dtype=jnp.int32)
                ok = idx < e
                idx = jnp.clip(idx, 0, capacity - 1)
                return (
                    jnp.where(ok, key[idx], UINT32_INF),
                    jnp.where(ok, ids[idx], -1),
                    jnp.where(ok, pos[idx], 0),
                    jnp.where(ok, sb[idx], 0),
                )

            outs = [take(d) for d in range(n)]
            send_key = jnp.stack([o[0] for o in outs])  # [n, slot]
            send_ids = jnp.stack([o[1] for o in outs])
            send_pos = jnp.stack([o[2] for o in outs])
            send_sb = jnp.stack([o[3] for o in outs])

            recv_key = jax.lax.all_to_all(
                send_key, axis, split_axis=0, concat_axis=0, tiled=False
            ).reshape(-1)
            recv_ids = jax.lax.all_to_all(
                send_ids, axis, split_axis=0, concat_axis=0, tiled=False
            ).reshape(-1)
            # sort the received range locally -> this device's index shard
            key_r, ids_r = jax.lax.sort((recv_key, recv_ids), num_keys=1)

            # gather-free run-length pair counting (see ops.overlap_step)
            m = key_r.shape[0]
            midx = jnp.arange(m, dtype=jnp.int32)
            new = jnp.concatenate(
                [jnp.ones(1, bool), key_r[1:] != key_r[:-1]]
            )
            start_run = jax.lax.associative_scan(
                jnp.maximum, jnp.where(new, midx, jnp.int32(-1))
            )
            nxt = jax.lax.associative_scan(
                jnp.minimum,
                jnp.concatenate(
                    [
                        jnp.where(new[1:], midx[1:], jnp.int32(m)),
                        jnp.full(1, m, jnp.int32),
                    ]
                ),
                reverse=True,
            )
            run_len = nxt - start_run
            rank = midx - start_run
            q_valid = (key_r != UINT32_INF) & (run_len <= occurrence)
            local_pairs = jnp.where(q_valid, rank, 0).sum()
            return jax.lax.psum(local_pairs, axis)

        spec_axis = axis if isinstance(axis, str) else tuple(axis)
        return jax.jit(
            _shard_map(
                step,
                mesh,
                (P(spec_axis, None), P(spec_axis), P(spec_axis)),
                P(),
            )
        )


# ===========================================================================
# ShardedIndex: the full sharded overlap stage (minimize -> filter -> map)
# ===========================================================================
#
# Multi-chip production path with the same interface and match contract as
# overlap.device_index.DeviceIndex, so the engine's self-join fast path can
# consume it unchanged.  Data flow per SURVEY §2.4:
#
#   1. reads are data-parallel: each device sketches its read shard
#      (fixed-width segments, ops.sketch.sketch_segments_kernel — the same
#      kernels as the single-chip path, so entries are bit-identical);
#   2. minhash ("micromizer") membership flags are computed pre-exchange —
#      a read's segments are kept on one device so its (rid, hash, pos)
#      sort is local;
#   3. ONE all-to-all re-shards entries by hash range: device d owns
#      [d, d+1) * 2^(2k) / n, so every equal-hash run lands whole on one
#      device and the self-join (shifted-equality distance join,
#      overlap/selfjoin.py) is exact with purely local compares;
#   4. the ram-Filter occurrence threshold is global: a psum'd histogram of
#      distinct-run lengths gives the exact (1 - f) quantile on the host;
#   5. per-device matches compact into static buffers and concatenate over
#      the mesh axis; chaining stays on host (byte-identical overlap sets,
#      tests/test_sharded_map.py).
#
# Reference equivalent: the whole of construct.cc:42-113 run under a mesh.

from raven_tpu.ops.sketch import segment_reads, sketch_segments_kernel

# static shift-distance cap (occurrence > SH_MAX_D + 1 -> host); kept in
# lockstep with device_index.MAX_D (see the envelope analysis there)
SH_MAX_D = int(os.environ.get("RAVEN_TPU_MAX_D", "40"))
# Per-device pair codes pack (local index, distance) as uint32
# idx*(SH_MAX_D+1)+d; codes must stay strictly below the 0xFFFFFFFF
# sentinel, so the per-device shard may hold at most this many entries
# before the join must decline (host fallback) — beyond it the encoding
# wraps modulo 2^32 and silently decodes wrong pairs.
SH_SAFE_ENTRIES = (0xFFFFFFFE - SH_MAX_D) // (SH_MAX_D + 1) + 1
_STRAND_BIT = 29
_FLAG_BIT = 30
_POS_MASK = (1 << _STRAND_BIT) - 1
_INVALID_RID = np.int32(2**31 - 1)
_HBINS = 512  # run-length histogram bins (occurrence >= _HBINS -> fallback)


def _mesh_axis(mesh):
    """Collective axis spec covering ALL mesh axes: multi-axis meshes (the
    multi-host ('data', 'shard') layout) flatten into one logical shard
    ring for the hash-range exchange."""
    names = mesh.axis_names
    return names[0] if len(names) == 1 else tuple(names)


def _pow2_at_least(v: int, lo: int) -> int:
    c = lo
    while c < v:
        c <<= 1
    return c


if HAS_JAX:
    def _shard_map(f, mesh, in_specs, out_specs):
        try:
            from jax import shard_map

            return shard_map(
                f,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            )
        except (ImportError, TypeError):  # older jax
            from jax.experimental.shard_map import shard_map as _sm

            return _sm(
                f,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_rep=False,
            )

    @functools.lru_cache(maxsize=None)
    def _build_step(mesh, k: int, w: int, cap: int, minhash: bool, need_flags: bool):
        """Jitted sharded index build: sketch + flags + hash-range exchange.

        Returns a function (codes, eff, rids, base, clo, chi, budget_tbl) ->
        (key, rid, packed  [global, P(axis)],  n_valid, hist, overflow).
        """
        n = mesh.devices.size
        axis = _mesh_axis(mesh)
        slot = min(cap, max(1, (2 * cap) // n))
        bits = 2 * k

        def step(codes, eff, rids, base, clo, chi, budget_tbl):
            key, ids, pos, sb = sketch_segments_kernel(
                codes, eff, rids, base, clo, chi, k, w
            )
            valid = key != UINT32_INF
            count = valid.sum(dtype=jnp.int32)
            rid = jnp.where(valid, ids, _INVALID_RID)
            packed = jnp.where(
                valid, pos | (sb << _STRAND_BIT), 0
            ).astype(jnp.int32)
            # compact to cap (sort also groups by key for the range split)
            key, rid, packed = jax.lax.sort((key, rid, packed), num_keys=1)
            key, rid, packed = key[:cap], rid[:cap], packed[:cap]
            build_overflow = count > cap

            if need_flags or minhash:
                # minhash subset: rank of entry among its read's entries
                # (hash asc, ties by position) < read_len // k
                p = packed & _POS_MASK
                rid_s, key_s, _, packed_s = jax.lax.sort(
                    (rid, key, p, packed), num_keys=3
                )
                m = key_s.shape[0]
                idx = jnp.arange(m, dtype=jnp.int32)
                newread = jnp.concatenate(
                    [jnp.ones((1,), bool), rid_s[1:] != rid_s[:-1]]
                )
                start = jax.lax.cummax(
                    jnp.where(newread, idx, jnp.int32(-1))
                )
                rank = idx - start
                rid_c = jnp.clip(rid_s, 0, budget_tbl.shape[0] - 1)
                flag = (rank < budget_tbl[rid_c]) & (rid_s != _INVALID_RID)
                packed_s = jnp.where(
                    flag, packed_s | (1 << _FLAG_BIT), packed_s
                )
                if minhash:  # ram Minimize(minhash=true): drop unflagged
                    key_s = jnp.where(flag, key_s, UINT32_INF)
                key, rid, packed = jax.lax.sort(
                    (key_s, rid_s, packed_s), num_keys=1
                )

            # hash-range split: destination d owns [d, d+1) * 2^bits / n
            edges = jnp.concatenate(
                [
                    (
                        jnp.arange(1, n, dtype=jnp.uint32)
                        * jnp.uint32(2**bits // n)
                    ),
                    jnp.full((1,), UINT32_INF, jnp.uint32),
                ]
            )
            starts = jnp.concatenate(
                [
                    jnp.zeros(1, jnp.int32),
                    jnp.searchsorted(key, edges).astype(jnp.int32),
                ]
            )
            dest_counts = starts[1:] - starts[:-1]
            exch_overflow = (dest_counts > slot).any()

            def take(d):
                s = starts[d]
                e = jnp.minimum(starts[d + 1], s + slot)
                idx = s + jnp.arange(slot, dtype=jnp.int32)
                ok = idx < e
                idx = jnp.clip(idx, 0, cap - 1)
                return (
                    jnp.where(ok, key[idx], UINT32_INF),
                    jnp.where(ok, rid[idx], _INVALID_RID),
                    jnp.where(ok, packed[idx], 0),
                )

            outs = [take(d) for d in range(n)]
            send = [jnp.stack([o[c] for o in outs]) for c in range(3)]
            recv = [
                jax.lax.all_to_all(
                    s, axis, split_axis=0, concat_axis=0, tiled=False
                ).reshape(-1)
                for s in send
            ]
            key_r, rid_r, packed_r = jax.lax.sort(tuple(recv), num_keys=1)

            # distinct-run length histogram for the global Filter quantile
            m = key_r.shape[0]
            idx = jnp.arange(m, dtype=jnp.int32)
            newrun = jnp.concatenate(
                [jnp.ones((1,), bool), key_r[1:] != key_r[:-1]]
            )
            start = jax.lax.cummax(jnp.where(newrun, idx, jnp.int32(-1)))
            nxt = jax.lax.cummin(
                jnp.concatenate(
                    [
                        jnp.where(newrun[1:], idx[1:], jnp.int32(m)),
                        jnp.full((1,), m, jnp.int32),
                    ]
                ),
                reverse=True,
            )
            counts = nxt - start
            isrun = newrun & (key_r != UINT32_INF)
            hist = (
                jnp.zeros(_HBINS, jnp.int32)
                .at[jnp.where(isrun, jnp.clip(counts, 0, _HBINS - 1), 0)]
                .add(jnp.where(isrun, 1, 0))
                .at[0]
                .set(0)
            )
            hist = jax.lax.psum(hist, axis)
            n_valid = jax.lax.psum(
                (key_r != UINT32_INF).sum(dtype=jnp.int32), axis
            )
            overflow = jax.lax.pmax(
                (build_overflow | exch_overflow).astype(jnp.int32), axis
            )
            return key_r, rid_r, packed_r, n_valid, hist, overflow

        return jax.jit(
            _shard_map(
                step,
                mesh,
                (
                    P(axis, None),
                    P(axis),
                    P(axis),
                    P(axis),
                    P(axis),
                    P(axis),
                    P(None),
                ),
                (P(axis), P(axis), P(axis), P(), P(), P()),
            )
        )

    @functools.lru_cache(maxsize=None)
    def _chain_prepare_step(mesh, S2: int, n_buckets: int,
                            replicate: bool = False):
        """Sharded chain stage A: re-shard the per-shard join matches by
        query read (dest = q_id mod n — every anchor of a (q, t) pair
        lands on one shard) with a single all-to-all, then run the device
        chain's group formation (ops/chain_device._prepare_core) locally
        per shard.  The matches never touch the host.

        In: per-shard match columns [capm] (q_id < 0 = padding).
        Out: per-shard sorted anchors + bucket-sorted group descriptors
        (device-resident, P(axis)), per-shard bucket counts [NB], global
        max group size, exchange-overflow flag.
        """
        from raven_tpu.ops.chain_device import _prepare_core

        n = mesh.devices.size
        axis = _mesh_axis(mesh)

        def step(q_id, q_pos, t_id, t_pos, same):
            m = q_id.shape[0]
            valid = q_id >= 0
            dest = jnp.where(valid, q_id % n, jnp.int32(n))
            d_s, q_s, qp_s, t_s, tp_s, sm_s = jax.lax.sort(
                (dest, q_id, q_pos, t_id, t_pos, same), num_keys=2
            )
            starts = jnp.stack(
                [
                    (d_s < d).sum(dtype=jnp.int32)
                    for d in range(n + 1)
                ]
            )

            def take(d):
                s = starts[d]
                e = starts[d + 1]
                idx = s + jnp.arange(S2, dtype=jnp.int32)
                ok = idx < e
                idx = jnp.clip(idx, 0, m - 1)
                return (
                    jnp.where(ok, q_s[idx], jnp.int32(-1)),
                    jnp.where(ok, qp_s[idx], 0),
                    jnp.where(ok, t_s[idx], 0),
                    jnp.where(ok, tp_s[idx], 0),
                    jnp.where(ok, sm_s[idx], 0),
                )

            outs = [take(d) for d in range(n)]
            send = [
                jnp.stack([o[c] for o in outs]) for c in range(5)
            ]
            recv = [
                jax.lax.all_to_all(
                    s, axis, split_axis=0, concat_axis=0, tiled=False
                ).reshape(-1)
                for s in send
            ]
            ovf = ((starts[1 : n + 1] - starts[:n]) > S2).any()
            ovf = jax.lax.pmax(ovf.astype(jnp.int32), axis)

            anchors, descs, npb, max_size = _prepare_core(
                recv[0], recv[1], recv[2], recv[3], recv[4], n_buckets
            )
            max_size = jax.lax.pmax(max_size, axis)
            if replicate:  # host code reads npb with np.asarray
                npb = jax.lax.all_gather(npb, axis, tiled=True)
            return (*anchors, *descs, npb, max_size, ovf)

        return jax.jit(
            _shard_map(
                step,
                mesh,
                (P(axis),) * 5,
                (P(axis),) * 8
                + (P() if replicate else P(axis), P(), P()),
            )
        )

    @functools.lru_cache(maxsize=None)
    def _chain_lis_step(mesh, bucket_ns: tuple, kmer: int,
                        replicate: bool = False):
        """Sharded chain stage B: every shard runs the batched patience-LIS
        + emission dispatch (ops/chain_device._chain_lis) over its own
        groups; bucket shapes are the static per-bucket maxima across
        shards (per-shard true counts are passed dynamically and masked
        inside the kernel)."""
        from raven_tpu.ops.chain_device import _chain_lis

        axis = _mesh_axis(mesh)

        def step(qs, ts, sm, qp, tp, dstart, dsize, dgid, offs, nbs):
            stacked, count = _chain_lis(
                (qs, ts, sm, qp, tp),
                (dstart, dsize, dgid),
                offs.reshape(-1),
                nbs.reshape(-1),
                bucket_ns,
                kmer,
            )
            count = count.reshape(1)
            if replicate:  # host assembly reads both with np.asarray
                stacked = jax.lax.all_gather(
                    stacked, axis, axis=1, tiled=True
                )
                count = jax.lax.all_gather(count, axis, tiled=True)
            return stacked, count

        out_specs = (
            (P(), P()) if replicate else (P(None, axis), P(axis))
        )
        return jax.jit(
            _shard_map(
                step,
                mesh,
                (P(axis),) * 8 + (P(axis, None), P(axis, None)),
                out_specs,
            )
        )

    @functools.lru_cache(maxsize=None)
    def _occ_search_step(mesh):
        """Exact Filter threshold when the run-length quantile lands past
        the clipped histogram tail (count >= _HBINS-1): the same binary
        search over the threshold value as DeviceIndex._occurrence_search,
        with the per-shard counts psum'd across the mesh each probe.
        Mirrors ram Filter semantics: occurrence = counts_sorted[target]
        over the distinct-key run lengths."""
        axis = _mesh_axis(mesh)

        def step(key, target):
            m = key.shape[0]
            idx = jnp.arange(m, dtype=jnp.int32)
            newrun = jnp.concatenate(
                [jnp.ones((1,), bool), key[1:] != key[:-1]]
            )
            start = jax.lax.cummax(jnp.where(newrun, idx, jnp.int32(-1)))
            nxt = jax.lax.cummin(
                jnp.concatenate(
                    [
                        jnp.where(newrun[1:], idx[1:], jnp.int32(m)),
                        jnp.full((1,), m, jnp.int32),
                    ]
                ),
                reverse=True,
            )
            counts = nxt - start
            isrun = newrun & (key != UINT32_INF)

            def body(_, lohi):
                lo, hi = lohi
                mid = (lo + hi) // 2
                le = jax.lax.psum(
                    jnp.where(
                        isrun & (counts <= mid), jnp.int32(1), 0
                    ).sum(),
                    axis,
                )
                good = le >= target + 1
                return jnp.where(good, lo, mid + 1), jnp.where(good, mid, hi)

            lo, _ = jax.lax.fori_loop(
                0, 28, body, (jnp.int32(1), jnp.int32(1) << 27)
            )
            return lo

        return jax.jit(
            _shard_map(step, mesh, (P(axis), P()), P())
        )

    def _multiprocess() -> bool:
        """Multi-host runs must REPLICATE any output the host code reads
        with np.asarray (fetching a jax.Array that spans non-addressable
        devices raises); single-process runs keep sharded outputs (no
        extra collectives, no n-fold copies)."""
        try:
            return jax.process_count() > 1
        except Exception:
            return False

    @functools.lru_cache(maxsize=None)
    def _join_step(
        mesh, maxd: int, capd: int, capm: int, capf: int,
        need_flags: bool, replicate: bool = False,
    ):
        """Jitted sharded distance join over the exchanged index.

        (key, rid, packed [P(axis)], batch_tbl, occurrence) ->
        (q_id, q_pos, t_id, t_pos, same [P(axis), capm/device],
         n_matches, match_overflow, f_rid, f_pos [P(axis), capf/device],
         n_filtered, filt_overflow).  With replicate=True the per-shard
        columns all_gather to every process (multi-host host-side reads).
        """
        n = mesh.devices.size
        axis = _mesh_axis(mesh)

        def step(key, rid, packed, batch_tbl, occ):
            m = key.shape[0]
            idx = jnp.arange(m, dtype=jnp.int32)
            newrun = jnp.concatenate(
                [jnp.ones((1,), bool), key[1:] != key[:-1]]
            )
            start = jax.lax.cummax(jnp.where(newrun, idx, jnp.int32(-1)))
            nxt = jax.lax.cummin(
                jnp.concatenate(
                    [
                        jnp.where(newrun[1:], idx[1:], jnp.int32(m)),
                        jnp.full((1,), m, jnp.int32),
                    ]
                ),
                reverse=True,
            )
            counts = nxt - start
            rid_c = jnp.clip(rid, 0, batch_tbl.shape[0] - 1)
            inb = (batch_tbl[rid_c] != 0) & (rid != _INVALID_RID)
            countok = counts <= occ

            parts = []
            total = jnp.int32(0)
            overflow = jnp.zeros((), bool)
            pad_k = jnp.full((maxd,), UINT32_INF, key.dtype)
            pad_r = jnp.full((maxd,), _INVALID_RID, rid.dtype)
            kp = jnp.concatenate([pad_k, key])
            rp = jnp.concatenate([pad_r, rid])
            pp = jnp.concatenate([jnp.zeros((maxd,), packed.dtype), packed])
            bp = jnp.concatenate([jnp.zeros((maxd,), bool), inb])
            for d in range(1, maxd + 1):
                sh = maxd - d
                key_j = jax.lax.slice_in_dim(kp, sh, sh + m)
                rid_j = jax.lax.slice_in_dim(rp, sh, sh + m)
                packed_j = jax.lax.slice_in_dim(pp, sh, sh + m)
                inb_j = jax.lax.slice_in_dim(bp, sh, sh + m)
                eq = (key == key_j) & (key != UINT32_INF)
                idne = rid != rid_j
                i_is_q = rid < rid_j
                inbatch = jnp.where(i_is_q, inb, inb_j)
                mask = eq & countok & idne & inbatch
                if need_flags:
                    q_packed = jnp.where(i_is_q, packed, packed_j)
                    mask &= ((q_packed >> _FLAG_BIT) & 1) == 1
                codes = jnp.where(
                    mask,
                    idx.astype(jnp.uint32) * jnp.uint32(SH_MAX_D + 1) + d,
                    jnp.uint32(0xFFFFFFFF),
                )
                (codes_s,) = jax.lax.sort((codes,), num_keys=1)
                parts.append(codes_s[:capd])
                cnt = mask.sum(dtype=jnp.int32)
                total += cnt
                overflow |= cnt > capd
            (codes,) = jax.lax.sort(
                (jnp.concatenate(parts),), num_keys=1
            )
            codes = codes[:capm]
            overflow |= total > capm

            i = (codes // jnp.uint32(SH_MAX_D + 1)).astype(jnp.int32)
            d = (codes % jnp.uint32(SH_MAX_D + 1)).astype(jnp.int32)
            valid = codes != jnp.uint32(0xFFFFFFFF)
            i = jnp.where(valid, i, 0)
            j = jnp.maximum(i - d, 0)
            rid_i, rid_j = rid[i], rid[j]
            packed_i, packed_j = packed[i], packed[j]
            i_is_q = rid_i < rid_j
            q_id = jnp.minimum(rid_i, rid_j)
            t_id = jnp.maximum(rid_i, rid_j)
            q_packed = jnp.where(i_is_q, packed_i, packed_j)
            t_packed = jnp.where(i_is_q, packed_j, packed_i)
            same = (
                (q_packed >> _STRAND_BIT) & 1
            ) == ((t_packed >> _STRAND_BIT) & 1)

            # too-frequent query-side entries (Pile.AddKmers feed)
            fmask = (key != UINT32_INF) & (counts > occ) & inb
            if need_flags:
                fmask &= ((packed >> _FLAG_BIT) & 1) == 1
            fcodes = jnp.where(
                fmask, idx.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF)
            )
            (fcodes_s,) = jax.lax.sort((fcodes,), num_keys=1)
            fcodes_s = fcodes_s[:capf]
            f_count = fmask.sum(dtype=jnp.int32)
            fi = jnp.where(
                fcodes_s != jnp.uint32(0xFFFFFFFF), fcodes_s, 0
            ).astype(jnp.int32)
            f_valid = fcodes_s != jnp.uint32(0xFFFFFFFF)
            f_rid = jnp.where(f_valid, rid[fi], -1)
            f_pos = packed[fi] & _POS_MASK

            cols = (
                jnp.where(valid, q_id, -1),
                q_packed & _POS_MASK,
                t_id,
                t_packed & _POS_MASK,
                same.astype(jnp.int8),
            )
            fcols = (f_rid, f_pos)
            if replicate:
                cols = tuple(
                    jax.lax.all_gather(c, axis, tiled=True) for c in cols
                )
                fcols = tuple(
                    jax.lax.all_gather(c, axis, tiled=True) for c in fcols
                )
            return (
                *cols,
                jax.lax.psum(total, axis),
                jax.lax.pmax(overflow.astype(jnp.int32), axis),
                *fcols,
                jax.lax.psum(f_count, axis),
                jax.lax.pmax((f_count > capf).astype(jnp.int32), axis),
            )

        col_spec = P() if replicate else P(axis)
        return jax.jit(
            _shard_map(
                step,
                mesh,
                (P(axis), P(axis), P(axis), P(None), P()),
                (
                    col_spec,
                    col_spec,
                    col_spec,
                    col_spec,
                    col_spec,
                    P(),
                    P(),
                    col_spec,
                    col_spec,
                    P(),
                    P(),
                ),
            )
        )


class ShardedIndex:
    """Hash-range-sharded minimizer index over a device mesh (see the
    section comment above).  Same external contract as DeviceIndex."""

    def __init__(self, mesh, key, rid, packed, n_entries, hist, has_flags, k, w):
        self.mesh = mesh
        self._key = key  # global [n * n*slot], P(axis)-sharded
        self._rid = rid
        self._packed = packed
        self.n_entries = int(n_entries)
        self._hist = np.asarray(hist).astype(np.int64)
        self.has_flags = has_flags
        self.k = k
        self.w = w

    # ----------------------------------------------------------------- build
    @classmethod
    def build(cls, readset, ids, k, w, minhash, with_flags, mesh=None):
        if not HAS_JAX or 2 * k > 30:
            return None
        if mesh is None:
            from raven_tpu.parallel.mesh import make_mesh

            if len(jax.devices()) < 2:
                return None
            mesh = make_mesh()
        n = mesh.devices.size
        ids = np.asarray(ids, dtype=np.int64)

        codes, eff, rids, base, clo, chi = segment_reads(
            readset, ids, k, w, width=2048
        )
        S = codes.shape[0]
        if S == 0:
            return None
        # keep each read's segments on one device (flags are computed
        # pre-exchange): round-robin reads by cumulative segment count
        bounds = np.nonzero(
            np.concatenate([[True], rids[1:] != rids[:-1]])
        )[0]
        bounds = np.append(bounds, S)
        per_dev: list[list[int]] = [[] for _ in range(n)]
        loads = np.zeros(n, dtype=np.int64)
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            d = int(np.argmin(loads))
            per_dev[d].extend(range(s0, s1))
            loads[d] += s1 - s0
        max_loc = int(loads.max())
        order = np.full(n * max_loc, -1, dtype=np.int64)
        for d in range(n):
            order[d * max_loc : d * max_loc + len(per_dev[d])] = per_dev[d]
        pad_row = order < 0
        order = np.maximum(order, 0)

        def arrange(a, fill=0):
            out = a[order]
            out[pad_row] = fill
            return out

        codes = arrange(codes)
        eff = arrange(eff)
        rids_a = arrange(rids, fill=int(_INVALID_RID))
        base = arrange(base)
        clo = arrange(clo)
        chi = arrange(chi)

        cap = _pow2_at_least(max(256, int(max_loc * 2048 * 0.45)), 256)
        budget = (
            np.asarray(readset.lengths, dtype=np.int64) // k
        ).astype(np.int32)
        if budget.size == 0:
            budget = np.zeros(1, np.int32)

        axis = _mesh_axis(mesh)
        shard1 = NamedSharding(mesh, P(axis))
        shard2 = NamedSharding(mesh, P(axis, None))
        repl = NamedSharding(mesh, P(None))
        step = _build_step(
            mesh, k, w, cap, bool(minhash), bool(minhash or with_flags)
        )
        key, rid, packed, n_valid, hist, overflow = step(
            jax.device_put(jnp.asarray(codes), shard2),
            jax.device_put(jnp.asarray(eff), shard1),
            jax.device_put(jnp.asarray(rids_a), shard1),
            jax.device_put(jnp.asarray(base), shard1),
            jax.device_put(jnp.asarray(clo), shard1),
            jax.device_put(jnp.asarray(chi), shard1),
            jax.device_put(jnp.asarray(budget), repl),
        )
        if int(overflow):
            _note_fallback(
                "per-device capacity overflow during build/exchange "
                "(hot hash range or skewed shard); building on host"
            )
            return None
        return cls(
            mesh,
            key,
            rid,
            packed,
            int(n_valid),
            hist,
            bool(minhash or with_flags),
            k,
            w,
        )

    # ---------------------------------------------------------------- filter
    def occurrence_for(self, frequency: float) -> int:
        """Exact ram-Filter quantile from the psum'd run-length histogram
        (counts ascending; same float64 index arithmetic as the host)."""
        if frequency <= 0 or self.n_entries == 0:
            return np.iinfo(np.int64).max
        n_runs = int(self._hist.sum())
        if n_runs == 0:
            return np.iinfo(np.int64).max
        target = min(int((1.0 - frequency) * n_runs), n_runs - 1)
        cum = np.cumsum(self._hist)
        occ = int(np.searchsorted(cum, target + 1))
        if occ >= _HBINS - 1:
            # quantile in the clipped histogram tail: compute the exact
            # threshold with a psum'd device binary search instead of
            # silently disabling frequency filtering
            step = _occ_search_step(self.mesh)
            occ = int(
                step(self._key, jnp.asarray(target, jnp.int32))
            )
        return occ

    # ------------------------------------------------------------------ join
    def distance_join(
        self,
        occurrence: int,
        batch: np.ndarray,
        need_flags: bool,
        filtered_out: dict | None = None,
        chain_k: int | None = None,
        narrow: bool = False,  # accepted for DeviceIndex signature parity
    ):
        """Sharded self-join; same contract as DeviceIndex.distance_join
        (None on capacity overflow -> caller falls back).  With chain_k
        set, chaining runs on-device per shard after a match re-shard by
        query read (one all-to-all) and the return value is the
        {read_id: overlaps} dict — match columns never leave the mesh.
        Falls back to returning the match tuple (host chain) when a group
        exceeds the top LIS bucket or the exchange overflows."""
        if occurrence > SH_MAX_D + 1:
            _note_fallback(
                f"occurrence {occurrence} > SH_MAX_D+1; joining on host"
            )
            return None
        if need_flags and not self.has_flags:
            return None
        n = self.mesh.devices.size
        m_local = self._key.shape[0] // n
        if m_local > SH_SAFE_ENTRIES:
            _note_fallback(
                f"per-device shard {m_local} entries exceeds uint32 "
                f"pair-code domain {SH_SAFE_ENTRIES}; joining on host"
            )
            return None
        maxd = min(SH_MAX_D, max(occurrence - 1, 1))
        # hash ranges balance entries, not matches: leave 2x headroom over
        # the per-device average (overflow still falls back to host)
        capd = _pow2_at_least(max(8192, m_local >> 1), 8192)
        capm = _pow2_at_least(max(16384, 2 * m_local), 16384)
        capf = _pow2_at_least(max(4096, m_local >> 2), 4096)

        axis = self.mesh.axis_names[0]
        repl = NamedSharding(self.mesh, P(None))
        batch_tbl = jax.device_put(
            jnp.asarray(batch.astype(np.uint8)), repl
        )
        occ = jax.device_put(
            jnp.asarray(occurrence, jnp.int32), NamedSharding(self.mesh, P())
        )
        # capacity retry ladder: skewed shards (one hot hash range)
        # overflow the average-sized buffers; widen and re-dispatch
        # instead of abandoning the whole batch to the host (each cap is
        # its own cached compile, so steady-state reruns are free)
        for attempt in range(4):
            step = _join_step(
                self.mesh, maxd, capd, capm, capf, bool(need_flags),
                replicate=_multiprocess(),
            )
            (
                q_id,
                q_pos,
                t_id,
                t_pos,
                same,
                n_matches,
                ovf,
                f_rid,
                f_pos,
                n_filt,
                f_ovf,
            ) = step(self._key, self._rid, self._packed, batch_tbl, occ)
            if not (int(ovf) or int(f_ovf)):
                break
            if attempt == 3:
                _note_fallback(
                    "per-device match/filter capacity overflow after "
                    f"{attempt + 1} widenings (match_ovf={int(ovf)}, "
                    f"filt_ovf={int(f_ovf)}); joining on host"
                )
                return None
            print(
                "[raven_tpu::ShardedIndex] per-device capacity overflow "
                f"(match={int(ovf)}, filt={int(f_ovf)}); retrying with "
                "2x buffers",
                file=__import__("sys").stderr,
            )
            capd *= 2
            capm *= 2
            capf *= 2

        res = None
        if chain_k is not None:
            res = self._chain_on_device(
                q_id, q_pos, t_id, t_pos, same, int(chain_k)
            )
        if res is None:
            q_id = np.asarray(q_id)
            valid = q_id >= 0
            res = (
                q_id[valid].astype(np.int64),
                np.asarray(q_pos)[valid].astype(np.int64),
                np.asarray(t_id)[valid].astype(np.int64),
                np.asarray(t_pos)[valid].astype(np.int64),
                np.asarray(same)[valid].astype(np.uint8),
            )
        if filtered_out is not None:
            f_rid = np.asarray(f_rid)
            fv = f_rid >= 0
            for r, p in zip(
                f_rid[fv].tolist(), np.asarray(f_pos)[fv].tolist()
            ):
                filtered_out.setdefault(int(r), []).append(int(p))
        return res

    # ------------------------------------------------------------ chaining
    def _chain_on_device(self, q_id, q_pos, t_id, t_pos, same, k: int):
        """Per-shard device chaining of the sharded join's match columns
        (SURVEY §2.4: the chaining inside ram's Map, run under the mesh).
        Returns {read_id: overlaps} or None (host-chain fallback)."""
        from raven_tpu.ops.chain_device import (
            BUCKETS,
            _assemble_overlaps,
            chain_oversize_groups_host,
        )

        n = self.mesh.devices.size
        capm = q_id.shape[0] // n
        NB = len(BUCKETS)
        S2 = _pow2_at_least(max(8192, (4 * capm) // max(n, 1)), 8192)
        step = _chain_prepare_step(
            self.mesh, S2, NB, replicate=_multiprocess()
        )
        (
            qs, ts, sm, qp, tp,
            dstart, dsize, dgid,
            npb, max_size, ovf,
        ) = step(q_id, q_pos, t_id, t_pos, same.astype(jnp.int32))
        if int(ovf):
            _note_fallback(
                "chain exchange slot overflow (skewed query "
                "distribution); chaining on host"
            )
            return None

        # npb rows: per-shard counts for NB buckets + the oversize
        # pseudo-bucket (host-chained per group; rest stays on device)
        npb = np.asarray(npb).reshape(n, NB + 1).astype(np.int32)
        if int(npb.sum()) == 0:
            return {}
        offs = np.zeros((n, NB), dtype=np.int32)
        np.cumsum(npb[:, : NB - 1], axis=1, out=offs[:, 1:])
        bucket_ns = tuple(
            0
            if int(npb[:, b].max()) == 0
            else _pow2_at_least(int(npb[:, b].max()), 256)
            for b in range(NB)
        )
        M2 = int(np.asarray(dstart.shape[0])) // n  # per-shard length

        # oversize groups: host-chain per group, merge by gid below
        host_parts: dict[int, tuple] = {}
        anchors_all = (qs, ts, sm, qp, tp)
        descs_all = (dstart, dsize, dgid)
        for d in range(n):
            n_over = int(npb[d, NB])
            if n_over == 0:
                continue
            off_over = d * M2 + int(npb[d, :NB].sum())
            host_parts[d] = chain_oversize_groups_host(
                anchors_all, descs_all, off_over, n_over, int(k),
                base=d * M2,
            )

        out: dict[int, np.ndarray] = {}
        if any(bucket_ns):
            step2 = _chain_lis_step(
                self.mesh, bucket_ns, int(k), replicate=_multiprocess()
            )
            shard2 = NamedSharding(
                self.mesh, P(_mesh_axis(self.mesh), None)
            )
            stacked, counts = step2(
                qs, ts, sm, qp, tp, dstart, dsize, dgid,
                jax.device_put(jnp.asarray(offs), shard2),
                jax.device_put(
                    jnp.asarray(npb[:, :NB].copy()), shard2
                ),
            )
            stacked = np.asarray(stacked)  # [8, n * cap] (gid-led)
            counts = np.asarray(counts)  # [n]
            cap = stacked.shape[1] // n
        else:
            stacked = np.zeros((8, 0), np.int64)
            counts = np.zeros(n, np.int64)
            cap = 0

        empty8 = tuple(np.zeros(0, np.int64) for _ in range(8))
        for d in range(n):
            c = int(counts[d])
            hr, hg = host_parts.get(d, (None, None))
            if c == 0 and (hr is None or not hr.size):
                continue
            cols = (
                stacked[:, d * cap : d * cap + c] if c else empty8
            )
            out.update(_assemble_overlaps(cols, c, hr, hg))
        return out

    # ------------------------------------------------------------- host view
    def to_host(self):
        """Materialize hash-sorted host columns (generic lookup fallback)."""
        key = np.asarray(self._key)
        rid = np.asarray(self._rid)
        packed = np.asarray(self._packed)
        valid = key != np.uint32(UINT32_INF)
        key, rid, packed = key[valid], rid[valid], packed[valid]
        order = np.argsort(key, kind="stable")
        key, rid, packed = key[order], rid[order], packed[order]
        pos = (packed & _POS_MASK).astype(np.uint32)
        strand = ((packed >> _STRAND_BIT) & 1).astype(np.uint8)
        flags = (
            ((packed >> _FLAG_BIT) & 1).astype(bool)
            if self.has_flags
            else None
        )
        return key.astype(np.uint64), rid.astype(np.uint32), pos, strand, flags
