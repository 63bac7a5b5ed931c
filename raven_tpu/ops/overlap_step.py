"""Single-device overlap-candidate kernels (METRIC/DRYRUN ONLY).

The PRODUCTION device overlap path is raven_tpu.overlap.device_index
(exact self-join with overflow-checked capacities, digest-identical to
the host path).  The kernels here serve the compile-check entry point
and quick throughput metrics:

  * overlap_candidates_kernel — sketch + sorted-index join emitting
    capped candidate matches (hits beyond `max_hits` per minimizer are
    DROPPED, no overflow signal);
  * candidate_count_kernel / join_count_filtered_kernel — candidate-pair
    COUNTS; candidate_count_kernel is knowingly approximate when one
    read repeats a hash within a bucket.

None of these may back a correctness path — anything feeding the
assembler must go through device_index / sharded_index, whose capacity
overflows are detected and fall back to the host join.
"""

from __future__ import annotations

import functools

import numpy as np

try:
    import jax
    import jax.numpy as jnp

    from raven_tpu.utils.jaxcfg import ensure_jax_cache

    ensure_jax_cache()  # persistent compile cache (jax may be preloaded)
    HAS_JAX = True
except Exception:  # pragma: no cover
    HAS_JAX = False

from raven_tpu.ops.sketch import UINT32_INF

if HAS_JAX:
    from raven_tpu.ops.sketch import sketch_kernel

    @functools.partial(
        jax.jit, static_argnames=("k", "w", "capacity", "max_hits")
    )
    def overlap_candidates_kernel(
        codes,
        lengths,
        read_ids,
        k: int,
        w: int,
        capacity: int,
        max_hits: int,
        occurrence: int,
    ):
        """All-vs-all candidate matches for one read batch.

        Returns (q_id, q_pos, t_id, t_pos, same_strand, valid_mask), each
        [capacity * max_hits], plus the total number of candidate pairs.
        """
        B, L = codes.shape
        h, strand, keep = sketch_kernel(codes, lengths, k, w)

        key = jnp.where(keep, h, UINT32_INF).reshape(-1)
        ids = jnp.broadcast_to(read_ids[:, None], (B, L)).reshape(-1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1).reshape(-1)
        sb = strand.reshape(-1).astype(jnp.int32)

        key_s, ids_s, pos_s, sb_s = jax.lax.sort(
            (key, ids, pos, sb), num_keys=1
        )
        key_s = key_s[:capacity]
        ids_s = ids_s[:capacity]
        pos_s = pos_s[:capacity]
        sb_s = sb_s[:capacity]

        # query minimizers = the index entries themselves (all-vs-all)
        lo = jnp.searchsorted(key_s, key_s, side="left")
        hi = jnp.searchsorted(key_s, key_s, side="right")
        counts = hi - lo
        q_valid = (key_s != UINT32_INF) & (counts <= occurrence)

        # capped hit expansion: for each query entry, take up to max_hits
        # index slots starting at lo
        offs = jnp.arange(max_hits, dtype=jnp.int32)
        slot = lo[:, None] + offs[None, :]  # [capacity, max_hits]
        in_range = slot < hi[:, None]
        slot = jnp.clip(slot, 0, capacity - 1)
        t_id = ids_s[slot]
        t_pos = pos_s[slot]
        t_sb = sb_s[slot]

        q_id = jnp.broadcast_to(ids_s[:, None], slot.shape)
        q_pos = jnp.broadcast_to(pos_s[:, None], slot.shape)
        q_sb = jnp.broadcast_to(sb_s[:, None], slot.shape)

        valid = (
            in_range
            & q_valid[:, None]
            & (t_id > q_id)  # avoid_equal + avoid_symmetric (construct.cc:62)
        )
        same = (t_sb == q_sb).astype(jnp.int32)
        num_pairs = valid.sum()
        return (
            q_id.reshape(-1),
            q_pos.reshape(-1),
            t_id.reshape(-1),
            t_pos.reshape(-1),
            same.reshape(-1),
            valid.reshape(-1),
            num_pairs,
        )

    @functools.partial(jax.jit, static_argnames=("k", "w", "capacity"))
    def candidate_count_kernel(
        codes, lengths, read_ids, k: int, w: int, capacity: int, occurrence: int
    ):
        """Pairs/s benchmark core: candidate pair count without
        materializing matches (pure sketch + sort + join)."""
        B, L = codes.shape
        h, strand, keep = sketch_kernel(codes, lengths, k, w)
        key = jnp.where(keep, h, UINT32_INF).reshape(-1)
        ids = jnp.broadcast_to(read_ids[:, None], (B, L)).reshape(-1)
        key_s, ids_s = jax.lax.sort((key, ids), num_keys=1)
        key_s = key_s[:capacity]
        ids_s = ids_s[:capacity]
        lo = jnp.searchsorted(key_s, key_s, side="left")
        hi = jnp.searchsorted(key_s, key_s, side="right")
        counts = hi - lo
        q_valid = (key_s != UINT32_INF) & (counts <= occurrence)
        # pairs where target id > query id, computed exactly per bucket:
        # entries of one bucket share a hash; for a bucket of size c the
        # number of ordered (q, t>q) pairs is c*(c-1)/2 when ids are unique;
        # with duplicate ids the exact count needs the per-id breakdown, so
        # we report the standard candidate metric sum over entries of
        # (bucket_size - 1) / 2.
        per_entry = jnp.where(q_valid, counts - 1, 0)
        return per_entry.sum() // 2


if HAS_JAX:

    @functools.partial(jax.jit, static_argnames=("max_occurrence",))
    def join_count_filtered_kernel(keys, blacklist, max_occurrence: int):
        """Candidate-pair count with frequent minimizers pre-filtered.

        `blacklist` is the (small, sorted) set of hashes whose bucket size
        exceeds the occurrence threshold (host-computed, exactly ram's
        Filter semantics).  After blacklisting, every surviving run has
        length <= max_occurrence, so the pair count is an exact sum of
        shifted equalities: sum_{d=1..max} #{i : key[i] == key[i-d]} —
        pure elementwise compares over the sorted keys, no scans and no
        large-array gathers (both of which choke the compiler at 10^8
        elements).  The binary search into the blacklist touches only a
        VMEM-resident array.
        """
        (key_s,) = jax.lax.sort((keys,), num_keys=1)
        bl_lo = jnp.searchsorted(blacklist, key_s, side="left")
        bl_lo = jnp.clip(bl_lo, 0, blacklist.shape[0] - 1)
        blacklisted = blacklist[bl_lo] == key_s
        key_s = jnp.where(
            blacklisted | (key_s == UINT32_INF), UINT32_INF, key_s
        )
        # shape-uniform shifted compares: front-pad with the sentinel so
        # every distance uses the same slice length (compile stays linear)
        n = key_s.shape[0]
        maxd = max_occurrence
        key_p = jnp.concatenate(
            [jnp.full(maxd, UINT32_INF, jnp.uint32), key_s]
        )
        head = key_p[maxd:]
        alive = head != UINT32_INF
        total = jnp.int32(0)
        for d in range(1, maxd + 1):
            eq = (head == key_p[maxd - d : maxd - d + n]) & alive
            total = total + eq.sum(dtype=jnp.int32)
        return total

    @jax.jit
    def join_count_kernel(keys, ids, occurrence):
        """Sort concatenated minimizer keys and count candidate pairs.

        Gather-free formulation (binary-searching a 10^8-element array per
        entry overwhelms the TPU's gather path): after the sort, equal keys
        form runs; each entry's in-run rank (= pairs with earlier entries)
        comes from a forward cummax over boundary positions, run lengths
        from an additional backward scan, all VPU-friendly scans.
        """
        del ids  # pair counting needs keys only
        (key_s,) = jax.lax.sort((keys,), num_keys=1)
        n = key_s.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        new = jnp.concatenate(
            [jnp.ones(1, bool), key_s[1:] != key_s[:-1]]
        )
        start = jax.lax.cummax(jnp.where(new, idx, jnp.int32(-1)))
        nxt = jax.lax.cummin(
            jnp.concatenate(
                [
                    jnp.where(new[1:], idx[1:], jnp.int32(n)),
                    jnp.full(1, n, jnp.int32),
                ]
            ),
            reverse=True,
        )
        run_len = nxt - start
        rank = idx - start
        valid = (key_s != UINT32_INF) & (run_len <= occurrence)
        return jnp.where(valid, rank, 0).sum()  # < 2^31 pairs per call


def estimate_occurrence(counts: np.ndarray, freq: float) -> int:
    if counts.size == 0 or freq <= 0:
        return np.iinfo(np.int64).max
    srt = np.sort(counts)
    idx = min(int((1.0 - freq) * srt.size), srt.size - 1)
    return int(srt[idx])
