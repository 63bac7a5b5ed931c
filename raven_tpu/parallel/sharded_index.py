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

        from jax.experimental.shard_map import shard_map

        spec_axis = axis if isinstance(axis, str) else tuple(axis)
        return jax.jit(
            shard_map(
                step,
                mesh=mesh,
                in_specs=(P(spec_axis, None), P(spec_axis), P(spec_axis)),
                out_specs=P(),
                check_rep=False,
            )
        )
