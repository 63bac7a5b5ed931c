"""Device (k,w)-minimizer sketching over padded read batches.

The JAX/VPU implementation of raven_tpu.overlap.minimizer: k-mer values are
built with k shifted adds over the [B, L] code batch, canonical hashing is
the masked avalanche mix in uint32 lanes (bit-identical to the uint64 host
path for 2k <= 30 — every step is congruent mod 2^(2k)), and robust
winnowing is two w-wide shifted-reduction passes (window min, then covering
max).  Everything is elementwise — no gathers — so XLA maps it straight
onto the VPU at HBM bandwidth.

This replaces the `ram` dependency's Minimize loop (reference
construct.cc:42,363) as the overlap phase's hot kernel.
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

UINT32_INF = np.uint32(0xFFFFFFFF)

# Segment rows of one read never cross a multiple-of-CHUNK_ALIGN row
# boundary (pad rows fill the gap).  The device index sketches in chunks
# of at most CHUNK_ALIGN rows (device_index._chunk_sketch_compact), and
# read-aligned chunks let it compute per-read minhash ranks INSIDE the
# chunk pass — the separate full-index (read, hash, pos) flags sort was
# the build's single largest cost.  Waste: <= a few rows per boundary
# (reads are ~5 rows), < 0.1%.
CHUNK_ALIGN = 8192


def align_row_starts(segs: np.ndarray, align: int = CHUNK_ALIGN):
    """Row start per read such that no read's rows cross a
    multiple-of-`align` row boundary.  Returns (starts [n] int64,
    total_rows).  Reads longer than align rows (~16.6 Gb at width 2048)
    are unsupported."""
    segs = np.asarray(segs, dtype=np.int64)
    n = segs.size
    if n == 0:
        return np.zeros(0, dtype=np.int64), 0
    assert int(segs.max(initial=0)) <= align, "read exceeds one chunk"
    c = np.cumsum(segs)
    starts_un = c - segs
    pad_at = np.zeros(n, dtype=np.int64)
    off = 0
    b_end = align
    total = int(c[-1])
    while b_end < total + off:
        j = int(np.searchsorted(c, b_end - off, side="left"))
        if j >= n:
            break
        if int(starts_un[j]) + off < b_end < int(c[j]) + off:
            pad = b_end - (int(starts_un[j]) + off)
            pad_at[j] += pad
            off += pad
        b_end += align
    return starts_un + np.cumsum(pad_at), total + off


def segment_reads(
    readset, ids: np.ndarray, k: int, w: int, width: int = 2048
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tile reads into fixed-width halo'd segments for sketch_segments_kernel.

    Returns (codes [S, width] u32, eff_lens, read_ids, base_offsets,
    claim_lo, claim_hi) — all int32 except codes.
    """
    halo = (k - 1) + 2 * (w - 1)
    stride = width - halo
    assert stride > 0
    rows = []
    meta = []
    pad_meta = (0, 0, 0, 0, 0)  # eff 0 -> every entry masked out
    for i in ids:
        i = int(i)
        n = int(readset.lengths[i])
        if n < k + w - 1:
            continue
        segs = 1 + max(0, -(-(n - width) // stride))
        used = len(rows) % CHUNK_ALIGN
        if used + segs > CHUNK_ALIGN:  # read would straddle a chunk edge
            for _ in range(CHUNK_ALIGN - used):
                rows.append(np.zeros(0, dtype=np.uint8))
                meta.append(pad_meta)
        s = 0
        seg_idx = 0
        while True:
            codes = readset.sequence(i, s, min(width, n - s))
            rows.append(codes)
            last = s + width >= n
            c_lo = 0 if seg_idx == 0 else w - 1
            # the final segment reaches the read end: claim its whole tail
            c_hi = width if last else (w - 1) + stride
            meta.append((codes.size, i, s, c_lo, c_hi))
            if last:
                break
            s += stride
            seg_idx += 1
    S = len(rows)
    out = np.zeros((S, width), dtype=np.uint8)
    for r, codes in enumerate(rows):
        out[r, : codes.size] = codes
    m = np.array(meta, dtype=np.int32).reshape(S, 5)
    return out, m[:, 0], m[:, 1], m[:, 2], m[:, 3], m[:, 4]


def segment_reads_packed(
    readset, ids: np.ndarray, k: int, w: int, width: int = 2048
):
    """segment_reads followed by 2-bit packing (4 bases/byte), as one
    native C++ pass when the readset stores flat SoA codes.

    Returns (packed [S, width//4] uint8, eff, rids, base, clo, chi).
    The packed rows feed the device index h2d upload directly
    (overlap/device_index.py) — the python segment + pack pair was the
    serial host head of the device overlap stage (~5 s of a ~9 s steady
    stage at 115 Mbp)."""
    ids = np.ascontiguousarray(np.asarray(ids, dtype=np.int64))
    halo = (k - 1) + 2 * (w - 1)
    stride = width - halo
    assert stride > 0 and width % 4 == 0

    codes_flat = getattr(readset, "codes", None)
    starts = getattr(readset, "starts", None)
    native = None
    if (
        isinstance(codes_flat, np.ndarray)
        and isinstance(starts, np.ndarray)
        and codes_flat.dtype == np.uint8
        and codes_flat.flags.c_contiguous
    ):
        from raven_tpu import native as native_mod

        native = native_mod.get_lib()
    if native is not None and hasattr(native, "raven_segment_pack"):
        import ctypes
        import os as _os

        lengths = np.ascontiguousarray(readset.lengths, dtype=np.int64)
        starts64 = np.ascontiguousarray(starts, dtype=np.int64)
        n = lengths[ids]
        segs = np.where(
            n < k + w - 1,
            0,
            1 + np.maximum(0, -(-(n - width) // stride)),
        ).astype(np.int64)
        row_starts, S = align_row_starts(segs)
        row_off = np.empty(ids.size + 1, dtype=np.int64)
        row_off[: ids.size] = row_starts
        row_off[ids.size] = S
        # gap (alignment pad) rows are never touched by the native pass:
        # zero-init everything — eff 0 masks every entry of a pad row
        packed = np.zeros((S, width // 4), dtype=np.uint8)
        eff = np.zeros(S, dtype=np.int32)
        rid = np.zeros(S, dtype=np.int32)
        base = np.zeros(S, dtype=np.int32)
        clo = np.zeros(S, dtype=np.int32)
        chi = np.zeros(S, dtype=np.int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        native.raven_segment_pack(
            codes_flat.ctypes.data_as(u8p),
            starts64.ctypes.data_as(i64p),
            lengths.ctypes.data_as(i64p),
            ids.ctypes.data_as(i64p),
            ctypes.c_longlong(ids.size),
            row_off.ctypes.data_as(i64p),
            ctypes.c_int(k),
            ctypes.c_int(w),
            ctypes.c_int(width),
            packed.ctypes.data_as(u8p),
            eff.ctypes.data_as(i32p),
            rid.ctypes.data_as(i32p),
            base.ctypes.data_as(i32p),
            clo.ctypes.data_as(i32p),
            chi.ctypes.data_as(i32p),
            ctypes.c_int(min(16, _os.cpu_count() or 1)),
        )
        return packed, eff, rid, base, clo, chi

    codes, eff, rids, base, clo, chi = segment_reads(
        readset, ids, k, w, width=width
    )
    S = codes.shape[0]
    c4 = codes.reshape(S, width // 4, 4)
    packed = (
        c4[..., 0] | (c4[..., 1] << 2) | (c4[..., 2] << 4) | (c4[..., 3] << 6)
    ).astype(np.uint8)
    return packed, eff, rids, base, clo, chi


if HAS_JAX:

    def _hash_mix32(key, mask):
        key = (~key + (key << 21)) & mask
        key = key ^ (key >> 24)
        key = (key + (key << 3) + (key << 8)) & mask
        key = key ^ (key >> 14)
        key = (key + (key << 2) + (key << 4)) & mask
        key = key ^ (key >> 28)
        key = (key + (key << 31)) & mask
        return key

    @functools.partial(jax.jit, static_argnames=("k", "w"))
    def sketch_kernel(codes, lengths, k: int, w: int):
        """codes: [B, L] uint32 (2-bit base codes); lengths: [B] int32.

        Returns (hash [B, L] uint32, strand [B, L] bool, keep [B, L] bool),
        indexed by k-mer start position; positions beyond length - k are
        masked out.
        """
        B, L = codes.shape
        codes = codes.astype(jnp.uint32)  # accept uint8 batches (4x smaller)
        mask = jnp.uint32((1 << (2 * k)) - 1)
        n = L - k + 1  # k-mer window count (static)

        fk = jnp.zeros((B, n), dtype=jnp.uint32)
        rk = jnp.zeros((B, n), dtype=jnp.uint32)
        for j in range(k):
            cj = jax.lax.dynamic_slice_in_dim(codes, j, n, axis=1)
            fk = fk | (cj << jnp.uint32(2 * (k - 1 - j)))
            rk = rk | ((cj ^ jnp.uint32(3)) << jnp.uint32(2 * j))

        ambiguous = fk == rk
        canonical = jnp.minimum(fk, rk)
        strand = fk <= rk
        h = _hash_mix32(canonical, mask)

        pos = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
        valid = pos <= (lengths[:, None] - k)
        hwin = jnp.where(ambiguous | ~valid, UINT32_INF, h)

        # sliding window min over w consecutive k-mer positions
        pad_inf = jnp.full((B, w - 1), UINT32_INF, jnp.uint32)
        hp = jnp.concatenate([hwin, pad_inf], axis=1)  # [B, n + w - 1]
        wmin = hp[:, :n]
        for t in range(1, w):
            wmin = jnp.minimum(wmin, hp[:, t : t + n])
        # window j valid iff its last position j + w - 1 is a valid k-mer
        wvalid = (pos + (w - 1)) <= (lengths[:, None] - k)
        wmin = jnp.where(wvalid, wmin, jnp.uint32(0))

        # covering max: position p is kept iff some window j in [p-w+1, p]
        # has wmin[j] == hwin[p]
        pad_zero = jnp.full((B, w - 1), 0, jnp.uint32)
        wp = jnp.concatenate([pad_zero, wmin], axis=1)  # index shift by w-1
        covmax = wp[:, :n]
        for t in range(1, w):
            covmax = jnp.maximum(covmax, wp[:, t : t + n])

        keep = (covmax == hwin) & ~ambiguous & (hwin != UINT32_INF)
        # pad back to [B, L] for a uniform layout
        padL = jnp.zeros((B, L - n), dtype=jnp.uint32)
        h_out = jnp.concatenate([h, padL], axis=1)
        strand_out = jnp.concatenate(
            [strand, jnp.zeros((B, L - n), bool)], axis=1
        )
        keep_out = jnp.concatenate([keep, jnp.zeros((B, L - n), bool)], axis=1)
        return h_out, strand_out, keep_out

    @functools.partial(jax.jit, static_argnames=("k", "w", "use_pallas"))
    def sketch_segments_kernel(
        codes,
        eff_lens,
        read_ids,
        base_offsets,
        claim_lo,
        claim_hi,
        k: int,
        w: int,
        use_pallas: bool = False,
    ):
        """Fixed-width segment sketching — the production TPU layout.

        Long reads are tiled into constant-width segments with a
        (k - 1 + 2(w - 1))-base halo so every winnowing decision has its
        full window context in-segment; each segment claims the disjoint
        position range [claim_lo, claim_hi) and the union over segments
        reproduces the per-read sketch exactly (verified in tests against
        the host path).  One shape -> one compilation, no per-read padding.

        codes: [S, C] uint32; eff_lens: effective code count per segment
        (min(C, read_len - seg_start)); positions are globalized with
        base_offsets.  Returns flat (key, id, pos, strand) with UINT32_INF
        keys outside claims.
        """
        if use_pallas:
            from raven_tpu.ops.pallas_sketch import pallas_sketch

            h, strand, keep = pallas_sketch(codes, eff_lens, k, w)
            h = h.astype(jnp.uint32)
        else:
            h, strand, keep = sketch_kernel(codes, eff_lens, k, w)
        S, C = h.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (S, C), 1)
        claim = (pos >= claim_lo[:, None]) & (pos < claim_hi[:, None])
        key = jnp.where(keep & claim, h, UINT32_INF).reshape(-1)
        ids = jnp.broadcast_to(read_ids[:, None], (S, C)).reshape(-1)
        gpos = (pos + base_offsets[:, None]).reshape(-1)
        sb = strand.reshape(-1).astype(jnp.int32)
        return key, ids, gpos, sb

    @functools.partial(jax.jit, static_argnames=("k", "w", "capacity"))
    def sketch_compact_kernel(codes, lengths, read_ids, k: int, w: int, capacity: int):
        """Sketch + on-device compaction into (hash, id, pos, strand) sorted
        by hash, padded to `capacity` with UINT32_INF sentinels."""
        h, strand, keep = sketch_kernel(codes, lengths, k, w)
        B, L = h.shape
        key = jnp.where(keep, h, UINT32_INF).reshape(-1)
        ids = jnp.broadcast_to(read_ids[:, None], (B, L)).reshape(-1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1).reshape(-1)
        sb = strand.reshape(-1).astype(jnp.int32)
        key_s, ids_s, pos_s, sb_s = jax.lax.sort(
            (key, ids, pos, sb), num_keys=1
        )
        out = capacity
        return key_s[:out], ids_s[:out], pos_s[:out], sb_s[:out]
