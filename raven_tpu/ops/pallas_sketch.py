"""Pallas TPU kernel for (k,w)-minimizer segment sketching.

Fused single-pass version of raven_tpu.ops.sketch.sketch_kernel: one VMEM
round trip computes k-mer values, the canonical hash, and the winnowing
decision for a [BLOCK, WIDTH] tile of read segments — the pure-JAX version
materializes each intermediate in HBM, this kernel keeps them in VMEM.
Bit-identical to the host/XLA paths (tests/test_pallas_sketch.py).

Falls back transparently when Pallas is unavailable (CPU tests run the
kernel in interpreter mode).
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

UINT32_INF = np.uint32(0xFFFFFFFF)
BLOCK = 8  # segment rows per program


if HAS_PALLAS:

    def _hash_mix32(key, mask):
        # int32 lanes; every masked intermediate is non-negative so the
        # arithmetic right shifts equal the uint32 logical shifts
        key = (~key + (key << 21)) & mask
        key = key ^ (key >> 24)
        key = (key + (key << 3) + (key << 8)) & mask
        key = key ^ (key >> 14)
        key = (key + (key << 2) + (key << 4)) & mask
        key = key ^ (key >> 28)
        key = (key + (key << 31)) & mask
        return key

    def _sketch_tile_kernel(
        codes_ref, lengths_ref, hash_ref, strand_ref, keep_ref, *, k, w, L
    ):
        # everything runs in int32: Mosaic lacks unsigned vector min/max and
        # dislikes u32<->i32 vector casts.  Every value stays < 2^(2k) <=
        # 2^30, so int32 arithmetic (incl. arithmetic >>) is bit-identical
        # to the uint32 host path.
        n = L - k + 1
        codes = codes_ref[:]  # [B, L] int32
        B = codes.shape[0]
        mask = jnp.int32((1 << (2 * k)) - 1)

        # unaligned lane slices (codes[:, j:j+n]) miscompile on Mosaic for
        # some offsets; pltpu.roll + aligned slice is exact
        fk = jnp.zeros((B, n), dtype=jnp.int32)
        rk = jnp.zeros((B, n), dtype=jnp.int32)
        for j in range(k):
            cj = (
                codes[:, :n]
                if j == 0
                else pltpu.roll(codes, shift=L - j, axis=1)[:, :n]
            )
            fk = fk | (cj << (2 * (k - 1 - j)))
            rk = rk | ((cj ^ 3) << (2 * j))

        ambiguous = fk == rk
        canonical = jnp.minimum(fk, rk)
        strand = fk <= rk
        # the avalanche mix runs in uint32 (logical shifts); comparisons
        # elsewhere stay int32 (no unsigned vector min/max in Mosaic)
        h = _hash_mix32(
            canonical.astype(jnp.uint32), jnp.uint32(1 << (2 * k)) - 1
        ).astype(jnp.int32)

        lengths = lengths_ref[:]  # [B, 1] int32
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
        valid = pos <= (lengths - k)
        INT_INF = jnp.int32(0x7FFFFFFF)
        hwin = jnp.where(ambiguous | ~valid, INT_INF, h)

        # sliding min/max via rolls over an L-wide buffer (tail is the
        # sentinel / zero so wraparound lanes are inert; L - n = k - 1 >=
        # w - 1 keeps them clear of the valid range)
        pad_tail_inf = jnp.full((B, L - n), INT_INF, jnp.int32)
        hfull = jnp.concatenate([hwin, pad_tail_inf], axis=1)
        wmin = hfull[:, :n]
        for t in range(1, w):
            wmin = jnp.minimum(
                wmin, pltpu.roll(hfull, shift=L - t, axis=1)[:, :n]
            )
        wvalid = (pos + (w - 1)) <= (lengths - k)
        wmin = jnp.where(wvalid, wmin, jnp.int32(0))

        pad_tail_zero = jnp.zeros((B, L - n), jnp.int32)
        wfull = jnp.concatenate([wmin, pad_tail_zero], axis=1)
        covmax = wfull[:, :n]
        for t in range(1, w):
            covmax = jnp.maximum(
                covmax, pltpu.roll(wfull, shift=t, axis=1)[:, :n]
            )

        keep = (covmax == hwin) & ~ambiguous & (hwin != INT_INF)

        padL = jnp.zeros((B, L - n), dtype=jnp.int32)
        hash_ref[:] = jnp.concatenate([h, padL], axis=1)
        # int32 outputs via select (bool->int vector bitcasts don't
        # legalize; int8 stores would need (32, 128) tiles)
        pad0 = jnp.zeros((B, L - n), dtype=jnp.int32)
        strand_ref[:] = jnp.concatenate(
            [jnp.where(strand, jnp.int32(1), jnp.int32(0)), pad0], axis=1
        )
        keep_ref[:] = jnp.concatenate(
            [jnp.where(keep, jnp.int32(1), jnp.int32(0)), pad0], axis=1
        )

    @functools.partial(
        jax.jit, static_argnames=("k", "w", "interpret")
    )
    def pallas_sketch(codes, lengths, k: int, w: int, interpret: bool = False):
        """codes: [S, L] uint8/uint32; lengths [S].
        Returns (hash u32, strand bool, keep bool), all [S, L].

        S is padded up to a BLOCK multiple internally (a grid of S // BLOCK
        would silently skip the remainder rows — caught by misc/tpu_smoke.py
        on hardware; padded rows have length 0 so they emit nothing)."""
        S, L = codes.shape
        S_pad = -(-S // BLOCK) * BLOCK
        if S_pad != S:
            codes = jnp.pad(codes, ((0, S_pad - S), (0, 0)))
            lengths = jnp.pad(lengths, (0, S_pad - S))
        grid = (S_pad // BLOCK,)
        kernel = functools.partial(_sketch_tile_kernel, k=k, w=w, L=L)
        h, strand, keep = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (BLOCK, L), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (BLOCK, L), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (BLOCK, L), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (BLOCK, L), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S_pad, L), jnp.int32),
                jax.ShapeDtypeStruct((S_pad, L), jnp.int32),
                jax.ShapeDtypeStruct((S_pad, L), jnp.int32),
            ],
            interpret=interpret,
        )(
            codes.astype(jnp.int32),
            lengths.astype(jnp.int32).reshape(S_pad, 1),
        )
        return (
            h[:S].astype(jnp.uint32),
            strand[:S].astype(bool),
            keep[:S].astype(bool),
        )
