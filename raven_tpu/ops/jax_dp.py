"""Batched infix-alignment DP as a JAX kernel.

Device implementation of raven_tpu.ops.align_dp.batched_infix_align: the
polisher's window-placement workhorse (and the "banded seed-extend DP" of
the north star).  The DP is a lax.scan over target rows; each row is a pure
vector op over [B, Q+1] with the horizontal closure computed by a log-depth
associative min-scan on packed (score, start) keys — so one dispatch aligns
every (read, window) piece of a polishing round.

Scores and start columns are packed into int32 lanes: ((val + 4096) << 13) |
start, valid for val in (-4096, 4096) and Q < 8192, which covers the 500 bp
windows (T <= 512, Q <= 1024) with huge margin.
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

_SHIFT = 13
_OFFSET = 4096
_BIG = 4000  # sentinel distance (< _OFFSET)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


if HAS_JAX:

    @functools.partial(jax.jit, static_argnames=("T", "Q"))
    def _infix_scan(targets, t_lens, queries, q_lens, T: int, Q: int):
        B = targets.shape[0]
        idx = jnp.arange(Q + 1, dtype=jnp.int32)

        def pack(val, start):
            return ((val + _OFFSET) << _SHIFT) | start

        def unpack(key):
            return (key >> _SHIFT) - _OFFSET, key & ((1 << _SHIFT) - 1)

        prev_v0 = jnp.zeros((B, Q + 1), dtype=jnp.int32)
        prev_s0 = jnp.broadcast_to(idx, (B, Q + 1)).astype(jnp.int32)
        res_v0 = jnp.where(
            (t_lens == 0)[:, None], prev_v0, jnp.full((B, Q + 1), _BIG, jnp.int32)
        )
        res_s0 = jnp.where((t_lens == 0)[:, None], prev_s0, 0)

        def row_step(carry, r):
            prev_v, prev_s, res_v, res_s = carry
            tchar = jax.lax.dynamic_slice_in_dim(targets, r, 1, axis=1)  # [B,1]
            sub_v = prev_v[:, :-1] + (queries != tchar).astype(jnp.int32)
            up_v = prev_v[:, 1:] + 1
            take_up = up_v < sub_v  # prefer diagonal on ties
            e_v = jnp.where(take_up, up_v, sub_v)
            e_s = jnp.where(take_up, prev_s[:, 1:], prev_s[:, :-1])
            cur_v = jnp.concatenate([prev_v[:, :1] + 1, e_v], axis=1)
            cur_s = jnp.concatenate([prev_s[:, :1], e_s], axis=1)
            key = pack(cur_v - idx, cur_s)
            key = jax.lax.associative_scan(jnp.minimum, key, axis=1)
            kv, ks = unpack(key)
            cur_v = kv + idx
            cur_s = ks
            hit = (t_lens == r + 1)[:, None]
            res_v = jnp.where(hit, cur_v, res_v)
            res_s = jnp.where(hit, cur_s, res_s)
            return (cur_v, cur_s, res_v, res_s), None

        (prev_v, prev_s, res_v, res_s), _ = jax.lax.scan(
            row_step,
            (prev_v0, prev_s0, res_v0, res_s0),
            jnp.arange(T, dtype=jnp.int32),
        )
        res_v = jnp.where(idx[None, :] > q_lens[:, None], _BIG, res_v)
        q_end = jnp.argmin(res_v, axis=1)
        rows = jnp.arange(B)
        return res_v[rows, q_end], res_s[rows, q_end], q_end


def infix_align_device(
    targets: np.ndarray,
    t_lens: np.ndarray,
    queries: np.ndarray,
    q_lens: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JAX-backed batched_infix_align; pads ALL shapes (batch included) to
    stable buckets to bound recompilation — each distinct shape is a full
    XLA compile, which dominates wall-time on remote-attached devices."""
    B0, T0 = targets.shape
    Q0 = queries.shape[1]
    # coarse, stable buckets: one compilation covers a whole polishing run
    T = 512 if T0 <= 512 else _round_up(T0, 512)
    Q = 1024 if Q0 <= 1024 else _round_up(Q0, 512)
    B = 1024
    while B < B0:
        B *= 2  # power-of-two buckets: at most log2 distinct compiles
    tg = np.zeros((B, T), dtype=np.int32)
    tg[:B0, :T0] = targets
    qr = np.full((B, Q), -1, dtype=np.int32)  # pad char never matches
    qr[:B0, :Q0] = queries
    tl = np.zeros(B, dtype=np.int32)
    tl[:B0] = t_lens
    ql = np.zeros(B, dtype=np.int32)
    ql[:B0] = q_lens
    dist, q_start, q_end = _infix_scan(
        jnp.asarray(tg),
        jnp.asarray(tl),
        jnp.asarray(qr),
        jnp.asarray(ql),
        T,
        Q,
    )
    return (
        np.asarray(dist, dtype=np.int64)[:B0],
        np.asarray(q_start, dtype=np.int64)[:B0],
        np.asarray(q_end, dtype=np.int64)[:B0],
    )
