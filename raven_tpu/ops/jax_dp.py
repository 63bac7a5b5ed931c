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


if HAS_JAX:

    @functools.partial(jax.jit, static_argnames=("T", "Q"))
    def _rows_scan(tg, qr, rows_needed, T: int, Q: int):
        """Device twin of align_dp.batched_forward_rows: global
        edit-distance DP over a [B, Q+1] front, capturing the row after
        rows_needed[b] target characters."""
        B = tg.shape[0]
        idx = jnp.arange(Q + 1, dtype=jnp.int32)
        prev0 = jnp.broadcast_to(idx, (B, Q + 1)).astype(jnp.int32)
        out0 = prev0

        def step(carry, r):
            prev, out = carry
            tchar = jax.lax.dynamic_slice_in_dim(tg, r, 1, axis=1)  # [B,1]
            sub = prev[:, :-1] + jnp.where(qr != tchar, 1, 0)
            e = jnp.minimum(sub, prev[:, 1:] + 1)
            cur = jnp.concatenate(
                [jnp.full((B, 1), r + 1, jnp.int32), e], axis=1
            )
            cur = jax.lax.associative_scan(jnp.minimum, cur - idx, axis=1) + idx
            out = jnp.where((rows_needed == r + 1)[:, None], cur, out)
            return (cur, out), None

        (_, out), _ = jax.lax.scan(
            step, (prev0, out0), jnp.arange(T, dtype=jnp.int32)
        )
        return out


def _pow2(x: int, floor: int) -> int:
    b = floor
    while b < x:
        b *= 2
    return b


def boundary_crossings_device(
    targets: np.ndarray,
    t_lens: np.ndarray,
    queries: np.ndarray,
    q_lens: np.ndarray,
    crosses: np.ndarray,
) -> np.ndarray:
    """JAX-backed align_dp.batched_boundary_crossings (same contract).

    Two _rows_scan sweeps (forward + on reversed sequences) and a host
    combine; every shape is padded to power-of-two buckets so a polishing
    run reuses a handful of compiled programs.
    """
    B0, T0 = targets.shape
    Q0 = queries.shape[1]
    T = _pow2(max(T0, 1), 64)
    Q = _pow2(max(Q0, 1), 64)
    B = _pow2(B0, 256)
    tg = np.full((B, T), 250, dtype=np.uint8)
    tg[:B0, :T0] = targets
    qr = np.full((B, Q), 251, dtype=np.uint8)
    qr[:B0, :Q0] = queries
    rt = np.full((B, T), 250, dtype=np.uint8)
    rq = np.full((B, Q), 251, dtype=np.uint8)
    for b in range(B0):
        tl, ql = int(t_lens[b]), int(q_lens[b])
        rt[b, :tl] = targets[b, :tl][::-1]
        rq[b, :ql] = queries[b, :ql][::-1]
    cr = np.zeros(B, dtype=np.int32)
    cr[:B0] = crosses
    bk = np.zeros(B, dtype=np.int32)
    bk[:B0] = t_lens - crosses
    fwd = np.asarray(
        _rows_scan(jnp.asarray(tg), jnp.asarray(qr), jnp.asarray(cr), T, Q)
    )[:B0]
    bwd = np.asarray(
        _rows_scan(jnp.asarray(rt), jnp.asarray(rq), jnp.asarray(bk), T, Q)
    )[:B0]
    idx = np.arange(Q + 1, dtype=np.int64)
    j2 = q_lens[:, None].astype(np.int64) - idx[None, :]
    valid = j2 >= 0
    j2 = np.clip(j2, 0, Q)
    total = np.where(
        valid, fwd + bwd[np.arange(B0)[:, None], j2], np.int32(1 << 20)
    )
    return np.argmin(total, axis=1).astype(np.int64)


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
