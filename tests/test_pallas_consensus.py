"""Pallas fused consensus kernel vs the XLA fused_votes_kernel oracle.

Runs in interpreter mode on CPU (tests/conftest forces the cpu backend);
the identical kernel compiles for TPU via Mosaic (validated on hardware
by misc/tpu_smoke.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from raven_tpu.ops.consensus_device import (  # noqa: E402
    fused_votes_kernel,
    homopolymer_run_map,
)
from raven_tpu.ops import pallas_consensus as pc  # noqa: E402

pytestmark = pytest.mark.skipif(
    not pc.HAS_PALLAS, reason="pallas unavailable"
)


def _mk_case(rng, NWIN, T, Q, B, partial=True):
    cons_lens = rng.integers(T // 2, T - 4, NWIN).astype(np.int32)
    cons_arr = np.where(
        np.arange(T)[None, :] < cons_lens[:, None],
        rng.integers(0, 4, (NWIN, T)),
        -1,
    ).astype(np.int32)
    win_idx = (np.arange(B) % NWIN).astype(np.int32)
    frags = np.full((B, Q), -1, np.int32)
    q_lens = np.zeros(B, np.int32)
    wts = np.zeros((B, Q), np.int32)
    for b in range(B):
        cl = int(cons_lens[win_idx[b]])
        src = cons_arr[win_idx[b], :cl].astype(np.uint8)
        if partial and rng.random() < 0.3:
            r0 = int(rng.integers(0, cl // 2))
            r1 = int(rng.integers(r0 + cl // 4, cl + 1))
            src = src[r0:r1]
        keep = rng.random(src.size) >= 0.05
        s = src[keep]
        subs = rng.random(s.size) < 0.05
        s = np.where(subs, (s + 1) % 4, s)
        ins = rng.random(s.size) < 0.05
        s = np.repeat(s, 1 + ins.astype(np.int64))[: Q - 1]
        q_lens[b] = s.size
        frags[b, : s.size] = s
        wts[b, : s.size] = rng.integers(1, 60, s.size)
    # a padding fragment row (q_len 0)
    q_lens[-1] = 0
    frags[-1] = -1
    wts[-1] = 0
    cons_runs = homopolymer_run_map(cons_arr, cons_lens)
    return cons_arr, cons_lens, cons_runs, frags, q_lens, wts, win_idx


@pytest.mark.parametrize("shape", [(4, 128, 160, 32), (8, 256, 384, 64)])
def test_pallas_votes_match_xla(shape):
    NWIN, T, Q, B = shape
    rng = np.random.default_rng(17)
    case = _mk_case(rng, NWIN, T, Q, B)
    args = tuple(jnp.asarray(a) for a in case)

    bv0, iv0, cv0 = fused_votes_kernel(
        *args, T=T, Q=Q, STEPS=T + Q, NWIN=NWIN, band=0
    )
    bv1, iv1, cv1 = pc.fused_votes_pallas(
        *args, T=T, Q=Q, NWIN=NWIN, interpret=True
    )
    assert np.array_equal(np.asarray(cv0), np.asarray(cv1)), "cover"
    assert np.array_equal(np.asarray(bv0), np.asarray(bv1)), "base votes"
    assert np.array_equal(np.asarray(iv0), np.asarray(iv1)), "ins votes"
