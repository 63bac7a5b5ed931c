"""Device chaining (ops/chain_device.py) vs the host chain: byte-exact
per-read overlap parity, including emission order, on the CPU backend
(conftest pins JAX_PLATFORMS=cpu; the same kernels compile for TPU)."""

import numpy as np
import pytest

from tests.conftest import random_genome, sample_reads
from raven_tpu.io.readset import ReadSet
from raven_tpu.overlap import chain as chain_mod
from raven_tpu.overlap.engine import MinimizerIndex

jax = pytest.importorskip("jax")
jnp = jax.numpy

from raven_tpu.ops import chain_device  # noqa: E402


def _host_chain(q_id, q_pos, t_id, t_pos, same, k):
    out = {}
    order = np.argsort(q_id, kind="stable")
    q_id = q_id[order]
    t_id, t_pos, same, q_pos = (
        t_id[order],
        t_pos[order],
        same[order],
        q_pos[order],
    )
    uniq, starts = np.unique(q_id, return_index=True)
    bounds = np.append(starts, q_id.size)
    for u, s0, s1 in zip(uniq, bounds[:-1], bounds[1:]):
        out[int(u)] = chain_mod.chain_matches(
            int(u),
            t_id[s0:s1].astype(np.uint32),
            same[s0:s1].astype(np.uint8),
            q_pos[s0:s1].astype(np.int64),
            t_pos[s0:s1].astype(np.int64),
            k,
        )
    return out


def _device_chain(q_id, q_pos, t_id, t_pos, same, k, pad=0):
    def dev(a, fill):
        a = np.asarray(a, np.int32)
        if pad:
            a = np.concatenate([a, np.full(pad, fill, np.int32)])
        return jnp.asarray(a)

    return chain_device.chain_matches_device(
        dev(q_id, -1),
        dev(q_pos, 0),
        dev(t_id, 0),
        dev(t_pos, 0),
        dev(same, 0),
        k,
    )


def _assert_same(dev_out, host_out):
    host_nonempty = {u: v for u, v in host_out.items() if v.size}
    assert set(dev_out) == set(host_nonempty)
    for u in host_nonempty:
        a, b = dev_out[u], host_nonempty[u]
        assert a.shape == b.shape, f"read {u}: {a.shape} vs {b.shape}"
        for f in b.dtype.names:
            assert np.array_equal(a[f], b[f]), f"read {u} field {f}"


def _synthetic_matches(rng, n, n_reads=12, n_targets=12, opposite=True):
    q_id = rng.integers(0, n_reads, n).astype(np.int64)
    t_id = rng.integers(n_reads, n_reads + n_targets, n).astype(np.int64)
    same = rng.integers(0, 2 if opposite else 1, n).astype(np.int64)
    same = same if opposite else np.ones(n, np.int64)
    q_pos = rng.integers(0, 30000, n).astype(np.int64)
    off = rng.integers(-180, 180, n)
    t_pos = np.where(
        same.astype(bool), q_pos + 4000 + off, 35000 - q_pos + off
    )
    t_pos = np.maximum(t_pos, 0).astype(np.int64)
    return q_id, q_pos, t_id, t_pos, same


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_chain_device_matches_host_random(seed):
    rng = np.random.default_rng(seed)
    m = _synthetic_matches(rng, 20000)
    dev = _device_chain(*m, 15)
    assert dev is not None
    _assert_same(dev, _host_chain(*m, 15))


def test_chain_device_sentinel_padding():
    """Padded rows (q_id < 0) must not affect the emitted overlaps."""
    rng = np.random.default_rng(7)
    m = _synthetic_matches(rng, 6000)
    dev = _device_chain(*m, 15, pad=517)
    assert dev is not None
    _assert_same(dev, _host_chain(*m, 15))


def test_chain_device_gap_split():
    """A chain broken by a > MAX_GAP jump must split into two overlaps
    exactly like the host path."""
    qpos, tpos = [], []
    for a in range(6):
        qpos.append(a * 40)
        tpos.append(5000 + a * 40)
    for a in range(6):
        qpos.append(a * 40 + 20000)  # > MAX_GAP jump on both axes
        tpos.append(25000 + a * 40)
    n = len(qpos)
    m = (
        np.zeros(n, np.int64),
        np.array(qpos, np.int64),
        np.ones(n, np.int64),
        np.array(tpos, np.int64),
        np.ones(n, np.int64),
    )
    dev = _device_chain(*m, 15)
    host = _host_chain(*m, 15)
    assert host[0].size == 2
    _assert_same(dev, host)


def test_chain_device_monster_group_host_merge():
    """A group larger than the top size bucket is chained per-group on
    the host and merged back in emission order — the batch no longer
    falls back wholesale (round-2 verdict item).  Mixed input: one
    monster group plus a normal group on another read."""
    n = chain_device.BUCKETS[-1] + 8
    q_id = [0] * n + [3] * 8
    q_pos = [a * 20 for a in range(n)] + [a * 40 for a in range(8)]
    t_id = [1] * n + [4] * 8
    t_pos = [a * 20 + 5000 for a in range(n)] + [
        a * 40 + 900 for a in range(8)
    ]
    same = [1] * (n + 8)
    m = tuple(
        np.array(c, np.int64) for c in (q_id, q_pos, t_id, t_pos, same)
    )
    dev = _device_chain(*m, 15)
    host = _host_chain(*m, 15)
    assert dev is not None
    _assert_same(dev, host)


def test_engine_device_chain_engages_and_matches(monkeypatch):
    """Through the full engine: the device-chained map_many result must be
    byte-identical (order included) to the host path's, and the device
    chain must actually have run."""
    rng = np.random.default_rng(11)
    genome = random_genome(rng, 50000)
    reads, _ = sample_reads(rng, genome, 100, mean_len=4000, error=0.08)
    rs = ReadSet.from_sequences(reads)
    ids = np.arange(len(rs))

    calls = []
    orig = chain_device.chain_from_prepared

    def spy(*a, **kw):
        r = orig(*a, **kw)
        calls.append(r is not None)
        return r

    monkeypatch.setattr(chain_device, "chain_from_prepared", spy)

    monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "1")
    monkeypatch.setenv("RAVEN_TPU_DEVICE_CHAIN", "1")
    dev = MinimizerIndex(15, 5)
    dev.minimize(rs, ids, minhash=False, with_query_flags=True)
    assert dev._device is not None
    dev.filter(0.001)
    rdev = dev.map_many(rs, ids, minhash=True)
    assert calls and calls[-1], "device chain did not engage"

    monkeypatch.setenv("RAVEN_TPU_DEVICE_MAP", "0")
    host = MinimizerIndex(15, 5)
    host.minimize(rs, ids, minhash=False, with_query_flags=True)
    host.filter(0.001)
    rhost = host.map_many(rs, ids, minhash=True)

    assert set(rdev) == set(rhost)
    for rid in rhost:
        a, b = rdev[rid], rhost[rid]
        assert a.shape == b.shape, rid
        for f in b.dtype.names:
            assert np.array_equal(a[f], b[f]), (rid, f)
