"""Sharded overlap engine on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from raven_tpu.parallel.mesh import make_mesh

    return make_mesh(8)


def test_sharded_candidate_count_matches_host(mesh8, rng):
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from raven_tpu.parallel.sharded_index import sharded_candidate_step
    from raven_tpu.overlap.minimizer import minimize_read

    n = 8
    B, L = 16, 512
    k, w = 15, 5
    genome = rng.integers(0, 4, 4096).astype(np.uint32)
    codes = np.zeros((B, L), dtype=np.uint32)
    for b in range(B):
        s = int(rng.integers(0, genome.size - L))
        codes[b] = genome[s : s + L]
    lengths = np.full(B, L, dtype=np.int32)
    read_ids = np.arange(B, dtype=np.int32)

    axis = mesh8.axis_names[0]
    shard = NamedSharding(mesh8, P(axis))
    shard2 = NamedSharding(mesh8, P(axis, None))
    capacity = ((2 * L) // n) * n

    step = sharded_candidate_step(mesh8, k=k, w=w, capacity=capacity, occurrence=1000)
    pairs = int(
        step(
            jax.device_put(jnp.asarray(codes), shard2),
            jax.device_put(jnp.asarray(lengths), shard),
            jax.device_put(jnp.asarray(read_ids), shard),
        )
    )

    # host oracle: same candidate-count definition
    hashes = []
    for b in range(B):
        h, p, s = minimize_read(codes[b].astype(np.uint8), k, w)
        hashes.extend(h.tolist())
    hs = np.sort(np.array(hashes, dtype=np.uint64))
    lo = np.searchsorted(hs, hs, "left")
    hi = np.searchsorted(hs, hs, "right")
    expected = int(((hi - lo) - 1).sum() // 2)
    assert pairs == expected


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry2", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    # fused consensus kernel: (base_votes, ins_votes, cover); fragments
    # aligned to real windows must produce a positive vote mass
    base_votes, ins_votes, cover = out
    assert int(np.asarray(base_votes).sum()) > 0
    assert int(np.asarray(cover).sum()) > 0


def test_two_axis_mesh_candidate_count(rng):
    """('data', 'shard') mesh: the hash exchange spans both axes and the
    count matches the 1-axis result."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from raven_tpu.parallel.distributed import make_data_shard_mesh
    from raven_tpu.parallel.sharded_index import sharded_candidate_step

    mesh = make_data_shard_mesh(2, 4)
    B, L = 16, 512
    k, w = 15, 5
    genome = rng.integers(0, 4, 4096).astype(np.uint32)
    codes = np.zeros((B, L), dtype=np.uint32)
    for b in range(B):
        s = int(rng.integers(0, genome.size - L))
        codes[b] = genome[s : s + L]
    lengths = np.full(B, L, dtype=np.int32)
    read_ids = np.arange(B, dtype=np.int32)

    shard = NamedSharding(mesh, P(("data", "shard")))
    shard2 = NamedSharding(mesh, P(("data", "shard"), None))
    capacity = ((2 * L) // 8) * 8

    step = sharded_candidate_step(mesh, k=k, w=w, capacity=capacity, occurrence=1000)
    pairs = int(
        step(
            jax.device_put(jnp.asarray(codes), shard2),
            jax.device_put(jnp.asarray(lengths), shard),
            jax.device_put(jnp.asarray(read_ids), shard),
        )
    )

    from raven_tpu.overlap.minimizer import minimize_read

    hashes = []
    for b in range(B):
        h, p, s = minimize_read(codes[b].astype(np.uint8), k, w)
        hashes.extend(h.tolist())
    hs = np.sort(np.array(hashes, dtype=np.uint64))
    lo = np.searchsorted(hs, hs, "left")
    hi = np.searchsorted(hs, hs, "right")
    expected = int(((hi - lo) - 1).sum() // 2)
    assert pairs == expected
