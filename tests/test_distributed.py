"""Multi-process jax.distributed reality check (SURVEY §4 / §5.8).

Spawns TWO separate python processes that form a real jax.distributed
cluster over a local coordinator (CPU backend, gloo collectives, 4
virtual devices each -> one global 8-device mesh) and run the sharded
overlap candidate step across the process boundary.  Both processes must
agree with the single-process host oracle.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "misc", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _host_oracle_pairs() -> int:
    """Same workload + candidate-count definition as the worker."""
    from raven_tpu.overlap.minimizer import minimize_read

    B, L, k, w = 32, 512, 15, 5
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 4096).astype(np.uint32)
    hashes = []
    for _ in range(B):
        s = int(rng.integers(0, genome.size - L))
        h, _, _ = minimize_read(genome[s : s + L].astype(np.uint8), k, w)
        hashes.extend(h.tolist())
    hs = np.sort(np.array(hashes, dtype=np.uint64))
    lo = np.searchsorted(hs, hs, "left")
    hi = np.searchsorted(hs, hs, "right")
    return int(((hi - lo) - 1).sum() // 2)


def test_two_process_sharded_step():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coord, "4"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    expected = _host_oracle_pairs()
    for rec in outs:
        assert rec["nproc"] == 2
        assert rec["ndev"] == 8
        assert rec["pairs"] == expected, rec
        # sharded polish across the process boundary is bit-identical
        assert rec["consensus_ok"] is True, rec


def test_two_process_construct_end_to_end(tmp_path):
    """FULL construct under a real 2-process jax.distributed cluster
    (sharded index over the global mesh, device chaining, replicated
    host graph phases): every process must produce the same graph, and
    it must equal the single-process host-path construct."""
    import hashlib

    import numpy as np

    from tests.conftest import random_genome, sample_reads
    from raven_tpu.config import OverlapPhaseCfg
    from raven_tpu.graph import Graph, construct_graph
    from raven_tpu.io.readset import ReadSet

    # host oracle (same seed/workload as the worker script)
    rng = np.random.default_rng(2)
    genome = random_genome(rng, 16000)
    reads, _ = sample_reads(rng, genome, 70, 2200, error=0.04)
    rs = ReadSet.from_sequences(reads)
    os.environ["RAVEN_TPU_DEVICE_MAP"] = "0"
    try:
        g = Graph()
        construct_graph(g, rs, OverlapPhaseCfg(use_minhash=True))
    finally:
        del os.environ["RAVEN_TPU_DEVICE_MAP"]
    h = hashlib.sha256()
    for n in g.live_nodes():
        h.update(np.int64(n.id).tobytes())
        h.update(n.codes.tobytes())
    for e in g.live_edges():
        h.update(np.int64(e.id).tobytes())
        h.update(np.int64(e.length).tobytes())
    expected = h.hexdigest()

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(REPO, "misc", "distributed_construct_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    for rec in outs:
        assert rec["digest"] == expected, rec
