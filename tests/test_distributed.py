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
