#!/usr/bin/env python3
"""Multi-process scaling-efficiency harness for the sharded overlap step.

Launches real jax.distributed CPU clusters (misc/distributed_worker.py,
gloo collectives) at increasing process counts and reports per-process
throughput plus parallel efficiency vs the 1-process run.  The north-star
target (BASELINE.md) is >= 80% weak-scaling efficiency on >= 2 hosts; on
TPU pods the same worker logic runs with the processes' local devices
being real chips.

  python misc/scaling_bench.py [--procs 1,2] [--devices-per-proc 4]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "misc", "distributed_worker.py")


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_cluster(nproc: int, dev_per_proc: int) -> list[dict]:
    coord = f"127.0.0.1:{free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), coord,
             str(dev_per_proc)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(nproc)
    ]
    recs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{err[-2000:]}")
        recs.append(json.loads(out.strip().splitlines()[-1]))
    return recs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2")
    ap.add_argument("--devices-per-proc", type=int, default=4)
    args = ap.parse_args()

    base_per_dev = None
    for nproc in [int(x) for x in args.procs.split(",")]:
        recs = run_cluster(nproc, args.devices_per_proc)
        rate = recs[0]["pairs_per_s"]  # replicated result; any process
        ndev = recs[0]["ndev"]
        for r in recs:
            print(f"  proc {r['pid']}/{r['nproc']}: "
                  f"{r['pairs_per_s']:,} pairs/s ({r['ndev']} devices)",
                  file=sys.stderr)
        # fixed global workload (strong scaling): efficiency = speedup
        # over the smallest cluster divided by the device ratio
        per_dev = rate / ndev
        if base_per_dev is None:
            base_per_dev = per_dev
        print(json.dumps({
            "nproc": nproc,
            "ndev": ndev,
            "pairs_per_s": rate,
            "strong_scaling_efficiency": round(per_dev / base_per_dev, 3),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
