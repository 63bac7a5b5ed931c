#!/usr/bin/env python3
"""Quality-iteration harness on the bundled lambda-phage dataset.

Runs the host pipeline (minhash, like the reference integration test) and
prints per-round contig length + edit distance against NC_001416.  The
post-assemble graph is cached to disk so polisher-only experiments skip
construct/assemble (delete /tmp/lambda_eval_cache.pkl after overlap-phase
changes).

  python misc/lambda_eval.py [--rounds N] [--device] [--no-cache]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

READS = "/root/reference/RavenTest/data/ERA476754.fastq.gz"
TRUTH = "/root/reference/RavenTest/data/NC_001416.fasta.gz"
CACHE = "/tmp/lambda_eval_cache.pkl"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--device", action="store_true", help="device consensus")
    ap.add_argument("--hybrid", action="store_true", help="device finish")
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    from raven_tpu.config import OverlapPhaseCfg
    from raven_tpu.graph import Graph, assemble, construct_graph
    from raven_tpu.graph.common import get_unitigs, unitig_record_name
    from raven_tpu.io import parse_file
    from raven_tpu.io.readset import reverse_complement
    from raven_tpu.ops.edit_distance import edit_distance
    from raven_tpu.polish.polisher import Polisher

    readset = parse_file(READS)
    truth = parse_file(TRUTH).sequence(0)

    t0 = time.perf_counter()
    if not args.no_cache and os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            graph = pickle.load(f)
        print(f"loaded cached graph {time.perf_counter()-t0:.1f}s")
    else:
        graph = Graph()
        construct_graph(graph, readset, OverlapPhaseCfg(use_minhash=True))
        assemble(graph)
        with open(CACHE, "wb") as f:
            pickle.dump(graph, f)
        print(f"construct+assemble {time.perf_counter()-t0:.1f}s")

    unitig_nodes = get_unitigs(graph)
    targets = [(unitig_record_name(n), n.codes) for n in unitig_nodes]

    # average dataset quality (polish.cc:26-41)
    avg_q = 0.0
    if readset.has_quality:
        for i in range(len(readset)):
            avg_q += readset.mean_quality(i)
        avg_q /= len(readset)

    polisher = Polisher(quality_threshold=avg_q)
    polisher.use_device_consensus = False

    def report(tag, codes):
        ed = min(
            edit_distance(codes, truth),
            edit_distance(reverse_complement(codes), truth),
        )
        print(f"{tag}: len {codes.size}, ED {ed}")
        return ed

    for r in range(args.rounds):
        use_dev = args.device or (args.hybrid and r == args.rounds - 1)
        polisher.use_device_consensus = bool(use_dev)
        t0 = time.perf_counter()
        results = polisher.polish(targets, readset, include_unpolished=False)
        dt = time.perf_counter() - t0
        # rotate circular contigs like polish() does
        new_targets = []
        name_to_node = {n.name: n for n in unitig_nodes}
        for name, codes in results:
            node = name_to_node.get(name.split()[0])
            if node is not None and node.is_circular:
                b = int(0.42 * codes.size)
                codes = np.concatenate([codes[b:], codes[:b]])
            new_targets.append((name, codes))
        targets = new_targets
        print(f"round {r} ({'device' if use_dev else 'host'}, {dt:.1f}s):")
        for name, codes in targets:
            report(f"  {name.split()[0]}", codes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
