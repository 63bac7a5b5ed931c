#!/usr/bin/env python3
"""Compare two per-stage parity dumps (see raven_tpu.utils.stagedump).

Usage: python misc/compare_stage_dumps.py RUN_A_DIR RUN_B_DIR

Prints the first stage whose statistics diverge (and every later divergent
stage), so a pipeline change that alters output quality localizes to the
stage that introduced it.  Exit code 0 = identical, 1 = divergence.
"""

from __future__ import annotations

import json
import sys


def load(d):
    recs = []
    with open(f"{d}/stages.jsonl") as f:
        for line in f:
            recs.append(json.loads(line))
    return recs


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    rc = 0
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra == rb:
            print(f"  ok   {ra['stage']}")
            continue
        rc = 1
        print(f"  DIFF {ra.get('stage')} vs {rb.get('stage')}")
        keys = sorted(set(ra) | set(rb))
        for k in keys:
            va, vb = ra.get(k), rb.get(k)
            if va != vb:
                print(f"       {k}: {va} != {vb}")
    if len(a) != len(b):
        rc = 1
        print(f"  DIFF record count {len(a)} != {len(b)}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
