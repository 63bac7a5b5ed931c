#!/usr/bin/env python3
"""Repeat-machinery diagnosis on the planted-repeat dataset.

Instruments the stage -4 fixed point (reference construct.cc:493-559 /
pile.cc:230-369 equivalents) with ground truth from the simulator:
every read's genome span is known, so every overlap is classifiable as
TRUE (the two reads' genome intervals overlap) or FALSE (repeat-induced:
they only match through distinct copies of the planted repeat).

Questions this answers (VERDICT r03 item 3):
  1. Do find_repetitive_regions annotations fire on the repeat piles?
  2. Does update/check confirm them and drop the false overlaps?
  3. How many false overlaps survive into the assembly graph, and do the
     final unitigs cross distinct repeat copies?

Usage: python misc/repeat_diag.py [--dataset repeats] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from reference_compare import DATASETS, make_genome, simulate_reads  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classify_overlaps(ovl, truth, min_gap=0):
    """Boolean array: True where the overlap is genome-consistent (the two
    reads' truth intervals intersect); False = repeat-induced."""
    t = np.asarray(truth, dtype=np.int64)  # [n_reads, 3]
    li = ovl["lhs_id"].astype(np.int64)
    ri = ovl["rhs_id"].astype(np.int64)
    ls, le = t[li, 0], t[li, 1]
    rs, re = t[ri, 0], t[ri, 1]
    return (np.minimum(le, re) - np.maximum(ls, rs)) > min_gap


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="repeats")
    ap.add_argument("--json", default="")
    ap.add_argument(
        "--mirror", action="store_true",
        help="run the hand-instrumented reference-semantics fixed point "
        "(per-iteration forensics) instead of the production "
        "resolve_repeat_induced_overlaps (which includes the "
        "unanchored-read divergence)",
    )
    args = ap.parse_args()

    from raven_tpu import api
    from raven_tpu.config import OverlapPhaseCfg
    from raven_tpu.graph import Graph
    from raven_tpu.graph import construct as C
    from raven_tpu.graph import overlap_utils as ou
    from raven_tpu.io.readset import ReadSet
    from raven_tpu.overlap.engine import MinimizerIndex

    spec = DATASETS[args.dataset]
    rng = np.random.default_rng(spec["seed"])
    copies: list[int] = []
    genome = make_genome(
        rng, spec["size"], spec.get("repeats", 0), spec.get("repeat_len", 0),
        copies_out=copies,
    )
    truth: list[tuple[int, int, int]] = []
    reads = simulate_reads(
        rng, genome, spec["coverage"], spec["mean_len"], *spec["err"],
        truth_out=truth,
    )
    readset = ReadSet.from_sequences(reads)
    rep_len = spec.get("repeat_len", 0)
    print(
        f"dataset {args.dataset}: {len(reads)} reads, genome {genome.size}, "
        f"repeat copies at {copies} (len {rep_len})",
        file=sys.stderr,
    )
    report: dict = {"dataset": args.dataset, "copies": copies,
                    "repeat_len": rep_len}

    # which reads touch a repeat copy?
    t = np.asarray(truth, dtype=np.int64)
    in_rep = np.zeros(len(reads), dtype=bool)
    for at in copies:
        in_rep |= (t[:, 0] < at + rep_len) & (t[:, 1] > at)
    report["reads_touching_repeat"] = int(in_rep.sum())

    graph = Graph()
    cfg = OverlapPhaseCfg(use_minhash=True)
    index = MinimizerIndex(cfg.kmer_len, cfg.window_len)
    oh = api.OverlapsHandle(readset)
    t0 = time.perf_counter()
    api.find_overlaps_and_create_piles(
        index, readset, graph, oh, use_minhash=True
    )
    api.trim_and_annotate_piles(graph, oh)
    api.resolve_contained_reads(graph, oh, readset)
    api.resolve_chimeric_sequences(graph, oh)
    print(f"stage -5 done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    api.find_overlaps_and_repetitive_regions(index, graph, oh, readset)
    print(f"stage -4 map done in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    piles = graph.piles
    overlaps = oh.all_overlaps

    ok = classify_overlaps(overlaps, truth)
    report["pre_fixpoint"] = {
        "overlaps": int(overlaps.size),
        "false": int((~ok).sum()),
    }
    print(f"before fixed point: {overlaps.size} overlaps, "
          f"{int((~ok).sum())} false", file=sys.stderr)

    if not args.mirror:
        # production path — includes the unanchored-repeat-read
        # divergence (construct.DROP_UNANCHORED)
        report["drop_unanchored"] = C.DROP_UNANCHORED
        overlaps = C.resolve_repeat_induced_overlaps(
            piles, overlaps, readset
        )
        ok = classify_overlaps(overlaps, truth)
        report["post_fixpoint"] = {
            "overlaps": int(overlaps.size),
            "false": int((~ok).sum()),
            "invalid_reads": int(piles.is_invalid.sum()),
        }
        print(
            f"after production fixed point: {overlaps.size} overlaps, "
            f"{int((~ok).sum())} false, "
            f"{int(piles.is_invalid.sum())} invalidated reads",
            file=sys.stderr,
        )
        oh.all_overlaps = overlaps
        api.construct_assembly_graph(graph, oh, readset)
        false_edges = []
        for e in graph.edges:
            if e is None or (e.id & 1):
                continue
            i, j = e.tail.seq_id, e.head.seq_id
            lo = max(t[i, 0], t[j, 0])
            hi = min(t[i, 1], t[j, 1])
            if hi - lo <= 0:
                false_edges.append((int(i), int(j)))
        report["graph_false_edges"] = len(false_edges)
        report["graph_edges"] = sum(
            1 for e in graph.edges if e is not None and not (e.id & 1)
        )
        print(
            f"graph: {report['graph_edges']} fwd edges, "
            f"{len(false_edges)} genome-false",
            file=sys.stderr,
        )
        valid_meds = piles.median[~piles.is_invalid]
        gmed = float(np.median(valid_meds)) if valid_meds.size else 0.0
        print(f"global valid-read pile median: {gmed}", file=sys.stderr)
        for i, j in false_edges[:20]:
            msg = (
                f"  false edge read{i} {t[i].tolist()} <-> "
                f"read{j} {t[j].tolist()}"
            )
            for rid in (i, j):
                lo, hi = int(piles.begin[rid]), int(piles.end[rid])
                row = piles.row(rid)[lo:hi]
                frac = (
                    float(np.mean(row > 1.42 * gmed))
                    if hi > lo
                    else -1.0
                )
                km = piles.kmers.get(rid)
                kfrac = (
                    float(np.mean(km[lo:hi])) if km is not None and hi > lo
                    else 0.0
                )
                msg += (
                    f" | r{rid} med={int(piles.median[rid])}"
                    f" cov_frac={frac:.2f} kmer_frac={kfrac:.2f}"
                )
            print(msg, file=sys.stderr)
        # calibration: "clean window" anchor test — the minimum mark count
        # over any WIN-bin window of the valid region.  Anchored reads
        # (with >= 2 kb of unique sequence) have a near-zero window;
        # fully-repeat reads have marks spread everywhere.
        WIN = 128  # bins = 2048 bases

        def min_window_marks(rid):
            lo, hi = int(piles.begin[rid]), int(piles.end[rid])
            km = piles.kmers.get(rid)
            if km is None:
                return 0
            m = km[lo:hi].astype(np.int32)
            if m.size <= WIN:
                return int(m.sum())
            c = np.cumsum(np.concatenate([[0], m]))
            return int((c[WIN:] - c[:-WIN]).min())

        kfr = []
        false_ids = sorted({r for e in false_edges for r in e})
        for rid in range(piles.n):
            if piles.is_invalid[rid]:
                continue
            kfr.append(min_window_marks(rid))
        kfr = np.array(kfr)
        print(
            f"min-window({WIN} bins) marks over valid reads: "
            + ", ".join(
                f"p{q}={np.quantile(kfr, q / 100):.1f}"
                for q in (50, 90, 95, 99, 100)
            )
            + f"; n>2: {(kfr > 2).sum()}/{kfr.size}",
            file=sys.stderr,
        )
        for rid in false_ids:
            print(
                f"  false-edge read{rid}: min_window_marks="
                f"{min_window_marks(rid)}",
                file=sys.stderr,
            )
        if args.json:
            with open(args.json, "w") as f:
                json.dump(report, f, indent=1)
        print(json.dumps(report))
        return 0

    # ---- instrumented fixed point (mirrors construct.resolve_repeat_...)
    iters = []
    while True:
        components = ou.connected_components(overlaps, len(readset), piles)
        for comp in components:
            meds = piles.median[np.array(comp, dtype=np.int64)]
            k = meds.size // 2
            median = int(np.partition(meds, k)[k])
            for i in comp:
                piles.find_repetitive_regions(i, median)

        n_rep_reads = int(piles.is_repetitive.sum())
        n_regions = sum(len(r) for r in piles.repetitive_regions)

        side_ids = np.concatenate(
            [overlaps["lhs_id"], overlaps["rhs_id"]]).astype(np.int64)
        side_begins = np.concatenate(
            [overlaps["lhs_begin"], overlaps["rhs_begin"]]).astype(np.int64)
        side_ends = np.concatenate(
            [overlaps["lhs_end"], overlaps["rhs_end"]]).astype(np.int64)
        piles.update_repetitive_regions_batch(side_ids, side_begins, side_ends)
        n_confirmed = sum(
            sum(1 for rf, _ in regs if rf & 1)
            for regs in piles.repetitive_regions
        )

        blocked = piles.check_repetitive_regions_batch(
            side_ids, side_begins, side_ends
        )
        keep = ~(blocked[: overlaps.size] | blocked[overlaps.size:])
        ok = classify_overlaps(overlaps, truth)
        it = {
            "reads_repetitive": n_rep_reads,
            "regions": n_regions,
            "regions_confirmed": n_confirmed,
            "dropped": int((~keep).sum()),
            "dropped_true": int((~keep & ok).sum()),
            "dropped_false": int((~keep & ~ok).sum()),
            "kept_false": int((keep & ~ok).sum()),
        }
        iters.append(it)
        print(f"iter {len(iters)}: {it}", file=sys.stderr)
        changed = bool((~keep).any())
        overlaps = overlaps[keep]
        if not changed:
            break
        for comp in components:
            for i in comp:
                piles.clear_repetitive_regions(i)
    report["fixpoint_iters"] = iters

    ok = classify_overlaps(overlaps, truth)
    report["post_fixpoint"] = {
        "overlaps": int(overlaps.size),
        "false": int((~ok).sum()),
    }
    print(f"after fixed point: {overlaps.size} overlaps, "
          f"{int((~ok).sum())} false", file=sys.stderr)

    # why does each surviving false overlap evade the check?
    for o in overlaps[~ok][:40]:
        li, ri = int(o["lhs_id"]), int(o["rhs_id"])
        msg = (
            f"  kept-false {li}({t[li,0]}-{t[li,1]})"
            f"[{int(o['lhs_begin'])}:{int(o['lhs_end'])}] <-> "
            f"{ri}({t[ri,0]}-{t[ri,1]})"
            f"[{int(o['rhs_begin'])}:{int(o['rhs_end'])}]"
        )
        for side, rid in (("lhs", li), ("rhs", ri)):
            regs = piles.repetitive_regions[rid]
            lo, hi = int(piles.begin[rid]), int(piles.end[rid])
            msg += (
                f" | {side} pile[{lo<<4}:{hi<<4}] regs="
                + ",".join(
                    f"{(rf>>1)<<4}-{rs<<4}{'*' if rf & 1 else ''}"
                    for rf, rs in regs
                )
            )
        print(msg, file=sys.stderr)

    # ---- the graph: which dovetail edges are genome-false?
    oh.all_overlaps = overlaps
    api.construct_assembly_graph(graph, oh, readset)
    false_edges = []
    for e in graph.edges:
        if e is None or (e.id & 1):
            continue
        i, j = e.tail.seq_id, e.head.seq_id
        lo = max(t[i, 0], t[j, 0])
        hi = min(t[i, 1], t[j, 1])
        if hi - lo <= 0:
            false_edges.append((int(i), int(j)))
    report["graph_false_edges"] = len(false_edges)
    report["graph_edges"] = sum(
        1 for e in graph.edges if e is not None and not (e.id & 1)
    )
    print(f"graph: {report['graph_edges']} fwd edges, "
          f"{len(false_edges)} genome-false", file=sys.stderr)
    if false_edges[:20]:
        for i, j in false_edges[:20]:
            print(
                f"  false edge read{i} {t[i].tolist()} <-> "
                f"read{j} {t[j].tolist()} "
                f"rep_i={bool(piles.is_repetitive[i])} "
                f"rep_j={bool(piles.is_repetitive[j])}",
                file=sys.stderr,
            )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
