#!/usr/bin/env python3
"""Offline rendering of pile-o-grams and graph layouts.

Equivalent of the reference misc/plotter.py (:17-44 DrawPile, :46-64
DrawGraph): consumes the JSON pile dump written by
raven_tpu.graph.repr.print_json and the layout JSON written by
raven_tpu.graph.layout.create_force_directed_layout(path=...).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def draw_pile(name: str, pile: dict, out_dir: str) -> None:
    fig, ax = plt.subplots(figsize=(12, 4))
    data = pile["data_"]
    ax.plot(data, label="coverage", color="#4477AA")
    ax.axhline(pile["median_"], color="#228833", ls=":", label="median")
    ax.axvline(pile["begin_"], color="#666666", ls="--", lw=0.8)
    ax.axvline(pile["end_"], color="#666666", ls="--", lw=0.8)
    for lo, hi in pile.get("chimeric_regions_", []):
        ax.axvspan(lo >> 1 if lo > hi else lo, hi, color="#EE6677", alpha=0.3)
    for lo, hi in pile.get("repetitive_regions_", []):
        ax.axvspan(lo >> 1, hi, color="#CCBB44", alpha=0.3)
    ax.set_title(f"pile {name}  (median {pile['median_']})")
    ax.set_xlabel("position (16 bp bins)")
    ax.set_ylabel("coverage")
    ax.legend(loc="upper right", frameon=False)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"pile_{name}.png"), dpi=120)
    plt.close(fig)


def draw_graph(layout: dict, out_dir: str) -> None:
    for comp_name, comp in layout.items():
        fig, ax = plt.subplots(figsize=(8, 8))
        nodes = comp["nodes"]
        for a, b, kind in comp["edges"]:
            xa, ya = nodes[a][0], nodes[a][1]
            xb, yb = nodes[b][0], nodes[b][1]
            ax.plot(
                [xa, xb],
                [ya, yb],
                color="#CCBB44" if kind else "#777777",
                lw=0.6 if kind else 1.0,
                zorder=1,
            )
        xs = [v[0] for v in nodes.values()]
        ys = [v[1] for v in nodes.values()]
        cs = ["#EE6677" if v[2] else "#4477AA" for v in nodes.values()]
        ss = [10 + 2 * min(v[3], 40) for v in nodes.values()]
        ax.scatter(xs, ys, c=cs, s=ss, zorder=2)
        ax.set_title(comp_name)
        ax.set_aspect("equal")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{comp_name}.png"), dpi=120)
        plt.close(fig)


def main() -> int:
    p = argparse.ArgumentParser(description="raven-tpu plotter")
    p.add_argument("json_file", help="pile JSON (print_json) or layout JSON")
    p.add_argument("--mode", choices=["pile", "graph"], default="pile")
    p.add_argument("--out-dir", default=".")
    args = p.parse_args()

    with open(args.json_file) as fh:
        data = json.load(fh)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.mode == "pile":
        for name, pile in data.items():
            draw_pile(name, pile, args.out_dir)
    else:
        draw_graph(data, args.out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
