#!/usr/bin/env python3
"""Python-API demo, mirroring the reference PythonLib/example.py."""

import argparse

from raven_tpu import api

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="raven_tpu api demo")
    parser.add_argument("--polish", type=int, default=2)
    parser.add_argument("paths", type=str, nargs="+")
    args = parser.parse_args()

    readset = api.load_sequences(args.paths)
    graph = api.Graph()

    api.construct_graph(
        graph, readset, False, api.OverlapPhaseCfg(15, 5, 0.001, 0, 32)
    )
    api.assemble_graph(graph, False)
    api.polish_graph(
        graph,
        readset,
        False,
        api.PolishCfg(
            api.AlignCfg(3, -5, -4), api.DeviceCfg(0, 0, False), args.polish
        ),
    )
    api.graph_print_unitigs(graph, args.polish)
