"""Golden end-to-end test on the bundled lambda-phage dataset.

Mirrors the reference integration test (RavenTest/src/raven_test.cpp:50-67):
full 3-phase pipeline with minhash on, then edit distance of the single
output unitig against the NC_001416 reference genome.  The reference's
golden value is exactly 1137 with its own ram/racon stack; our from-scratch
overlap/consensus implementations land in the same quality band, asserted
with an explicit ceiling so regressions are caught.

Marked slow: the pipeline plus two polishing rounds runs ~3 min on CPU.
Run with `pytest -m lambda_e2e` (deselected by default via addopts).
"""

import numpy as np
import pytest

from tests.conftest import requires_lambda

pytestmark = [requires_lambda, pytest.mark.lambda_e2e]

REFERENCE_GOLDEN_ED = 1137  # raven_test.cpp:66
# Host-only 2-round result is 1132 — better than the reference golden.  The
# gate is the reference's own number, so any regression below reference
# quality fails CI (the pipeline is deterministic; today's exact value is
# printed by the test and tracked in misc/lambda_eval.py runs).
ED_CEILING = REFERENCE_GOLDEN_ED


def test_lambda_assembly_golden(lambda_reads, lambda_truth):
    from raven_tpu.config import OverlapPhaseCfg, PolishCfg
    from raven_tpu.graph import Graph, assemble, construct_graph
    from raven_tpu.graph.common import get_unitigs
    from raven_tpu.io.readset import reverse_complement
    from raven_tpu.ops.edit_distance import edit_distance
    from raven_tpu.polish import polish

    graph = Graph()
    construct_graph(graph, lambda_reads, OverlapPhaseCfg(use_minhash=True))
    assemble(graph)
    polish(graph, lambda_reads, PolishCfg())

    unitigs = get_unitigs(graph, drop_unpolished=True)
    assert len(unitigs) == 1, "lambda must assemble into a single unitig"
    u = unitigs[0]

    truth = lambda_truth.sequence(0)
    ed = min(
        edit_distance(u.codes, truth),
        edit_distance(reverse_complement(u.codes), truth),
    )
    print(f"lambda unitig len {u.length}, ED vs truth {ed} "
          f"(reference golden {REFERENCE_GOLDEN_ED})")
    assert ed <= ED_CEILING
