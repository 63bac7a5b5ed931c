"""Second quality gate (round-3 verdict item 7): the lambda-tuned
consensus knobs frozen against a truth-known synthetic genome with
substitutions AND indels, asserted as an edit-distance-rate band.

Complements the lambda golden test: lambda is real ONT data with a
recorded reference golden; this gate is synthetic with an exact truth,
so quality regressions show as a rate, not a fixed constant.

Marked synthetic_e2e (deselected by default, run in CI next to the
lambda gate).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.synthetic_e2e

# polished ED rate band: measured ~0.006% on the 1 Mb repeats config
# (round 3); 0.05% leaves ~8x headroom while catching any real
# consensus regression (unpolished input error is ~5%)
ED_RATE_CEILING = 0.0005


def _load_harness():
    """Load misc/reference_compare.py (the simulator and the anchored-ED
    metric live there — one error model, one metric, no drift)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "reference_compare",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "misc",
            "reference_compare.py",
        ),
    )
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)
    return rc


def test_synthetic_polished_quality():
    from raven_tpu.config import OverlapPhaseCfg, PolishCfg
    from raven_tpu.graph import Graph, assemble, construct_graph
    from raven_tpu.graph.common import get_unitigs
    from raven_tpu.io.readset import ReadSet
    from raven_tpu.polish import polish

    rc = _load_harness()
    rng = np.random.default_rng(77)
    genome = rng.integers(0, 4, 400_000).astype(np.uint8)
    reads = rc.simulate_reads(
        rng, genome, 40, 9000, 0.025, 0.0125, 0.0125
    )
    rs = ReadSet.from_sequences(reads)

    graph = Graph()
    construct_graph(graph, rs, OverlapPhaseCfg(use_minhash=True))
    assemble(graph)
    polish(graph, rs, PolishCfg(num_rounds=2))
    unitigs = get_unitigs(graph, drop_unpolished=True)
    assert len(unitigs) == 1, f"expected 1 contig, got {len(unitigs)}"
    codes = unitigs[0].codes
    # linear genome: contig covers all but the low-coverage ends
    assert codes.size > 0.97 * genome.size

    # align against the assembled span (coverage dips shorten the ends);
    # reuse the compare harness's repeat-aware anchored-ED metric
    best, span = rc.contig_ed(codes, genome)
    rate = best / codes.size
    print(f"synthetic 400kb: contig {codes.size}, ED {best}, "
          f"rate {rate*100:.4f}%")
    assert rate <= ED_RATE_CEILING, (best, codes.size, rate)
