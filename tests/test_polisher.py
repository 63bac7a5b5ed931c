import numpy as np
import pytest

from raven_tpu.io import ReadSet
from raven_tpu.polish.polisher import Polisher
from tests.conftest import random_genome, sample_reads


@pytest.fixture(scope="module")
def setup(rng):
    genome = random_genome(rng, 12000)
    reads, _ = sample_reads(rng, genome, 60, 3000, error=0.05)
    rs = ReadSet.from_sequences(reads)
    from raven_tpu.io import encode

    # target = raw draft with ONT-like errors (as an unpolished contig)
    g = encode(genome)
    draft = []
    for c in g:
        r = rng.random()
        if r < 0.02:
            continue  # deletion
        if r < 0.04:
            draft.append(int(rng.integers(0, 4)))  # insertion
        if r < 0.07:
            draft.append((int(c) + 1) % 4)  # substitution
        else:
            draft.append(int(c))
    draft = np.array(draft, dtype=np.uint8)
    return genome, rs, draft


def test_find_overlaps_coverage(setup):
    genome, rs, draft = setup
    p = Polisher()
    targets = [("Ctg0", draft)]
    overlaps = p._find_overlaps(targets, rs)
    # nearly all reads should map (clean simulation)
    assert len(overlaps) > 0.8 * len(rs)
    for o, (aq, at) in overlaps[:5]:
        assert o["rhs_id"] == 0
        assert aq.size >= 4  # chain anchors present


def test_fragments_cover_windows(setup):
    genome, rs, draft = setup
    p = Polisher()
    targets = [("Ctg0", draft)]
    overlaps = p._find_overlaps(targets, rs)
    frag_map = p._fragments(overlaps, targets, rs)
    windows = frag_map[0]
    n_windows = (draft.size + 499) // 500
    covered = sum(1 for w in range(n_windows) if len(windows.get(w, [])) >= 2)
    assert covered >= 0.9 * n_windows


def test_polish_improves_draft(setup):
    from raven_tpu.ops.edit_distance import edit_distance
    from raven_tpu.io import encode

    genome, rs, draft = setup
    p = Polisher()
    results = p.polish([("Ctg0", draft)], rs)
    assert len(results) == 1
    name, polished = results[0]
    assert name.startswith("Ctg0 XC:f:")
    fraction = float(name.rsplit(":", 1)[1])
    assert fraction > 0.8
    g = encode(genome)
    # interior accuracy: polishing must fix most draft errors (contig-end
    # windows may trim low-support tails, racon-like)
    assert edit_distance(polished, g) < edit_distance(draft, g) * 0.5


def test_polish_include_unpolished(setup, rng):
    genome, rs, draft = setup
    p = Polisher()
    # an unrelated target gets no fragments
    junk = rng.integers(0, 4, 3000).astype(np.uint8)
    results = p.polish([("Ctg2", junk)], rs, include_unpolished=False)
    assert results == []
    results = p.polish([("Ctg2", junk)], rs, include_unpolished=True)
    assert len(results) == 1
    assert results[0][0].endswith("0.000000")


def test_device_cfg_knobs_consumed(setup, monkeypatch):
    """DeviceCfg knobs must actually change the consensus dispatch
    (reference CUDA knobs at main.cc:83-93 are functional likewise)."""
    from raven_tpu.config import DeviceCfg

    genome, rs, draft = setup
    calls = {}

    def fake_device_consensus(windows, iterations=2, **kwargs):
        calls["kwargs"] = kwargs
        from raven_tpu.ops.poa import poa_consensus

        return [
        poa_consensus(b, f, w, 3, -5, -4, True)
        for b, f, w, *_ in windows
    ]

    import raven_tpu.ops.consensus_device as cd

    monkeypatch.setattr(cd, "device_window_consensus", fake_device_consensus)
    p = Polisher(device_cfg=DeviceCfg(poa_batches=2, banded_alignment=True))
    p.use_device = False  # would normally skip the device path on CPU...
    p.use_device_consensus = False
    res = p.polish([("Ctg0", draft)], rs)
    # ...but poa_batches > 0 forces it, with chunk and band wired through
    assert calls["kwargs"] == {"chunk": 512, "banded": True}
    assert len(res) == 1


def test_threads_flag_controls_worker_count():
    from raven_tpu.config import GLOBALS, worker_count

    old = GLOBALS.num_threads
    try:
        GLOBALS.num_threads = 3
        assert worker_count() == 3
        GLOBALS.num_threads = None
        import os

        assert worker_count() == min(os.cpu_count() or 1, 8)
    finally:
        GLOBALS.num_threads = old
