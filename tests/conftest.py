"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on XLA's
host-platform device emulation instead (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the harness presets 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

try:
    import jax

    # jax is preloaded at interpreter startup in this image, so the env vars
    # above are too late for it — force the platform via config (must happen
    # before any backend is initialized).
    jax.config.update("jax_platforms", "cpu")
    # persistent XLA compile cache: kernels compile once across test runs
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/raven_tpu_jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

REFERENCE_DATA = "/root/reference/RavenTest/data"


def lambda_reads_path() -> str:
    return os.path.join(REFERENCE_DATA, "ERA476754.fastq.gz")


def lambda_truth_path() -> str:
    return os.path.join(REFERENCE_DATA, "NC_001416.fasta.gz")


def has_lambda_data() -> bool:
    return os.path.exists(lambda_reads_path()) and os.path.exists(
        lambda_truth_path()
    )


if os.environ.get("RAVEN_LAMBDA_REQUIRED") and not has_lambda_data():
    raise RuntimeError(
        "RAVEN_LAMBDA_REQUIRED=1 but the bundled lambda dataset is absent "
        f"({REFERENCE_DATA}) — the quality gate cannot run"
    )

requires_lambda = pytest.mark.skipif(
    not has_lambda_data(), reason="bundled lambda-phage test data not present"
)


@pytest.fixture(scope="module")
def rng(request):
    # deterministic per-module stream: test outcomes don't depend on which
    # other modules ran first (zlib.crc32 is stable across processes,
    # unlike built-in hash)
    import zlib

    seed = zlib.crc32(request.module.__name__.encode())
    return np.random.default_rng(seed)


@pytest.fixture(scope="session")
def lambda_reads():
    from raven_tpu.io import parse_file

    return parse_file(lambda_reads_path())


@pytest.fixture(scope="session")
def lambda_truth():
    from raven_tpu.io import parse_file

    return parse_file(lambda_truth_path())


def random_genome(rng, n: int) -> str:
    return "".join("ACGT"[c] for c in rng.integers(0, 4, size=n))


def sample_reads(rng, genome: str, n_reads: int, mean_len: int, error: float = 0.0):
    """Simple read simulator (substitutions only unless error includes indels)."""
    reads = []
    positions = []
    g = np.frombuffer(genome.encode(), dtype=np.uint8)
    lookup = {65: 0, 67: 1, 71: 2, 84: 3}
    gcodes = np.array([lookup[int(x)] for x in g], dtype=np.uint8)
    for _ in range(n_reads):
        length = max(200, int(rng.normal(mean_len, mean_len // 4)))
        length = min(length, len(genome) - 1)
        start = int(rng.integers(0, len(genome) - length))
        codes = gcodes[start : start + length].copy()
        if error > 0:
            nerr = rng.binomial(length, error)
            idx = rng.integers(0, length, size=nerr)
            codes[idx] = (codes[idx] + rng.integers(1, 4, size=nerr)) % 4
        strand = bool(rng.integers(0, 2))
        if strand:
            codes = (codes[::-1] ^ 3).astype(np.uint8)
        reads.append(codes)
        positions.append((start, start + length, strand))
    return reads, positions
