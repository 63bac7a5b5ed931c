import numpy as np
import pytest

jax = pytest.importorskip("jax")

from raven_tpu.ops.pallas_sketch import HAS_PALLAS, pallas_sketch
from raven_tpu.ops.sketch import sketch_kernel

pytestmark = pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")


def test_pallas_sketch_matches_xla(rng):
    """Interpreter-mode Pallas output must match the XLA kernel exactly
    (on TPU hardware the compiled kernel is verified bit-exact too; see
    NOTES.md for the Mosaic workarounds baked into the kernel)."""
    import jax.numpy as jnp

    for k, w in ((15, 5), (11, 3)):
        S, L = 16, 512
        codes = rng.integers(0, 4, (S, L)).astype(np.uint32)
        lens = rng.integers(k + w, L, S).astype(np.int32)
        hp, sp, kp = pallas_sketch(
            jnp.asarray(codes), jnp.asarray(lens), k, w, interpret=True
        )
        hx, sx, kx = sketch_kernel(jnp.asarray(codes), jnp.asarray(lens), k, w)
        kp = np.asarray(kp)
        kx = np.asarray(kx)
        assert np.array_equal(kp, kx)
        assert np.array_equal(np.asarray(hp)[kp], np.asarray(hx)[kx])
        assert np.array_equal(np.asarray(sp)[kp], np.asarray(sx)[kx])


def test_segments_kernel_pallas_flag(rng):
    """sketch_segments_kernel(use_pallas=True) stays bit-identical (pallas
    runs in interpreter mode on CPU via the default lowering error — skip
    there; this exercises the plumbing on accelerators)."""
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        pytest.skip("compiled pallas path needs an accelerator")
    from raven_tpu.ops.sketch import sketch_segments_kernel

    S, L = 16, 512
    codes = rng.integers(0, 4, (S, L)).astype(np.uint8)
    eff = np.full(S, L, np.int32)
    rids = np.arange(S, dtype=np.int32)
    base = np.zeros(S, np.int32)
    clo = np.zeros(S, np.int32)
    chi = np.full(S, L, np.int32)
    args = tuple(jnp.asarray(a) for a in (codes, eff, rids, base, clo, chi))
    a = sketch_segments_kernel(*args, 15, 5, use_pallas=True)
    b = sketch_segments_kernel(*args, 15, 5, use_pallas=False)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))
