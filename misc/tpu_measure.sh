#!/bin/bash
# On-hardware measurement program (run when the TPU tunnel is alive).
# Order matters: smoke validates Mosaic parity BEFORE anything consumes
# kernel outputs; benches run serialized (never two TPU processes at
# once — the second gets RESOURCE_EXHAUSTED through the tunnel).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/.axon_site:$PWD"
# this box HAS the bundled λ dataset: the golden gate must never
# silently skip here (tests/conftest.py errors if the data vanishes)
export RAVEN_LAMBDA_REQUIRED=1

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() != 'cpu'
assert int(jnp.arange(8).sum()) == 28
print('tunnel alive')" 2>/dev/null
}

if ! probe; then
    echo "TPU tunnel unreachable — aborting" >&2
    exit 1
fi

echo "=== 1. hardware smoke (Mosaic parity: sketch, votes, pallas, banded)"
timeout 2400 python misc/tpu_smoke.py || exit 1

echo "=== 2. overlap-stage bench (breakdown + digest check)"
timeout 3000 python bench.py | tee /tmp/bench_r03.json

echo "=== 3. polish bench (full NW / banded / pallas + 8-vdev identity)"
timeout 3000 python bench_polish.py | tee /tmp/bench_polish_r03.json

echo "=== 4. lambda CLI end-to-end on hardware"
D=$(mktemp -d) && cd "$D"
timeout 2000 python -m raven_tpu.cli -M -p 2 --disable-checkpoints -t 8 \
    /root/reference/RavenTest/data/ERA476754.fastq.gz > contig.fa 2> log.txt
grep -c '^>' contig.fa
cd - >/dev/null

echo "=== 5. fly-scale assemble profile (device FDL)"
timeout 3000 python misc/assemble_scale_bench.py 100000

echo "ALL MEASUREMENTS DONE"
