"""One process of a 2-process jax.distributed construct run
(tests/test_distributed.py::test_two_process_construct_end_to_end).

Runs the FULL construct phase with the hash-range-sharded index over the
GLOBAL mesh: device compute (sketch exchange, join, chaining) is sharded
across the processes' devices; host graph phases run replicated on every
process (the SPMD multi-host execution model).  Outputs the live
node/edge digest — the test asserts it equals the single-process host
construct on every process.

  python misc/distributed_construct_worker.py PID NPROC COORD
"""
import json, os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = f"{flags} --xla_force_host_platform_device_count=4".strip()
import numpy as np
import jax
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from raven_tpu.parallel.distributed import initialize_distributed
initialize_distributed(coord, num_processes=nproc, process_id=pid)

# full construct with the sharded index over the GLOBAL mesh
import hashlib
from tests.conftest import random_genome, sample_reads
from raven_tpu.io.readset import ReadSet
from raven_tpu.config import OverlapPhaseCfg
from raven_tpu.graph import Graph, construct_graph
rng = np.random.default_rng(2)
genome = random_genome(rng, 16000)
reads, _ = sample_reads(rng, genome, 70, 2200, error=0.04)
rs = ReadSet.from_sequences(reads)
os.environ["RAVEN_TPU_SHARDED_MAP"] = "1"
g = Graph()
construct_graph(g, rs, OverlapPhaseCfg(use_minhash=True))
h = hashlib.sha256()
for n in g.live_nodes():
    h.update(np.int64(n.id).tobytes()); h.update(n.codes.tobytes())
for e in g.live_edges():
    h.update(np.int64(e.id).tobytes()); h.update(np.int64(e.length).tobytes())
print(json.dumps({"pid": pid, "nodes": sum(1 for _ in g.live_nodes()),
                  "edges": sum(1 for _ in g.live_edges()),
                  "digest": h.hexdigest()}))
