"""raven-tpu: a TPU-native de novo genome assembler for long uncorrected reads.

Overlap-Layout-Consensus assembler with the capabilities of lbcb-sci/raven,
re-designed from scratch for JAX/XLA on TPU:

- overlap:   minimizer sampling / hashing as vectorized device kernels over
             base-packed read batches, a sorted-array minimizer index
             (shardable by hash range across a device mesh), sort-join
             candidate matching and batched LIS chaining
             (reference: RavenLib/src/construct.cc + the `ram` dependency)
- layout:    pile-o-gram trimming / chimera / repeat analysis as vectorized
             sliding-window ops, assembly-graph simplification passes
             (reference: RavenLib/src/pile.cc, assemble.cc, common.cc)
- consensus: racon-style window POA polishing as batched alignment kernels
             (reference: RavenLib/src/polish.cc + the `racon` dependency)

The package is organised as:

  raven_tpu.io        sequence I/O + 2-bit packed read sets
  raven_tpu.ops       JAX / Pallas device kernels
  raven_tpu.overlap   minimizer index + mapping engine
  raven_tpu.pile      pile-o-gram (coverage profile) engine
  raven_tpu.graph     assembly graph: construct / assemble / serialization
  raven_tpu.polish    consensus polisher
  raven_tpu.parallel  device mesh + sharded index / collectives
  raven_tpu.native    optional C++ accelerators (ctypes)
"""

__version__ = "0.1.0"

from raven_tpu.config import (  # noqa: F401
    AlignCfg,
    DeviceCfg,
    OverlapPhaseCfg,
    PolishCfg,
)
