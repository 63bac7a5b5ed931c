from raven_tpu.overlap.engine import MinimizerIndex  # noqa: F401
from raven_tpu.overlap.types import (  # noqa: F401
    OVERLAP_DTYPE,
    empty_overlaps,
    make_overlaps,
    overlap_length,
    overlap_reverse,
)
