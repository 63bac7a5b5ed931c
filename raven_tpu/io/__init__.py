from raven_tpu.io.fastx import ParserError, load_sequences, parse_file  # noqa: F401
from raven_tpu.io.readset import (  # noqa: F401
    ReadSet,
    decode,
    encode,
    reverse_complement,
)
