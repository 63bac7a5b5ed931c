import gzip
import os

import numpy as np
import pytest

from raven_tpu.io import (
    ParserError,
    ReadSet,
    decode,
    encode,
    parse_file,
    reverse_complement,
)
from tests.conftest import requires_lambda


def test_encode_decode_roundtrip():
    s = "ACGTACGTTTGGCCA"
    assert decode(encode(s)) == s


def test_reverse_complement():
    assert decode(reverse_complement(encode("AACGT"))) == "ACGTT"
    # involution
    c = encode("ACGTACCGGTT")
    assert np.array_equal(reverse_complement(reverse_complement(c)), c)


def test_encode_rejects_garbage():
    with pytest.raises(ValueError):
        encode("ACGT!")


def test_fasta_parse(tmp_path):
    p = tmp_path / "x.fasta"
    p.write_text(">r1 desc\nACGT\nACGT\n>r2\nTTTT\n")
    rs = parse_file(str(p))
    assert rs.names == ["r1", "r2"]
    assert rs.sequence_str(0) == "ACGTACGT"
    assert rs.sequence_str(1) == "TTTT"
    assert not rs.has_quality


def test_fastq_gz_parse(tmp_path):
    p = tmp_path / "x.fastq.gz"
    data = "@r1\nACGT\n+\n!#5I\n@r2\nGGCC\n+\nIIII\n"
    with gzip.open(p, "wt") as fh:
        fh.write(data)
    rs = parse_file(str(p))
    assert rs.names == ["r1", "r2"]
    assert rs.sequence_str(0) == "ACGT"
    assert rs.has_quality
    assert list(rs.quality(0)) == [0, 2, 20, 40]


def test_unsupported_extension(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("hello")
    with pytest.raises(ParserError):
        parse_file(str(p))


def test_sequence_slicing():
    rs = ReadSet.from_sequences(["ACGTACGT", "TTGGCC"])
    assert rs.sequence_str(0, 2, 4) == "GTAC"
    assert rs.sequence_str(1, 4) == "CC"
    assert len(rs) == 2


def test_padded_batch():
    rs = ReadSet.from_sequences(["ACGT" * 10, "AC"])
    batch, lens = rs.padded_batch()
    assert batch.shape == (2, 128)
    assert list(lens) == [40, 2]
    assert batch[1, 2:].sum() == 0


@requires_lambda
def test_lambda_reads_load(lambda_reads, lambda_truth):
    assert len(lambda_reads) > 100
    assert lambda_reads.has_quality
    assert len(lambda_truth) == 1
    # lambda phage genome is 48502 bp
    assert int(lambda_truth.lengths[0]) == 48502


def test_native_parser_matches_python(tmp_path):
    from raven_tpu.native import fastx_native

    if fastx_native._load() in (False, None):
        pytest.skip("native parser unavailable")
    p = tmp_path / "mix.fastq"
    p.write_text("@r1 desc\nACGTNRY\n+\nIIIIIII\n@r2\nGGCC\n+\n!!!!\n")
    native = fastx_native.parse(str(p), True)
    # force python path
    orig = fastx_native.parse
    fastx_native.parse = lambda *a: None
    try:
        python = parse_file(str(p))
    finally:
        fastx_native.parse = orig
    assert native.names == python.names
    assert np.array_equal(native.codes, python.codes)
    assert np.array_equal(native.quals, python.quals)


def test_load_sequences_multi_file(tmp_path):
    from raven_tpu.io import load_sequences

    a = tmp_path / "a.fasta"
    a.write_text(">x\nACGT\n")
    b = tmp_path / "b.fastq"
    b.write_text("@y\nGGTT\n+\nIIII\n")
    rs = load_sequences([str(a), str(b)])
    assert rs.names == ["x", "y"]
    assert rs.sequence_str(0) == "ACGT" and rs.sequence_str(1) == "GGTT"
    # quality present for the fastq part, zero-filled for the fasta part
    assert rs.has_quality
    assert rs.quality(0).tolist() == [0, 0, 0, 0]
    assert rs.quality(1).tolist() == [40, 40, 40, 40]
