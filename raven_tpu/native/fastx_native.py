"""ctypes bridge for the native FASTX parser (placeholder until fastx.cc
lands; fastx.py falls back to the pure-python parser when this returns
None)."""

from __future__ import annotations


def parse(path: str, is_fastq: bool):
    return None
