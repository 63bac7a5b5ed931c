"""Optional C++ accelerators, loaded via ctypes.

The reference offloads its hot host-side loops to external C++ libraries
(bioparser's zlib parsing, edlib's Myers bit-vector edit distance, spoa's
SIMD POA).  Here the equivalents are small first-party C++ files compiled
lazily with g++ into a shared object; everything has a numpy fallback so the
package works without a toolchain.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from ctypes import CDLL

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_LIB_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("RAVEN_TPU_NATIVE_DIR")
    if d:
        return d
    return os.path.join(tempfile.gettempdir(), "raven_tpu_native")


def get_lib() -> CDLL | None:
    """Compile (once) and load the native library; None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    srcs = [
        os.path.join(_SRC_DIR, f)
        for f in sorted(os.listdir(_SRC_DIR))
        if f.endswith(".cc")
    ]
    if not srcs:
        return None
    os.makedirs(_build_dir(), exist_ok=True)
    so_path = os.path.join(_build_dir(), "libraven_native.so")
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < newest_src:
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread", *srcs, "-o", so_path, "-lz",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except Exception as e:  # toolchain missing / compile error
            print(f"[raven_tpu::native] build skipped: {e}", file=sys.stderr)
            return None
    try:
        _LIB = CDLL(so_path)
    except OSError:
        _LIB = None
    return _LIB
