"""Build the C++ rANS coder shared library on first use.

A single translation unit compiled with g++ -O3; rebuilt automatically when
the source is newer than the cached .so (no external build system needed on
the TPU-VM host, though `make -C deepvideocodec_tpu/coder` works too).
"""

from __future__ import annotations

import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rans.cpp")
_LIB = os.path.join(_DIR, "librans.so")
_lock = threading.Lock()


def ensure_built() -> str:
    """Compile (if stale) and return the shared library path."""
    with _lock:
        if (
            not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            cmd = [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", "-o", _LIB, _SRC,
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except subprocess.CalledProcessError:
                # -march=native unsupported on some toolchains; portable -O3
                cmd.remove("-march=native")
                subprocess.run(cmd, check=True, capture_output=True)
        return _LIB


def get_library_path() -> str:
    return ensure_built()
