"""Build the native C++ runtime library (libslamnative.so).

Usage: ``python -m simpleslam_tpu.native.build`` (or it is invoked lazily on
first import of :mod:`simpleslam_tpu.native` when the .so is missing/stale).
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["lz4.cpp", "prefetch.cpp"]
OUT = os.path.join(HERE, "libslamnative.so")


def needs_build() -> bool:
    if not os.path.exists(OUT):
        return True
    so_mtime = os.path.getmtime(OUT)
    return any(
        os.path.exists(os.path.join(HERE, s))
        and os.path.getmtime(os.path.join(HERE, s)) > so_mtime
        for s in SOURCES
    )


def build(verbose: bool = False) -> str:
    srcs = [os.path.join(HERE, s) for s in SOURCES if os.path.exists(os.path.join(HERE, s))]
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", "-o", OUT] + srcs
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    if verbose:
        print(f"built {OUT}")
    return OUT


if __name__ == "__main__":
    build(verbose=True)
    sys.exit(0)
