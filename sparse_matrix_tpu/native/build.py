"""Build the C++ native runtime into a shared library.

Usage: ``python -m sparse_matrix_tpu.native.build``; also invoked lazily by the
loader on first use. Uses g++ directly — the library is a single translation
unit with no external dependencies.
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "src", "spmx_native.cpp")
LIB = os.path.join(_HERE, "libspmx_native.so")


def build(verbose: bool = False) -> str:
    """Compile (if stale) and return the shared library path."""
    if os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-fPIC",
        "-shared",
        "-pthread",
        SRC,
        "-o",
        LIB,
    ]
    if verbose:
        print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return LIB


if __name__ == "__main__":
    print(build(verbose=True))
