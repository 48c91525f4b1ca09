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
LIB_UBSAN = os.path.join(_HERE, "libspmx_native_ubsan.so")
LIB_TSAN = os.path.join(_HERE, "libspmx_native_tsan.so")


def build(verbose: bool = False, *, sanitize=False) -> str:
    """Compile (if stale) and return the shared library path.

    ``sanitize=True`` (or ``"undefined"``) builds an
    UndefinedBehaviorSanitizer variant (the project's miri analog, reference
    ``rust-toolchain.toml:3``): UB aborts the process instead of corrupting
    results. ``sanitize="thread"`` builds a ThreadSanitizer variant for the
    cross-thread disjoint-slice writes in ``run_chunked`` (the unsafe
    ``MaybeUninit`` analog, reference ``spam_csr/src/mul_hash.rs:38-64``).
    Used by the sanitizer tests.
    """
    if sanitize == "thread":
        lib = LIB_TSAN
    elif sanitize:
        lib = LIB_UBSAN
    else:
        lib = LIB
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(SRC):
        return lib
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared", "-pthread"]
    if sanitize == "thread":
        cmd += ["-g", "-fsanitize=thread"]
    elif sanitize:
        cmd += ["-g", "-fsanitize=undefined", "-fno-sanitize-recover=undefined"]
    cmd += [SRC, "-o", lib]
    if verbose:
        print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return lib


if __name__ == "__main__":
    print(build(verbose=True))
