"""UBSan build of the native runtime — the miri analog: run the SpGEMM fuzz
workload against a -fsanitize=undefined build (UB aborts the process)."""

import ctypes
import subprocess
import sys

import numpy as np
import pytest


def test_native_ubsan_clean():
    code = """
import ctypes
import numpy as np
from sparse_matrix_tpu.native import build as bmod
from sparse_matrix_tpu.native import loader
lib = ctypes.CDLL(bmod.build(sanitize=True))
loader._declare(lib)
loader._LIB = lib
loader._TRIED = True
from sparse_matrix_tpu.verify.fuzz import fuzz_spgemm
fuzz_spgemm(60, seed=11, max_dim=16, non_finite=True)
print("UBSAN CLEAN")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": ".", "HOME": "/root",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert "UBSAN CLEAN" in out.stdout, (out.stdout[-1000:], out.stderr[-3000:])
