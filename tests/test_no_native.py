"""Graceful degradation when the native library is disabled."""

import subprocess
import sys


def test_spgemm_without_native():
    code = """
import numpy as np
from sparse_matrix_tpu.native import native_available
assert not native_available()
from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops import spgemm_hash_host
rng = np.random.default_rng(0)
a = (rng.random((40,40))<0.1)*rng.standard_normal((40,40))
A = CsrMatrix.from_dok(DokMatrix.from_dense(a))
C = spgemm_hash_host(A, A)
assert np.allclose(C.to_dense(), a@a)
from sparse_matrix_tpu.core import parse_matrix_market_csr, to_matrix_market_string
B = parse_matrix_market_csr(to_matrix_market_string(A.to_dok()))
assert np.allclose(B.to_dense(), a)
print("fallback OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300,
        env={"PYTHONPATH": ".", "SPMX_NO_NATIVE": "1", "HOME": "/root",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert "fallback OK" in out.stdout, out.stderr[-2000:]
