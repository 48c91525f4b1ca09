"""f64 SpMV parity (the BASELINE "CSR SpMV f64 ... CPU-runnable" config):
runs the LanePack reference path in float64 under jax_enable_x64."""

import subprocess
import sys


def test_f64_spmv_subprocess():
    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.formats.lanepack import plan_lanepack
from sparse_matrix_tpu.ops.spmv import spmv_lanepack, spmv_oracle
rng = np.random.default_rng(0)
a = (rng.random((1000, 1000)) < 0.01) * rng.standard_normal((1000, 1000))
A = CsrMatrix.from_dok(DokMatrix.from_dense(a))
x = rng.standard_normal(1000)
plan = plan_lanepack(A, dtype=np.float64)
y = np.asarray(spmv_lanepack(plan, x))
assert y.dtype == np.float64, y.dtype
ref = spmv_oracle(A, x)
err = np.abs(y - ref).max()
assert err < 1e-12 * max(1.0, np.abs(ref).max()), err
print("F64 OK", err)
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": ".", "HOME": "/root",
             "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert "F64 OK" in out.stdout, (out.stdout[-500:], out.stderr[-3000:])
