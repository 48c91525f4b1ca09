"""BiCGSTAB tests on nonsymmetric systems."""

import jax.numpy as jnp
import numpy as np

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import bicgstab_solve, poisson_2d_csr


def test_bicgstab_nonsymmetric_dense():
    rng = np.random.default_rng(0)
    n = 60
    a = (np.eye(n) * 8 + rng.standard_normal((n, n)) * 0.3).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    res = bicgstab_solve(lambda v: jnp.asarray(a) @ v, b, tol=1e-6, maxiter=500)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(a @ x - b) <= 1e-3 * np.linalg.norm(b)


def test_bicgstab_nonsymmetric_sparse_operator():
    # convection-diffusion-like: Poisson plus a skew (nonsymmetric) term
    rng = np.random.default_rng(1)
    n = 16
    A = poisson_2d_csr(n, dtype=np.float64)
    d = A.to_dense()
    i = np.arange(n * n - 1)
    d[i, i + 1] += 0.4
    d[i + 1, i] -= 0.4
    S = CsrMatrix.from_dok(DokMatrix.from_dense(d.astype(np.float32)))
    op = SpmvOperator(S)
    b = rng.standard_normal(n * n).astype(np.float32)
    res = bicgstab_solve(op, b, tol=1e-6, maxiter=2000)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(d @ x - b) <= 1e-3 * np.linalg.norm(b)


def test_bicgstab_on_spd_matches_cg_answer():
    A = poisson_2d_csr(12, dtype=np.float32)
    op = SpmvOperator(A)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(144).astype(np.float32)
    res = bicgstab_solve(op, b, tol=1e-6, maxiter=2000)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(A.to_dense() @ x - b) <= 1e-3 * np.linalg.norm(b)
