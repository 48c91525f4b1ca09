"""GMRES tests."""

import jax.numpy as jnp
import numpy as np

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import gmres_solve, poisson_2d_csr


def test_gmres_dense_nonsymmetric():
    rng = np.random.default_rng(0)
    n = 50
    a = (np.eye(n) * 6 + rng.standard_normal((n, n)) * 0.4).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    res = gmres_solve(lambda v: jnp.asarray(a) @ v, b, restart=25, tol=1e-6, maxiter=600)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(a @ x - b) <= 1e-4 * np.linalg.norm(b), float(res.residual_norm)


def test_gmres_sparse_operator_restarted():
    rng = np.random.default_rng(1)
    n = 12
    A = poisson_2d_csr(n, dtype=np.float64)
    d = A.to_dense()
    i = np.arange(n * n - 1)
    d[i, i + 1] += 0.3
    d[i + 1, i] -= 0.3
    S = CsrMatrix.from_dok(DokMatrix.from_dense(d.astype(np.float32)))
    op = SpmvOperator(S)
    b = rng.standard_normal(n * n).astype(np.float32)
    res = gmres_solve(op, b, restart=20, tol=1e-5, maxiter=4000)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(d @ x - b) <= 1e-3 * np.linalg.norm(b), float(res.residual_norm)


def test_gmres_identity_converges_immediately():
    b = np.ones(16, np.float32)
    res = gmres_solve(lambda v: v, b, restart=8, tol=1e-8, maxiter=100)
    np.testing.assert_allclose(np.asarray(res.x), b, rtol=1e-5)
