"""MINRES: symmetric (incl. indefinite) systems."""

import numpy as np

from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import minres_solve, poisson_2d_csr


def _residual(A_dense, x, b):
    r = A_dense.astype(np.float64) @ np.asarray(x, np.float64) - b
    return np.linalg.norm(r) / np.linalg.norm(b)


def test_minres_spd_matches_direct():
    A = poisson_2d_csr(16, dtype=np.float32)
    op = SpmvOperator(A)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.rows).astype(np.float32)
    res = minres_solve(op, b, tol=1e-6, maxiter=2000)
    assert _residual(A.to_dense(), res.x, b) <= 1e-4


def test_minres_indefinite():
    # A - 3I is symmetric indefinite (Poisson spectrum spans (0, 8));
    # CG would break down, MINRES must converge
    A = poisson_2d_csr(12, dtype=np.float32)
    d = A.to_dense().astype(np.float32) - 3.0 * np.eye(A.rows, dtype=np.float32)
    op = SpmvOperator(A)
    mv = lambda v: op(v) - 3.0 * v
    rng = np.random.default_rng(1)
    b = rng.standard_normal(A.rows).astype(np.float32)
    res = minres_solve(mv, b, tol=1e-6, maxiter=4000)
    assert _residual(d, res.x, b) <= 1e-3


def test_minres_zero_rhs():
    A = poisson_2d_csr(8, dtype=np.float32)
    op = SpmvOperator(A)
    res = minres_solve(op, np.zeros(A.rows, np.float32))
    assert int(res.iterations) == 0
    assert float(np.abs(np.asarray(res.x)).max()) == 0.0


def test_minres_with_x0():
    A = poisson_2d_csr(10, dtype=np.float32)
    op = SpmvOperator(A)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(A.rows).astype(np.float32)
    x0 = rng.standard_normal(A.rows).astype(np.float32)
    res = minres_solve(op, b, x0=x0, tol=1e-6, maxiter=2000)
    assert _residual(A.to_dense(), res.x, b) <= 1e-4
