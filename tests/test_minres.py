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


def test_pminres_jacobi_converges_and_helps():
    # badly scaled SPD operator: D A D with a wide diagonal spread —
    # Jacobi preconditioning must cut iterations vs plain MINRES
    A = poisson_2d_csr(16, dtype=np.float32)
    n = A.rows
    rng = np.random.default_rng(1)
    d = np.exp(rng.uniform(-2, 2, n)).astype(np.float32)
    Ad = A.to_dense() * d[None, :] * d[:, None]
    mv = lambda x: Ad @ x  # noqa: E731
    b = rng.standard_normal(n).astype(np.float32)
    from sparse_matrix_tpu.solvers import minres_solve

    plain = minres_solve(mv, b, tol=1e-6, maxiter=4000)
    inv_diag = (1.0 / np.diag(Ad)).astype(np.float32)
    pre = minres_solve(mv, b, tol=1e-6, maxiter=4000,
                       precond=lambda r: inv_diag * r)
    assert _residual(Ad, pre.x, b) <= 1e-3
    assert int(pre.iterations) < int(plain.iterations)


def test_pminres_identity_precond_matches_plain():
    A = poisson_2d_csr(12, dtype=np.float32)
    op = SpmvOperator(A)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(A.rows).astype(np.float32)
    plain = minres_solve(op, b, tol=1e-8, maxiter=3000)
    pre = minres_solve(op, b, tol=1e-8, maxiter=3000, precond=lambda r: r)
    assert _residual(A.to_dense(), pre.x, b) <= 1e-5
    # identity preconditioner follows the same Krylov space: same count +-1
    assert abs(int(pre.iterations) - int(plain.iterations)) <= 2


def test_pminres_indefinite_with_spd_precond():
    # shifted (indefinite) operator with an SPD Jacobi-of-|diag| precond
    A = poisson_2d_csr(12, dtype=np.float32)
    Ad = A.to_dense().astype(np.float32) - 3.0 * np.eye(A.rows, dtype=np.float32)
    mv = lambda x: Ad @ x  # noqa: E731
    rng = np.random.default_rng(3)
    b = rng.standard_normal(A.rows).astype(np.float32)
    inv_diag = (1.0 / np.abs(np.diag(Ad))).astype(np.float32)
    from sparse_matrix_tpu.solvers import minres_solve

    res = minres_solve(mv, b, tol=1e-6, maxiter=4000,
                       precond=lambda r: inv_diag * r)
    assert _residual(Ad, res.x, b) <= 1e-3


def test_facade_minres_with_m():
    import scipy.sparse.linalg as sla

    from sparse_matrix_tpu.sparse.linalg import minres

    A = poisson_2d_csr(12, dtype=np.float64)
    n = A.rows
    rng = np.random.default_rng(4)
    b = rng.standard_normal(n)
    inv_diag = 1.0 / np.asarray(A.to_dense().diagonal())
    x, info = minres(A, b, rtol=1e-7, M=lambda r: inv_diag * r)
    assert info == 0
    ref = sla.minres(A.to_scipy(), b, rtol=1e-7)[0]
    assert _residual(A.to_dense(), x, b) <= 1e-4
    np.testing.assert_allclose(x, ref, atol=5e-3)
