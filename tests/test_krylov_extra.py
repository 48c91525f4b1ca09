"""BiCG / CGS / QMR / TFQMR tests: convergence on nonsymmetric systems,
differential checks vs scipy, and the scipy-shaped facade."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg as sla

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import (
    bicg_solve,
    cgs_solve,
    poisson_2d_csr,
    qmr_solve,
    tfqmr_solve,
)


def _convdiff(n: int, skew: float = 0.4):
    """Poisson + first-order skew term: well-conditioned, nonsymmetric."""
    A = poisson_2d_csr(n, dtype=np.float64)
    d = A.to_dense()
    i = np.arange(n * n - 1)
    d[i, i + 1] += skew
    d[i + 1, i] -= skew
    return d


def _mv(d):
    a = jnp.asarray(d.astype(np.float32))
    at = jnp.asarray(d.T.astype(np.float32))
    return (lambda v: a @ v), (lambda v: at @ v)


@pytest.mark.parametrize(
    "solver,needs_t",
    [(bicg_solve, True), (cgs_solve, False), (qmr_solve, True),
     (tfqmr_solve, False)],
)
def test_converges_nonsymmetric(solver, needs_t):
    d = _convdiff(12)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(144).astype(np.float32)
    mv, rmv = _mv(d)
    args = (mv, rmv, b) if needs_t else (mv, b)
    res = solver(*args, tol=1e-6, maxiter=4000)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(d @ x - b) <= 1e-3 * np.linalg.norm(b)


@pytest.mark.parametrize(
    "solver,needs_t",
    [(bicg_solve, True), (cgs_solve, False), (qmr_solve, True),
     (tfqmr_solve, False)],
)
def test_converges_sparse_operator(solver, needs_t):
    d = _convdiff(10)
    S = CsrMatrix.from_dok(DokMatrix.from_dense(d.astype(np.float32)))
    op = SpmvOperator(S)
    opt = SpmvOperator(S.transpose())
    rng = np.random.default_rng(4)
    b = rng.standard_normal(100).astype(np.float32)
    args = (op, opt, b) if needs_t else (op, b)
    res = solver(*args, tol=1e-6, maxiter=4000)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(d @ x - b) <= 1e-3 * np.linalg.norm(b)


@pytest.mark.parametrize("name", ["bicg", "cgs", "qmr", "tfqmr"])
def test_differential_vs_scipy(name):
    """Same operator + rhs: both implementations reach a solution with
    comparable residual (each on its own path; f32 here vs f64 scipy)."""
    from sparse_matrix_tpu.sparse import linalg as xla_sla

    d = _convdiff(8, skew=0.3)
    sp = scipy.sparse.csr_matrix(d)
    rng = np.random.default_rng(5)
    b = rng.standard_normal(64)
    x_ref, info_ref = getattr(sla, name)(sp, b, rtol=1e-8, maxiter=5000)
    assert info_ref == 0
    x, info = getattr(xla_sla, name)(
        CsrMatrix.from_scipy(sp), b.astype(np.float32), rtol=1e-6,
        maxiter=5000,
    )
    assert info == 0
    # both solve the same system: compare through the residual, not x
    assert np.linalg.norm(d @ x.astype(np.float64) - b) <= 2e-4 * np.linalg.norm(b)
    assert np.allclose(x, x_ref, atol=5e-3)


def test_bicg_spd_matches_cg():
    A = poisson_2d_csr(10, dtype=np.float32)
    op = SpmvOperator(A)
    rng = np.random.default_rng(6)
    b = rng.standard_normal(100).astype(np.float32)
    res = bicg_solve(op, op, b, tol=1e-6, maxiter=2000)  # A symmetric: A^T = A
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(A.to_dense() @ x - b) <= 1e-3 * np.linalg.norm(b)


def test_cgs_tfqmr_preconditioned():
    """Jacobi preconditioning cuts iterations and still converges."""
    d = _convdiff(12)
    dinv = jnp.asarray((1.0 / np.diag(d)).astype(np.float32))
    m_inv = lambda v: dinv * v  # noqa: E731
    mv, _ = _mv(d)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(144).astype(np.float32)
    plain = cgs_solve(mv, b, tol=1e-6, maxiter=4000)
    pre = cgs_solve(mv, b, tol=1e-6, maxiter=4000, m_inv=m_inv)
    x = np.asarray(pre.x, np.float64)
    assert np.linalg.norm(d @ x - b) <= 1e-3 * np.linalg.norm(b)
    assert int(pre.iterations) <= int(plain.iterations)
    pre_t = tfqmr_solve(mv, b, tol=1e-6, maxiter=8000, m_inv=m_inv)
    xt = np.asarray(pre_t.x, np.float64)
    assert np.linalg.norm(d @ xt - b) <= 1e-3 * np.linalg.norm(b)


def test_tfqmr_residual_is_true_residual():
    d = _convdiff(8)
    mv, _ = _mv(d)
    rng = np.random.default_rng(8)
    b = rng.standard_normal(64).astype(np.float32)
    res = tfqmr_solve(mv, b, tol=1e-6, maxiter=4000)
    x = np.asarray(res.x, np.float64)
    assert np.isclose(
        float(res.residual_norm), np.linalg.norm(d @ x - b), rtol=1e-2, atol=1e-5
    )


def test_qmr_accepts_identity_split_preconditioner():
    from sparse_matrix_tpu.sparse import linalg as xla_sla

    A = poisson_2d_csr(4, dtype=np.float32)
    b = np.ones(16, np.float32)
    x, info = xla_sla.qmr(A, b, M1=np.eye(16))
    assert info == 0
    np.testing.assert_allclose(A.to_dense() @ x, b, atol=1e-3)


def test_breakdown_returns_current_iterate():
    """A singular operator breaks the recurrences; the solver must return
    finite values, not NaN."""
    d = np.zeros((8, 8), np.float32)
    d[0, 0] = 1.0  # rank-1
    mv, rmv = _mv(d)
    b = np.ones(8, np.float32)
    for solver, args in [
        (bicg_solve, (mv, rmv, b)),
        (cgs_solve, (mv, b)),
        (qmr_solve, (mv, rmv, b)),
        (tfqmr_solve, (mv, b)),
    ]:
        res = solver(*args, tol=1e-6, maxiter=50)
        assert np.all(np.isfinite(np.asarray(res.x)))


def test_qmr_split_preconditioned_converges_faster():
    # badly scaled nonsymmetric system; split Jacobi sqrt(D) on both sides
    n = 12
    d = _convdiff(n).astype(np.float32)
    rng = np.random.default_rng(11)
    sc = np.exp(rng.uniform(-1.5, 1.5, n * n)).astype(np.float32)
    d = d * sc[None, :] * sc[:, None]
    mv = lambda x: d @ x  # noqa: E731
    rmv = lambda x: d.T @ x  # noqa: E731
    b = rng.standard_normal(n * n).astype(np.float32)
    # f32 loop: 1e-5 is the attainable relative residual regime
    plain = qmr_solve(mv, rmv, b, tol=1e-5, maxiter=3000)
    inv_sqrt = (1.0 / np.sqrt(np.abs(np.diag(d)))).astype(np.float32)
    pre = qmr_solve(
        mv, rmv, b, tol=1e-5, maxiter=3000,
        m1_solve=lambda v: inv_sqrt * v, m1t_solve=lambda v: inv_sqrt * v,
        m2_solve=lambda v: inv_sqrt * v, m2t_solve=lambda v: inv_sqrt * v,
    )
    rn = np.linalg.norm(d @ np.asarray(pre.x, np.float64) - b)
    assert rn <= 1e-4 * np.linalg.norm(b)
    assert int(pre.iterations) < int(plain.iterations)


def test_qmr_identity_precond_matches_plain():
    n = 10
    d = _convdiff(n).astype(np.float32)
    rng = np.random.default_rng(12)
    b = rng.standard_normal(n * n).astype(np.float32)
    mv = lambda x: d @ x  # noqa: E731
    rmv = lambda x: d.T @ x  # noqa: E731
    plain = qmr_solve(mv, rmv, b, tol=1e-7, maxiter=2000)
    ident = qmr_solve(mv, rmv, b, tol=1e-7, maxiter=2000,
                      m1_solve=lambda v: v, m2t_solve=lambda v: v)
    np.testing.assert_allclose(np.asarray(ident.x), np.asarray(plain.x),
                               rtol=1e-5, atol=1e-6)


def test_facade_qmr_m1_m2_vs_scipy():
    from sparse_matrix_tpu.sparse.linalg import qmr

    n = 10
    d = _convdiff(n)
    A = CsrMatrix.from_scipy(scipy.sparse.csr_matrix(d))
    rng = np.random.default_rng(13)
    b = rng.standard_normal(n * n)
    inv_diag = 1.0 / np.diag(d)
    M1 = scipy.sparse.diags(inv_diag).tocsr()
    x, info = qmr(A, b, rtol=1e-5, M1=CsrMatrix.from_scipy(M1))
    assert info == 0
    eye = sla.aslinearoperator(scipy.sparse.identity(n * n).tocsr())
    ref = sla.qmr(scipy.sparse.csr_matrix(d), b, rtol=1e-7,
                  M1=sla.aslinearoperator(M1), M2=eye)[0]
    rn = np.linalg.norm(d @ np.asarray(x, np.float64) - b)
    assert rn <= 1e-4 * np.linalg.norm(b)
    np.testing.assert_allclose(x, ref, atol=5e-3)
