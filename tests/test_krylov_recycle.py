"""LGMRES / GCROT(m,k) tests: convergence on nonsymmetric systems,
augmentation economy vs plain restarted GMRES, preconditioning, and the
scipy-shaped facade."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse

from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import (
    gcrotmk_solve,
    gmres_solve,
    lgmres_solve,
    poisson_2d_csr,
)


def _convdiff(n: int, skew: float = 0.4):
    a = poisson_2d_csr(n, dtype=np.float64).to_dense()
    i = np.arange(n * n - 1)
    a[i, i + 1] += skew
    a[i + 1, i] -= skew
    return a


@pytest.mark.parametrize("solver,kw", [
    (lgmres_solve, dict(inner_m=10, outer_k=3)),
    (gcrotmk_solve, dict(m=10, k=5)),
])
def test_converges_nonsymmetric(solver, kw):
    d = _convdiff(12)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(144).astype(np.float32)
    a = jnp.asarray(d.astype(np.float32))
    res = solver(lambda v: a @ v, b, tol=1e-6, maxiter=4000, **kw)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(d @ x - b) <= 2e-3 * np.linalg.norm(b)


@pytest.mark.parametrize("solver,kw", [
    (lgmres_solve, dict(inner_m=10, outer_k=3)),
    (gcrotmk_solve, dict(m=10, k=5)),
])
def test_converges_sparse_operator(solver, kw):
    d = _convdiff(10)
    op = SpmvOperator(
        CsrMatrix.from_scipy(scipy.sparse.csr_matrix(d.astype(np.float32))))
    rng = np.random.default_rng(5)
    b = rng.standard_normal(100).astype(np.float32)
    res = solver(op, b, tol=1e-6, maxiter=3000, **kw)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(d @ x - b) <= 2e-3 * np.linalg.norm(b)


def test_augmentation_beats_plain_restart():
    """On a convection-dominated system plain GMRES(m) stagnates across
    restarts; both augmented solvers should need no more matvecs."""
    d = _convdiff(12, skew=0.9)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(144).astype(np.float32)
    a = jnp.asarray(d.astype(np.float32))
    mv = lambda v: a @ v  # noqa: E731
    plain = gmres_solve(mv, b, restart=13, tol=1e-6, maxiter=6000)
    lg = lgmres_solve(mv, b, inner_m=10, outer_k=3, tol=1e-6, maxiter=6000)
    gc = gcrotmk_solve(mv, b, m=13, k=8, tol=1e-6, maxiter=6000)
    assert int(lg.iterations) <= int(plain.iterations)
    assert int(gc.iterations) <= int(plain.iterations)
    for r in (lg, gc):
        x = np.asarray(r.x, np.float64)
        assert np.linalg.norm(d @ x - b) <= 2e-3 * np.linalg.norm(b)


@pytest.mark.parametrize("solver,kw", [
    (lgmres_solve, dict(inner_m=8, outer_k=2)),
    (gcrotmk_solve, dict(m=8, k=4)),
])
def test_preconditioned(solver, kw):
    d = _convdiff(10)
    dinv = jnp.asarray((1.0 / np.diag(d)).astype(np.float32))
    a = jnp.asarray(d.astype(np.float32))
    rng = np.random.default_rng(9)
    b = rng.standard_normal(100).astype(np.float32)
    res = solver(lambda v: a @ v, b, tol=1e-6, maxiter=3000,
                 m_inv=lambda v: dinv * v, **kw)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(d @ x - b) <= 2e-3 * np.linalg.norm(b)


@pytest.mark.parametrize("solver", [lgmres_solve, gcrotmk_solve])
def test_zero_rhs(solver):
    d = _convdiff(6)
    a = jnp.asarray(d.astype(np.float32))
    res = solver(lambda v: a @ v, np.zeros(36, np.float32), tol=1e-6)
    assert int(res.iterations) == 0
    np.testing.assert_array_equal(np.asarray(res.x), 0.0)


@pytest.mark.parametrize("name", ["lgmres", "gcrotmk"])
def test_facade_matches_scipy_solution(name):
    import sparse_matrix_tpu.sparse.linalg as L
    import scipy.sparse.linalg as sla

    d = _convdiff(10)
    s = scipy.sparse.csr_matrix(d)
    rng = np.random.default_rng(11)
    b = rng.standard_normal(100)
    ours_fn, scipy_fn = getattr(L, name), getattr(sla, name)
    x_ours, info = ours_fn(s, b, rtol=1e-6, maxiter=400)
    assert info == 0
    x_sp, info_sp = scipy_fn(s, b, rtol=1e-6, maxiter=400)
    assert info_sp == 0
    # both solve the same system; compare through the residual, which is
    # dtype-fair (ours runs f32)
    assert (np.linalg.norm(d @ x_ours - b)
            <= 2e-3 * np.linalg.norm(b))
    np.testing.assert_allclose(x_ours, x_sp, atol=5e-3)
