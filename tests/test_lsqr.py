"""LSQR least-squares solver: overdetermined, underdetermined, consistent
square, and zero-rhs systems; differential against scipy.sparse.linalg.lsqr
and against the normal-equations solution."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.solvers import lsqr_solve


def _matvecs(dense):
    a = jnp.asarray(dense)
    return (lambda v: a @ v), (lambda u: a.T @ u)


def test_lsqr_overdetermined_matches_scipy():
    sla = pytest.importorskip("scipy.sparse.linalg")
    rng = np.random.default_rng(0)
    m, n = 120, 40
    dense = ((rng.random((m, n)) < 0.15) * rng.standard_normal((m, n))).astype(np.float32)
    # ensure full column rank
    dense[:n] += np.eye(n, dtype=np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    mv, rmv = _matvecs(dense)
    res = lsqr_solve(mv, rmv, jnp.asarray(b), n=n, tol=1e-6, maxiter=500)
    x = np.asarray(res.x)
    x_sp = sla.lsqr(dense.astype(np.float64), b.astype(np.float64), atol=1e-10, btol=1e-10)[0]
    np.testing.assert_allclose(x, x_sp, rtol=2e-3, atol=2e-3)
    # normal equations: A^T (A x - b) ~ 0
    atr = dense.T @ (dense @ x - b)
    assert np.linalg.norm(atr) < 1e-3 * np.linalg.norm(dense.T @ b)


def test_lsqr_consistent_square():
    rng = np.random.default_rng(1)
    n = 50
    dense = (rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)).astype(np.float32)
    dense += 5.0 * np.eye(n, dtype=np.float32)
    x_true = rng.standard_normal(n).astype(np.float32)
    b = dense @ x_true
    mv, rmv = _matvecs(dense)
    res = lsqr_solve(mv, rmv, jnp.asarray(b), n=n, tol=1e-7, maxiter=2000)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=2e-3, atol=2e-3)


def test_lsqr_underdetermined_min_norm_direction():
    # underdetermined: LSQR converges to the minimum-norm solution
    rng = np.random.default_rng(2)
    m, n = 30, 80
    dense = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    mv, rmv = _matvecs(dense)
    res = lsqr_solve(mv, rmv, jnp.asarray(b), n=n, tol=1e-7, maxiter=1000)
    x = np.asarray(res.x)
    # residual ~ 0 (system is consistent w.p. 1) and x in range(A^T)
    assert np.linalg.norm(dense @ x - b) < 1e-3 * np.linalg.norm(b)
    x_min = np.linalg.lstsq(dense.astype(np.float64), b.astype(np.float64), rcond=None)[0]
    np.testing.assert_allclose(x, x_min, rtol=5e-3, atol=5e-3)


def test_lsqr_zero_rhs():
    rng = np.random.default_rng(3)
    dense = rng.standard_normal((20, 10)).astype(np.float32)
    mv, rmv = _matvecs(dense)
    res = lsqr_solve(mv, rmv, jnp.zeros(20, jnp.float32), n=10)
    assert int(res.iterations) == 0
    np.testing.assert_array_equal(np.asarray(res.x), np.zeros(10, np.float32))


def test_lsqr_with_sparse_operator_and_device_transpose():
    # the intended wiring: SpmvOperator for A, transposed CSR operator for A^T
    rng = np.random.default_rng(4)
    m, n = 96, 64
    d = ((rng.random((m, n)) < 0.1) * rng.standard_normal((m, n))).astype(np.float32)
    d[:n] += np.eye(n, dtype=np.float32)
    A = CsrMatrix.from_coo(m, n, *np.nonzero(d), d[np.nonzero(d)])
    At = A.transpose()
    # CSR + its transpose agree with the dense mirror; run LSQR on the
    # jittable dense closures (device operators plug in the same way)
    np.testing.assert_allclose(At.to_dense(), d.T)
    av = jnp.asarray(d)
    mv_j = lambda v: av @ v
    rmv_j = lambda u: av.T @ u
    b = rng.standard_normal(m).astype(np.float32)
    res = lsqr_solve(mv_j, rmv_j, jnp.asarray(b), n=n, tol=1e-6, maxiter=500)
    x = np.asarray(res.x)
    atr = d.T @ (d @ x - b)
    assert np.linalg.norm(atr) < 1e-3 * max(1.0, np.linalg.norm(d.T @ b))


def test_lsqr_requires_n_or_x0():
    mv = lambda v: v
    with pytest.raises(ValueError):
        lsqr_solve(mv, mv, jnp.ones(4, jnp.float32))


# ---------------------------------------------------------------------------
# LSMR (solvers/lsmr.py)
# ---------------------------------------------------------------------------


def _dense_pair(Ad):
    import jax.numpy as jnp

    mv = lambda v: jnp.asarray(Ad, jnp.float32) @ v
    rmv = lambda u: jnp.asarray(Ad.T, jnp.float32) @ u
    return mv, rmv


def test_lsmr_matches_scipy_overdetermined():
    sl = pytest.importorskip("scipy.sparse.linalg")
    from sparse_matrix_tpu.solvers import lsmr_solve

    rng = np.random.default_rng(0)
    Ad = rng.standard_normal((120, 60)) * (rng.random((120, 60)) < 0.3)
    b = rng.standard_normal(120)
    mv, rmv = _dense_pair(Ad)
    res = lsmr_solve(mv, rmv, np.asarray(b, np.float32), n=60, tol=1e-6,
                     maxiter=3000)
    ref = sl.lsmr(Ad, b, atol=1e-12, btol=1e-12, maxiter=5000)[0]
    x = np.asarray(res.x, np.float64)
    obj = np.linalg.norm(b - Ad @ x)
    obj_ref = np.linalg.norm(b - Ad @ ref)
    assert obj <= obj_ref * (1 + 1e-5)
    # optimality: the normal-equations residual is tiny
    r = b - Ad @ x
    assert np.linalg.norm(Ad.T @ r) <= 1e-4 * np.linalg.norm(Ad) * np.linalg.norm(r)


def test_lsmr_damped_matches_scipy():
    sl = pytest.importorskip("scipy.sparse.linalg")
    from sparse_matrix_tpu.solvers import lsmr_solve

    rng = np.random.default_rng(1)
    Ad = rng.standard_normal((100, 50)) * (rng.random((100, 50)) < 0.3)
    b = rng.standard_normal(100)
    mv, rmv = _dense_pair(Ad)
    res = lsmr_solve(mv, rmv, np.asarray(b, np.float32), n=50, damp=0.7,
                     tol=1e-6, maxiter=3000)
    ref = sl.lsmr(Ad, b, damp=0.7, atol=1e-12, btol=1e-12)[0]
    x = np.asarray(res.x, np.float64)
    obj = np.linalg.norm(b - Ad @ x) ** 2 + 0.49 * np.linalg.norm(x) ** 2
    obj_ref = np.linalg.norm(b - Ad @ ref) ** 2 + 0.49 * np.linalg.norm(ref) ** 2
    np.testing.assert_allclose(obj, obj_ref, rtol=1e-5)


def test_lsmr_consistent_and_x0():
    from sparse_matrix_tpu.solvers import lsmr_solve

    rng = np.random.default_rng(2)
    Ad = rng.standard_normal((60, 120)) * (rng.random((60, 120)) < 0.3)
    b = rng.standard_normal(60)
    mv, rmv = _dense_pair(Ad)
    res = lsmr_solve(mv, rmv, np.asarray(b, np.float32), n=120, tol=1e-5,
                     maxiter=3000)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(b - Ad @ x) <= 2e-5 * np.linalg.norm(b)
    # warm start from a random x0 reaches the same objective
    x0 = (rng.standard_normal(120) * 0.1).astype(np.float32)
    res2 = lsmr_solve(mv, rmv, np.asarray(b, np.float32), x0=x0, tol=1e-5,
                      maxiter=3000)
    x2 = np.asarray(res2.x, np.float64)
    assert np.linalg.norm(b - Ad @ x2) <= 2e-5 * np.linalg.norm(b)


def test_lstsq_method_lsmr_on_csr():
    from sparse_matrix_tpu.solvers import lstsq
    from sparse_matrix_tpu.formats.construct import random_csr

    rng = np.random.default_rng(3)
    a = random_csr(90, 40, 0.2, rng)
    b = rng.standard_normal(90)
    res = lstsq(a, b, method="lsmr", tol=1e-6, maxiter=2000)
    res_ref = lstsq(a, b, tol=1e-6, maxiter=2000)  # LSQR
    Ad = a.to_scipy().toarray()
    o1 = np.linalg.norm(b - Ad @ np.asarray(res.x, float))
    o2 = np.linalg.norm(b - Ad @ np.asarray(res_ref.x, float))
    np.testing.assert_allclose(o1, o2, rtol=1e-4)
