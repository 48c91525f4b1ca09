"""Chebyshev semi-iteration + Hutchinson estimator tests."""

import numpy as np
import pytest

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import (
    chebyshev_solve,
    diag_estimate,
    poisson_2d_csr,
    trace_estimate,
)


def test_chebyshev_solves_poisson():
    p = poisson_2d_csr(24, dtype=np.float32)
    op = SpmvOperator(p, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(p.rows).astype(np.float32)
    res = chebyshev_solve(op, b, n=p.rows, tol=1e-5, maxiter=3000)
    x = np.asarray(res.x, dtype=np.float64)
    d = p.to_dense().astype(np.float64)
    assert np.linalg.norm(d @ x - b) < 1e-4 * np.linalg.norm(b)
    # with exact bounds it should match CG's asymptotic rate (not 10x more)
    from sparse_matrix_tpu.solvers.cg import cg_solve

    res_cg = cg_solve(op, b, tol=1e-5, maxiter=3000)
    assert int(res.iterations) < 4 * int(res_cg.iterations)


def test_chebyshev_explicit_bounds_and_identity():
    import jax.numpy as jnp

    b = np.ones(16, np.float32) * 3.0
    res = chebyshev_solve(
        lambda v: 2.0 * v, jnp.asarray(b), lam_bounds=(2.0, 2.0), tol=1e-6, maxiter=50
    )
    np.testing.assert_allclose(np.asarray(res.x), b / 2.0, rtol=1e-5)


def test_chebyshev_rejects_nonpositive_interval():
    with pytest.raises(ValueError, match="lam_min > 0"):
        chebyshev_solve(lambda v: v, np.ones(4, np.float32), lam_bounds=(-1.0, 2.0))
    with pytest.raises(ValueError, match="lam_bounds or n"):
        chebyshev_solve(lambda v: v, np.ones(4, np.float32))


def test_trace_estimate_matches_exact():
    rng = np.random.default_rng(1)
    n = 300
    d = (rng.random((n, n)) < 0.05) * rng.standard_normal((n, n))
    d = (d + d.T) / 2
    np.fill_diagonal(d, rng.standard_normal(n) * 3)
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d.astype(np.float64)))
    op = SpmvOperator(a, dtype=np.float32)
    res = trace_estimate(op, n, probes=256, seed=0)
    exact = float(np.trace(d))
    assert abs(float(res.estimate) - exact) < 4 * float(res.stderr) + 1e-3
    # the error bar itself must be meaningful
    assert float(res.stderr) < 0.2 * max(abs(exact), 1.0) + 5.0


def test_diag_estimate_diagonal_matrix_exact():
    """For diagonal A the Hutchinson diagonal estimator is exact for any
    probe count (z * (A z) = diag * z^2 = diag)."""
    rng = np.random.default_rng(2)
    dvals = rng.standard_normal(64).astype(np.float32)
    import jax.numpy as jnp

    dj = jnp.asarray(dvals)
    res = diag_estimate(lambda z: dj[:, None] * z if z.ndim == 2 else dj * z,
                        64, probes=4, seed=1)
    np.testing.assert_allclose(np.asarray(res.estimate), dvals, rtol=1e-5, atol=1e-6)
    assert float(np.max(np.asarray(res.stderr))) < 1e-5


def test_diag_estimate_converges():
    rng = np.random.default_rng(3)
    p = poisson_2d_csr(12, dtype=np.float32)
    op = SpmvOperator(p, dtype=np.float32)
    res = diag_estimate(op, p.rows, probes=512, seed=2)
    exact = np.diag(p.to_dense())
    err = np.abs(np.asarray(res.estimate) - exact)
    # loose: stochastic, but 512 probes on a 5-point stencil is tight
    assert np.median(err) < 0.2


def test_block_jacobi_preconditioner_exact_for_block_diagonal():
    """A truly block-diagonal SPD matrix: block-Jacobi M^{-1} r == A^{-1} r
    (one PCG iteration converges)."""
    from sparse_matrix_tpu.core import DokMatrix
    from sparse_matrix_tpu.formats import CsrMatrix
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import block_jacobi_preconditioner
    from sparse_matrix_tpu.solvers.cg import pcg_solve

    rng = np.random.default_rng(0)
    n, bs = 300, 128  # ragged final block
    d = np.zeros((n, n))
    for b0 in range(0, n, bs):
        w = min(bs, n - b0)
        blk = rng.standard_normal((w, w))
        blk = blk @ blk.T + np.eye(w) * w
        d[b0:b0 + w, b0:b0 + w] = blk
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    m_inv = block_jacobi_preconditioner(a)
    r = rng.standard_normal(n).astype(np.float32)
    x = np.asarray(m_inv(r)).astype(np.float64)
    ref = np.linalg.solve(d, r)
    np.testing.assert_allclose(x, ref, rtol=5e-4, atol=5e-4)
    res = pcg_solve(SpmvOperator(a, dtype=np.float32), r, m_inv, tol=1e-5, maxiter=50)
    assert int(res.iterations) <= 3


def test_block_jacobi_cuts_iterations_on_poisson():
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import block_jacobi_preconditioner
    from sparse_matrix_tpu.solvers.cg import cg_solve, pcg_solve

    p = poisson_2d_csr(24, dtype=np.float32)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(p.rows).astype(np.float32)
    op = SpmvOperator(p, dtype=np.float32)
    plain = cg_solve(op, b, tol=1e-5, maxiter=2000)
    m_inv = block_jacobi_preconditioner(p)
    pre = pcg_solve(op, b, m_inv, tol=1e-5, maxiter=2000)
    assert int(pre.iterations) < int(plain.iterations)
    x = np.asarray(pre.x, dtype=np.float64)
    assert np.linalg.norm(p.to_dense().astype(np.float64) @ x - b) < 1e-4 * np.linalg.norm(b)
    # block apply broadcasts
    R = rng.standard_normal((p.rows, 3)).astype(np.float32)
    Y = np.asarray(m_inv(R))
    for k in range(3):
        np.testing.assert_allclose(
            Y[:, k], np.asarray(m_inv(R[:, k])), rtol=1e-4, atol=1e-6
        )  # f32 batched-vs-single matmul reduction order


def test_chebyshev_preconditioner_pcg():
    """p_d(A) ~= A^{-1} is SPD on a positive interval: PCG iterations drop
    roughly by the polynomial degree's worth of work."""
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import chebyshev_preconditioner
    from sparse_matrix_tpu.solvers.cg import cg_solve, pcg_solve

    p = poisson_2d_csr(24, dtype=np.float32)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(p.rows).astype(np.float32)
    op = SpmvOperator(p, dtype=np.float32)
    plain = cg_solve(op, b, tol=1e-5, maxiter=3000)
    m_inv = chebyshev_preconditioner(op, n=p.rows, degree=8)
    pre = pcg_solve(op, b, m_inv, tol=1e-5, maxiter=3000)
    assert int(pre.iterations) * 2 < int(plain.iterations)  # >= 2x fewer
    x = np.asarray(pre.x, dtype=np.float64)
    assert np.linalg.norm(p.to_dense().astype(np.float64) @ x - b) < 1e-4 * np.linalg.norm(b)


def test_chebyshev_preconditioner_validates_bounds():
    import pytest

    from sparse_matrix_tpu.solvers import chebyshev_preconditioner

    with pytest.raises(ValueError, match="lam_min > 0"):
        chebyshev_preconditioner(lambda v: v, lam_bounds=(-1.0, 1.0))
    with pytest.raises(ValueError, match="lam_bounds or n"):
        chebyshev_preconditioner(lambda v: v)
