"""CG solver tests (north-star workload: SpMV-driven end-to-end)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sparse_matrix_tpu.formats.lanepack import plan_lanepack
from sparse_matrix_tpu.ops.spmv import ell_from_csr, spmv_ell_xla, spmv_lanepack
from sparse_matrix_tpu.solvers import cg_solve, poisson_2d_csr


def test_poisson_structure():
    n = 6
    A = poisson_2d_csr(n)
    assert A.shape == (36, 36)
    assert A.invariants()
    d = A.to_dense()
    assert np.allclose(d, d.T)
    assert np.all(np.diag(d) == 4)
    # interior point has 4 neighbors
    mid = (n // 2) * n + n // 2
    assert (d[mid] != 0).sum() == 5


def test_cg_small_dense_spd():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((20, 20))
    a = (m @ m.T + 20 * np.eye(20)).astype(np.float32)
    b = rng.standard_normal(20).astype(np.float32)
    res = cg_solve(lambda v: jnp.asarray(a) @ v, b, tol=1e-6, maxiter=200)
    x = np.asarray(res.x)
    np.testing.assert_allclose(a @ x, b, atol=1e-3)


@pytest.mark.parametrize("n", [16, 32])
def test_cg_poisson_lanepack(n):
    A = poisson_2d_csr(n, dtype=np.float32)
    plan = plan_lanepack(A)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n * n).astype(np.float32)
    res = cg_solve(lambda v: spmv_lanepack(plan, v), b, tol=1e-5, maxiter=2000)
    x = np.asarray(res.x)
    # verify with float64 residual
    r = A.to_dense().astype(np.float64) @ x.astype(np.float64) - b
    assert np.linalg.norm(r) <= 1e-3 * np.linalg.norm(b)
    assert int(res.iterations) < 2000


def test_cg_poisson_ell():
    n = 24
    A = poisson_2d_csr(n, dtype=np.float32)
    ev, ec = ell_from_csr(A)
    evj, ecj = jnp.asarray(ev), jnp.asarray(ec)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n * n).astype(np.float32)
    res = cg_solve(lambda v: spmv_ell_xla(evj, ecj, v), b, tol=1e-5, maxiter=2000)
    r = A.to_dense().astype(np.float64) @ np.asarray(res.x, dtype=np.float64) - b
    assert np.linalg.norm(r) <= 1e-3 * np.linalg.norm(b)


def test_cg_solve_multi():
    from sparse_matrix_tpu.formats.dia import try_dia_from_csr
    from sparse_matrix_tpu.ops.spmm import spmm_dia
    from sparse_matrix_tpu.solvers import cg_solve_multi

    n = 20
    A = poisson_2d_csr(n, dtype=np.float32)
    d = try_dia_from_csr(A)
    rng = np.random.default_rng(7)
    B = rng.standard_normal((n * n, 6)).astype(np.float32)
    res = cg_solve_multi(lambda X: spmm_dia(d, X), B, tol=1e-5, maxiter=3000)
    X = np.asarray(res.x, dtype=np.float64)
    R = A.to_dense().astype(np.float64) @ X - B
    for k in range(6):
        assert np.linalg.norm(R[:, k]) <= 2e-3 * np.linalg.norm(B[:, k]), k


def test_pcg_solve_multi_jacobi():
    """Block Jacobi-PCG: converges per column, fewer iterations than
    unpreconditioned block CG on a badly scaled SPD operator."""
    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import (
        cg_solve_multi,
        jacobi_preconditioner,
        pcg_solve_multi,
    )

    # Poisson with a wildly varying diagonal scaling: s A s (still SPD)
    n = 16
    A = poisson_2d_csr(n, dtype=np.float64)
    rng = np.random.default_rng(11)
    s = np.exp(rng.uniform(-3, 3, size=n * n))
    rid = A.row_ids().astype(np.int64)
    As = CsrMatrix(
        A.rows, A.cols,
        (A.vals * s[rid] * s[A.indices.astype(np.int64)]).astype(np.float32),
        A.indices.copy(), A.offsets.copy(), is_sorted=A.is_sorted,
    )
    op = SpmvOperator(As)
    B = rng.standard_normal((n * n, 5)).astype(np.float32)

    res_p = pcg_solve_multi(
        op.matmat, B, jacobi_preconditioner(As), tol=1e-6, maxiter=4000
    )
    X = np.asarray(res_p.x, dtype=np.float64)
    R = As.to_dense().astype(np.float64) @ X - B
    for k in range(5):
        assert np.linalg.norm(R[:, k]) <= 2e-3 * np.linalg.norm(B[:, k]), k

    res_u = cg_solve_multi(op.matmat, B, tol=1e-6, maxiter=4000)
    assert int(res_p.iterations) * 2 < int(res_u.iterations), (
        int(res_p.iterations), int(res_u.iterations),
    )
