"""LOBPCG block eigensolver: smallest/largest eigenpairs vs dense eigh,
preconditioned variant, and the SpmvOperator.matmat wiring."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import lobpcg, poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import jacobi_preconditioner


def _poisson_op(n_side):
    m = poisson_2d_csr(n_side, dtype=np.float32)
    return m, SpmvOperator(m)


def test_lobpcg_smallest_matches_dense():
    m, op = _poisson_op(12)
    rng = np.random.default_rng(0)
    k = 4
    x0 = jnp.asarray(rng.standard_normal((m.rows, k)).astype(np.float32))
    res = lobpcg(op.matmat, x0, tol=1e-5, maxiter=300)
    dense_ev = np.linalg.eigvalsh(m.to_dense())
    np.testing.assert_allclose(
        np.sort(np.asarray(res.eigenvalues)), dense_ev[:k], rtol=1e-3, atol=1e-4
    )
    # eigenvectors: residual check against the operator
    x = np.asarray(res.eigenvectors)
    r = m.to_dense().astype(np.float64) @ x - x * np.asarray(res.eigenvalues)[None, :]
    assert np.linalg.norm(r, axis=0).max() < 1e-3


def test_lobpcg_largest():
    m, op = _poisson_op(10)
    rng = np.random.default_rng(1)
    k = 2
    x0 = jnp.asarray(rng.standard_normal((m.rows, k)).astype(np.float32))
    res = lobpcg(op.matmat, x0, largest=True, tol=1e-5, maxiter=300)
    dense_ev = np.linalg.eigvalsh(m.to_dense())
    np.testing.assert_allclose(
        np.sort(np.asarray(res.eigenvalues)), dense_ev[-k:], rtol=1e-3, atol=1e-4
    )


def test_lobpcg_preconditioned_converges_faster():
    # a diagonally-scaled Poisson: Jacobi preconditioning must cut iterations
    m, _ = _poisson_op(12)
    rng = np.random.default_rng(2)
    d = (1.0 + 9.0 * rng.random(m.rows)).astype(np.float32)
    import sparse_matrix_tpu.formats.csr as csr_mod

    scaled = csr_mod.CsrMatrix(
        m.rows, m.cols,
        (m.vals * d[m.row_ids()] * d[m.indices.astype(np.int64)]).astype(np.float32),
        m.indices, m.offsets, is_sorted=m.is_sorted,
    )
    op = SpmvOperator(scaled)
    prec = jacobi_preconditioner(scaled)
    k = 3
    x0 = jnp.asarray(rng.standard_normal((m.rows, k)).astype(np.float32))
    res_plain = lobpcg(op.matmat, x0, tol=1e-4, maxiter=400)
    res_prec = lobpcg(op.matmat, x0, precond=prec, tol=1e-4, maxiter=400)
    dense_ev = np.linalg.eigvalsh(scaled.to_dense())
    np.testing.assert_allclose(
        np.sort(np.asarray(res_prec.eigenvalues)), dense_ev[:k], rtol=1e-3, atol=1e-3
    )
    assert int(res_prec.iterations) <= int(res_plain.iterations)


def test_lobpcg_errors():
    m, op = _poisson_op(4)
    with pytest.raises(ValueError):
        lobpcg(op.matmat, jnp.ones(m.rows, jnp.float32))
    with pytest.raises(ValueError):
        lobpcg(op.matmat, jnp.ones((m.rows, m.rows), jnp.float32))
