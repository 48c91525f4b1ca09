"""Hybrid DIA+LanePack operator, preconditioned CG, and column-split
distributed SpMV."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops.operator import SpmvOperator, split_bands
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import cg_solve, jacobi_preconditioner, pcg_solve


def _banded_plus_noise(rng, n=300):
    a = np.zeros((n, n), dtype=np.float64)
    i = np.arange(n)
    a[i, i] = 4.0
    a[i[:-1], i[:-1] + 1] = -1.0
    a[i[:-1] + 1, i[:-1]] = -1.0
    # sparse random off-band noise
    mask = rng.random((n, n)) < 0.005
    a = a + mask * rng.standard_normal((n, n)) * 0.1
    return a


def test_split_bands():
    rng = np.random.default_rng(0)
    a = _banded_plus_noise(rng)
    A = CsrMatrix.from_dok(DokMatrix.from_dense(a))
    banded, residual = split_bands(A)
    assert banded.nnz() + residual.nnz() == A.nnz()
    # bands cover the tridiagonal
    assert banded.nnz() >= 3 * 298
    np.testing.assert_allclose(
        banded.to_dense() + residual.to_dense(), a, rtol=0, atol=0
    )


def test_hybrid_operator():
    rng = np.random.default_rng(1)
    a = _banded_plus_noise(rng)
    A = CsrMatrix.from_dok(DokMatrix.from_dense(a.astype(np.float32)))
    op = SpmvOperator(A)
    assert op.format == "hybrid"
    x = rng.standard_normal(300).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op(x)), a.astype(np.float32) @ x, rtol=1e-3, atol=1e-3
    )


def test_pcg_converges_faster_or_equal():
    A = poisson_2d_csr(24, dtype=np.float32)
    op = SpmvOperator(A)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(24 * 24).astype(np.float32)
    plain = cg_solve(op, b, tol=1e-5, maxiter=3000)
    pre = pcg_solve(op, b, jacobi_preconditioner(A), tol=1e-5, maxiter=3000)
    r = A.to_dense().astype(np.float64) @ np.asarray(pre.x, np.float64) - b
    assert np.linalg.norm(r) <= 1e-3 * np.linalg.norm(b)
    # Jacobi on constant-diagonal Poisson is a scaling: same iteration count
    assert int(pre.iterations) <= int(plain.iterations) + 1


def test_pcg_helps_on_scaled_problem():
    # badly scaled diagonal: Jacobi should cut iterations substantially
    rng = np.random.default_rng(3)
    n = 200
    d = 10.0 ** rng.uniform(-2, 2, n)
    m = rng.standard_normal((n, n)) * 0.01
    a = (m @ m.T + np.diag(d) + 0.5 * np.eye(n)).astype(np.float32)
    A = CsrMatrix.from_dok(DokMatrix.from_dense(a))
    b = rng.standard_normal(n).astype(np.float32)
    mv = lambda v: jnp.asarray(a) @ v
    plain = cg_solve(mv, b, tol=1e-6, maxiter=5000)
    pre = pcg_solve(mv, b, jacobi_preconditioner(A), tol=1e-6, maxiter=5000)
    assert int(pre.iterations) < int(plain.iterations)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from sparse_matrix_tpu.parallel import make_mesh

    return make_mesh(8)


def test_colsplit_spmv(mesh):
    from sparse_matrix_tpu.parallel import dist_spmv_colsplit, shard_ell_by_cols

    rng = np.random.default_rng(4)
    a = (rng.random((64, 48)) < 0.1) * rng.standard_normal((64, 48))
    A = CsrMatrix.from_dok(DokMatrix.from_dense(a.astype(np.float32)))
    ev, ec, cols_pad = shard_ell_by_cols(A, mesh)
    x = np.zeros(cols_pad, np.float32)
    x[:48] = rng.standard_normal(48)
    xj = jax.device_put(
        jnp.asarray(x), jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("rows"))
    )
    y = np.asarray(dist_spmv_colsplit(ev, ec, xj, mesh))[:64]
    np.testing.assert_allclose(y, a.astype(np.float32) @ x[:48], rtol=1e-4, atol=1e-4)


def test_hybrid_hyper_sparse_residual_routes_to_ell():
    # regression: a hyper-sparse residual used to build a LanePack plan whose
    # scalar-prefetch arrays blew the 1MB SMEM budget at scale
    rng = np.random.default_rng(8)
    n = 1_000_000  # the guard trips only at scale (~>25K slabs)
    i = np.arange(n)
    rows = np.concatenate([i, i[:-1], rng.integers(0, n, n // 2)])
    cols = np.concatenate([i, i[:-1] + 1, rng.integers(0, n, n // 2)])
    vals = np.concatenate(
        [np.full(n, 4.0), np.full(n - 1, -1.0), rng.standard_normal(n // 2) * 0.01]
    ).astype(np.float32)
    from sparse_matrix_tpu.formats.csr import CsrMatrix as C

    A = C.from_coo(n, n, rows, cols, vals)
    op = SpmvOperator(A)
    assert op.format == "hybrid"
    assert op._plan is None and op._ell is not None  # residual went to ELL
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(op(x))
    for j in rng.integers(0, n, 10):
        lo, hi = int(A.offsets[j]), int(A.offsets[j + 1])
        ref = float(A.vals[lo:hi].astype(np.float64) @ x[A.indices[lo:hi].astype(np.int64)])
        assert abs(float(y[j]) - ref) <= 1e-3 + 1e-3 * abs(ref)
