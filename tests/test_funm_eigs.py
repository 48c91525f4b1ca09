"""expm_multiply (Chebyshev + scaled-Taylor) and general Arnoldi eigs."""

import numpy as np
import pytest

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.solvers import (
    eigs,
    expm_multiply,
    expm_multiply_csr,
    expm_multiply_sym,
    poisson_2d_csr,
)


def _sym_csr(rng, n, dens=0.06):
    d = (rng.random((n, n)) < dens) * rng.standard_normal((n, n))
    d = (d + d.T) / 2
    np.fill_diagonal(d, rng.standard_normal(n))
    return CsrMatrix.from_dok(DokMatrix.from_dense(d.astype(np.float64))), d


def test_expm_sym_matches_scipy():
    from scipy.linalg import expm

    rng = np.random.default_rng(0)
    a, d = _sym_csr(rng, 80)
    import jax.numpy as jnp

    dj = jnp.asarray(d.astype(np.float32))
    b = rng.standard_normal(80).astype(np.float32)
    for t in (0.5, 1.0, -0.7):
        y = np.asarray(expm_multiply_sym(lambda v: dj @ v, b, t, n=80))
        ref = expm(t * d) @ b
        np.testing.assert_allclose(y, ref, rtol=3e-4, atol=3e-4 * np.abs(ref).max())


def test_expm_sym_explicit_bounds_and_block():
    from scipy.linalg import expm

    rng = np.random.default_rng(1)
    a, d = _sym_csr(rng, 50)
    import jax.numpy as jnp

    dj = jnp.asarray(d.astype(np.float32))
    lo, hi = np.linalg.eigvalsh(d)[[0, -1]]
    B = rng.standard_normal((50, 3)).astype(np.float32)
    Y = np.asarray(
        expm_multiply_sym(lambda v: dj @ v, B, 0.8, lam_bounds=(lo, hi))
    )
    ref = expm(0.8 * d) @ B
    np.testing.assert_allclose(Y, ref, rtol=3e-4, atol=3e-4 * np.abs(ref).max())


def test_expm_sym_needs_bounds_or_n():
    with pytest.raises(ValueError, match="lam_bounds or n"):
        expm_multiply_sym(lambda v: v, np.ones(4, np.float32))


def test_expm_general_matches_scipy():
    from scipy.linalg import expm

    rng = np.random.default_rng(2)
    n = 60
    d = ((rng.random((n, n)) < 0.08) * rng.standard_normal((n, n))).astype(np.float64)
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    b = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(expm_multiply_csr(a, b, t=0.9))
    ref = expm(0.9 * d) @ b
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max())
    # negative t (backward step) too
    y2 = np.asarray(expm_multiply_csr(a, b, t=-0.4))
    ref2 = expm(-0.4 * d) @ b
    np.testing.assert_allclose(y2, ref2, rtol=2e-4, atol=2e-4 * np.abs(ref2).max())


def test_expm_heat_kernel_decays_poisson():
    """exp(-t L) on the Poisson Laplacian: mass decays, no blowup (the
    graph-diffusion use case)."""
    p = poisson_2d_csr(16, dtype=np.float32)
    rng = np.random.default_rng(3)
    b = np.abs(rng.standard_normal(p.rows)).astype(np.float32)
    y = np.asarray(expm_multiply_csr(p, b, t=-0.5))
    assert np.isfinite(y).all()
    assert np.linalg.norm(y) < np.linalg.norm(b)


def test_eigs_matches_numpy_general():
    rng = np.random.default_rng(4)
    n = 70
    d = ((rng.random((n, n)) < 0.1) * rng.standard_normal((n, n))).astype(np.float64)
    import jax.numpy as jnp

    dj = jnp.asarray(d.astype(np.float32))
    vals, vecs = eigs(lambda v: dj @ v, n, k=4, m=60)
    ref = np.linalg.eigvals(d)
    ref = ref[np.argsort(-np.abs(ref))][:4]
    np.testing.assert_allclose(np.abs(vals), np.abs(ref), rtol=2e-3)
    # eigen-residuals ||A v - lam v||
    for i in range(3):  # leading ones are the well-converged ones
        r = np.linalg.norm(d @ vecs[:, i] - vals[i] * vecs[:, i])
        assert r < 5e-3 * np.abs(ref[0]), (i, r)


def test_eigs_on_operator():
    from sparse_matrix_tpu.ops.operator import SpmvOperator

    p = poisson_2d_csr(12, dtype=np.float32)
    op = SpmvOperator(p, dtype=np.float32)
    vals, vecs = eigs(op, p.rows, k=2, m=50)
    ref = np.linalg.eigvalsh(p.to_dense().astype(np.float64))
    assert abs(abs(vals[0]) - ref[-1]) < 2e-3 * ref[-1]


def test_eigs_k_out_of_range():
    with pytest.raises(ValueError, match="out of range"):
        eigs(lambda v: v, 5, k=6)


def test_expm_multiply_time_grid_vs_scipy():
    import scipy.sparse.linalg as sla

    from sparse_matrix_tpu.sparse.linalg import expm_multiply
    from sparse_matrix_tpu.solvers.poisson import poisson_2d_csr

    A = poisson_2d_csr(6, dtype=np.float64) * (-1.0)  # decaying semigroup
    rng = np.random.default_rng(8)
    b = rng.standard_normal(36)
    ours = expm_multiply(A, b, start=0.0, stop=1.0, num=5)
    ref = sla.expm_multiply(A.to_scipy().tocsc(), b, start=0.0, stop=1.0,
                            num=5)
    assert ours.shape == (5, 36)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
    # single-t form unchanged
    one = expm_multiply(A, b, t=0.5)
    np.testing.assert_allclose(one, ref[2], rtol=2e-4, atol=2e-5)
