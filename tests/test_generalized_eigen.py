"""Generalized symmetric eigenproblems A x = lambda M x, differential vs
scipy (the working analog of the reference's deleted MKL differential
backend, /root/reference/fuzz/Cargo.toml:25-33)."""

import numpy as np
import pytest

from sparse_matrix_tpu.formats.construct import diags
from sparse_matrix_tpu.solvers import eigsh_generalized, lobpcg_generalized
from sparse_matrix_tpu.solvers.poisson import poisson_2d_csr

scipy_sla = pytest.importorskip("scipy.sparse.linalg")


def _pencil(n=10):
    a = poisson_2d_csr(n, dtype=np.float64)
    nn = n * n
    # SPD mass-like M: diagonally dominant tridiagonal
    m = diags([0.25, 1.0, 0.25], [-1, 0, 1], shape=(nn, nn), dtype=np.float64)
    return a, m


def _scipy_pair(a, m):
    return a.to_scipy().tocsc(), m.to_scipy().tocsc()


def test_generalized_smallest_vs_scipy():
    a, m = _pencil()
    vals, vecs = eigsh_generalized(a, m, 4, which="SA", m=90)
    a_s, m_s = _scipy_pair(a, m)
    ref = np.sort(scipy_sla.eigsh(a_s, 4, M=m_s, sigma=0.0)[0])
    np.testing.assert_allclose(vals, ref, rtol=1e-8)
    # scipy normalization: V^T M V = I
    g = vecs.T @ m.dot(vecs)
    np.testing.assert_allclose(g, np.eye(4), atol=1e-8)
    # residual of the pencil
    r = a.dot(vecs) - m.dot(vecs) * vals[None, :]
    assert np.linalg.norm(r, axis=0).max() < 1e-7


def test_generalized_largest_vs_scipy():
    a, m = _pencil()
    vals, _ = eigsh_generalized(a, m, 3, which="LA", m=90)
    a_s, m_s = _scipy_pair(a, m)
    ref = np.sort(scipy_sla.eigsh(a_s, 3, M=m_s, which="LA")[0])
    np.testing.assert_allclose(vals, ref, rtol=1e-7)


def test_generalized_shift_invert_vs_scipy():
    a, m = _pencil()
    sigma = 1.5
    vals, vecs = eigsh_generalized(a, m, 4, sigma=sigma, m=80)
    a_s, m_s = _scipy_pair(a, m)
    ref = np.sort(scipy_sla.eigsh(a_s, 4, M=m_s, sigma=sigma)[0])
    np.testing.assert_allclose(np.sort(vals), ref, rtol=1e-8)
    r = a.dot(vecs) - m.dot(vecs) * vals[None, :]
    assert np.linalg.norm(r, axis=0).max() < 1e-7


def test_facade_eigsh_with_m():
    from sparse_matrix_tpu.sparse.linalg import eigsh

    a, m = _pencil(8)
    vals, vecs = eigsh(a, 3, which="SA", M=m, maxiter=60)
    a_s, m_s = _scipy_pair(a, m)
    ref = np.sort(scipy_sla.eigsh(a_s, 3, M=m_s, sigma=0.0)[0])
    np.testing.assert_allclose(vals, ref, rtol=1e-8)
    assert vecs.shape == (64, 3)


def test_facade_lobpcg_with_b():
    from sparse_matrix_tpu.sparse.linalg import lobpcg

    a, m = _pencil(8)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((64, 3))
    vals, vecs = lobpcg(a, x0, B=m, largest=False)
    a_s, m_s = _scipy_pair(a, m)
    ref = np.sort(scipy_sla.eigsh(a_s, 3, M=m_s, sigma=0.0)[0])
    np.testing.assert_allclose(np.sort(vals), ref, rtol=1e-7)
    # scipy lobpcg(largest=False) returns ascending; check pairing
    r = a.dot(vecs) - m.dot(vecs) * vals[None, :]
    assert np.linalg.norm(r, axis=0).max() < 1e-6


def test_lobpcg_generalized_largest_order():
    a, m = _pencil(8)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((64, 2))
    vals, _ = lobpcg_generalized(a, x0, m, largest=True, m=70)
    assert vals[0] >= vals[1]  # descending, scipy lobpcg largest order
    a_s, m_s = _scipy_pair(a, m)
    ref = scipy_sla.eigsh(a_s, 2, M=m_s, which="LA")[0]
    np.testing.assert_allclose(np.sort(vals), np.sort(ref), rtol=1e-7)


def _unsym(n=10, seed=5):
    # Poisson + a small skew part: unsymmetric A, real spectrum not assumed
    a = poisson_2d_csr(n, dtype=np.float64)
    s = a.to_scipy().tolil()
    rng = np.random.default_rng(seed)
    nn = n * n
    for _ in range(3 * n):
        i, j = rng.integers(0, nn, 2)
        if i != j:
            s[i, j] += 0.3 * rng.standard_normal()
    from sparse_matrix_tpu.formats.csr import CsrMatrix

    return CsrMatrix.from_scipy(s.tocsr())


def test_eigs_generalized_lm_vs_scipy():
    a = _unsym()
    nn = a.rows
    m = diags([0.25, 1.0, 0.25], [-1, 0, 1], shape=(nn, nn), dtype=np.float64)
    from sparse_matrix_tpu.solvers import eigs_generalized

    vals, vecs = eigs_generalized(a, m, 4)
    a_s, m_s = a.to_scipy().tocsc(), m.to_scipy().tocsc()
    ref = scipy_sla.eigs(a_s, 4, M=m_s, which="LM")[0]
    np.testing.assert_allclose(
        np.sort(np.abs(vals)), np.sort(np.abs(ref)), rtol=1e-7
    )
    # pencil residual of every returned pair
    r = (a.dot(vecs.real) + 1j * a.dot(vecs.imag)
         - (m.dot(vecs.real) + 1j * m.dot(vecs.imag)) * vals[None, :])
    assert np.linalg.norm(r, axis=0).max() < 1e-7


def test_eigs_generalized_shift_invert_vs_scipy():
    a = _unsym(8, seed=6)
    nn = a.rows
    m = diags([0.2, 1.0, 0.2], [-1, 0, 1], shape=(nn, nn), dtype=np.float64)
    from sparse_matrix_tpu.solvers import eigs_generalized

    sigma = 0.9
    vals, _ = eigs_generalized(a, m, 3, sigma=sigma)
    a_s, m_s = a.to_scipy().tocsc(), m.to_scipy().tocsc()
    ref = scipy_sla.eigs(a_s, 3, M=m_s, sigma=sigma)[0]
    np.testing.assert_allclose(
        np.sort_complex(np.round(vals, 9)),
        np.sort_complex(np.round(ref, 9)), rtol=1e-6
    )


def test_facade_eigs_with_m():
    from sparse_matrix_tpu.sparse.linalg import eigs

    a = _unsym(8, seed=7)
    nn = a.rows
    m = diags([0.25, 1.0, 0.25], [-1, 0, 1], shape=(nn, nn), dtype=np.float64)
    vals, vecs = eigs(a, 3, M=m)
    ref = scipy_sla.eigs(a.to_scipy().tocsc(), 3, M=m.to_scipy().tocsc())[0]
    np.testing.assert_allclose(
        np.sort(np.abs(vals)), np.sort(np.abs(ref)), rtol=1e-7
    )
    assert vecs.shape == (nn, 3)
