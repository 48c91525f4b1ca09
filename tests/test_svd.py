"""Truncated sparse SVD tests (solvers/svd.py) vs dense numpy oracle."""

import numpy as np
import pytest

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.solvers import svds, svds_csr


def _rand_csr(rng, m, n, dens=0.06):
    d = ((rng.random((m, n)) < dens) * rng.standard_normal((m, n))).astype(np.float64)
    return CsrMatrix.from_dok(DokMatrix.from_dense(d)), d


@pytest.mark.parametrize("shape", [(120, 80), (80, 120), (100, 100)])
def test_svds_csr_top_k_matches_dense(shape):
    rng = np.random.default_rng(shape[0])
    a, d = _rand_csr(rng, *shape)
    k = 5
    res = svds_csr(a, k=k, steps=40)
    s_ref = np.linalg.svd(d, compute_uv=False)[:k]
    np.testing.assert_allclose(np.asarray(res.s), s_ref, rtol=2e-3)
    # triplet residuals ||A v - s u|| small relative to sigma_1
    u, s, v = np.asarray(res.u), np.asarray(res.s), np.asarray(res.v)
    for i in range(k):
        r = np.linalg.norm(d @ v[:, i] - s[i] * u[:, i])
        assert r < 5e-3 * s_ref[0], (i, r)
    # orthonormality of the returned vectors
    np.testing.assert_allclose(u.T @ u, np.eye(k), atol=5e-3)
    np.testing.assert_allclose(v.T @ v, np.eye(k), atol=5e-3)


def test_svds_pluggable_operator():
    """svds on bare callables (the SpmvOperator-free path)."""
    rng = np.random.default_rng(1)
    d = rng.standard_normal((50, 30)).astype(np.float32)
    import jax.numpy as jnp

    dj = jnp.asarray(d)
    res = svds(lambda x: dj @ x, lambda y: dj.T @ y, d.shape, k=3, steps=30)
    s_ref = np.linalg.svd(d, compute_uv=False)[:3]
    np.testing.assert_allclose(np.asarray(res.s), s_ref, rtol=2e-3)


def test_svds_k_out_of_range():
    rng = np.random.default_rng(2)
    a, _ = _rand_csr(rng, 20, 10)
    with pytest.raises(ValueError, match="out of range"):
        svds_csr(a, k=11)


def test_svds_low_rank_exact():
    """Rank-2 matrix: the two nonzero singular values are found exactly
    and the rest of the spectrum is ~0."""
    rng = np.random.default_rng(3)
    u = rng.standard_normal((60, 2))
    v = rng.standard_normal((2, 40))
    d = (u * np.array([5.0, 2.0])) @ v
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    res = svds_csr(a, k=4, steps=24)
    s_ref = np.linalg.svd(d, compute_uv=False)[:4]
    np.testing.assert_allclose(np.asarray(res.s)[:2], s_ref[:2], rtol=1e-3)
    assert np.asarray(res.s)[2:].max() < 1e-3 * s_ref[0]
