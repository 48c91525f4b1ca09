"""1-norm / condition estimators vs dense oracles."""

import numpy as np

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.solvers import condest, onenormest, poisson_2d_csr


def test_onenormest_close_to_true():
    rng = np.random.default_rng(0)
    for trial in range(8):
        n = int(rng.integers(10, 80))
        d = (rng.random((n, n)) < 0.3) * rng.standard_normal((n, n))
        est = onenormest(lambda v: d @ v, lambda v: d.T @ v, n)
        true = np.abs(d).sum(axis=0).max()
        assert est <= true * (1 + 1e-12)
        assert est >= 0.4 * true, (est, true)  # Hager is near-exact in practice


def test_condest_tracks_true_condition():
    rng = np.random.default_rng(1)
    n = 60
    d = (rng.random((n, n)) < 0.25) * rng.standard_normal((n, n))
    d += np.diag(np.sign(rng.standard_normal(n)) * 2.0)
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    est = condest(a)
    true = np.abs(d).sum(0).max() * np.abs(np.linalg.inv(d)).sum(0).max()
    assert 0.3 * true <= est <= true * (1 + 1e-9), (est, true)


def test_condest_poisson_grows_with_n():
    """kappa_1 of the 2-D Laplacian grows ~ n^2/h^2: the estimator must
    reproduce the trend (and stay below the true value)."""
    c16 = condest(poisson_2d_csr(16, dtype=np.float64))
    c32 = condest(poisson_2d_csr(32, dtype=np.float64))
    assert c32 > 2.5 * c16, (c16, c32)
