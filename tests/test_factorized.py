"""Factor-object API (solvers/factorized.py): splu / spilu / factorized."""

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.solvers import factorized, spilu, splu


def _random_system(seed, n=80, density=0.08):
    rng = np.random.default_rng(seed)
    A = (
        scipy_sparse.random(
            n, n, density=density, random_state=rng,
            data_rvs=lambda k: rng.standard_normal(k),
        )
        + scipy_sparse.eye(n) * 8.0
    ).tocsr()
    A.sort_indices()
    return CsrMatrix.from_scipy(A), A, rng


@pytest.mark.parametrize("permc_spec", ["RCM", "ND", "NATURAL"])
def test_splu_solves_exactly(permc_spec):
    M, A, rng = _random_system(0)
    f = splu(M, permc_spec=permc_spec)
    b = rng.standard_normal(80)
    x = f.solve(b)
    assert np.linalg.norm(A @ x - b) <= 1e-10 * np.linalg.norm(b)
    # same factorization solves the TRANSPOSED system
    xt = f.solve(b, trans="T")
    assert np.linalg.norm(A.T @ xt - b) <= 1e-10 * np.linalg.norm(b)
    # block RHS
    B = rng.standard_normal((80, 3))
    X = f.solve(B)
    assert np.linalg.norm(A @ X - B) <= 1e-10 * np.linalg.norm(B)


def test_splu_matches_scipy_superlu():
    sl = pytest.importorskip("scipy.sparse.linalg")
    M, A, rng = _random_system(1)
    b = rng.standard_normal(80)
    np.testing.assert_allclose(
        splu(M).solve(b), sl.splu(A.tocsc()).solve(b), rtol=1e-9, atol=1e-12
    )


def test_factorized_is_reusable():
    M, A, rng = _random_system(2)
    solve = factorized(M)
    for _ in range(3):
        b = rng.standard_normal(80)
        assert np.linalg.norm(A @ solve(b) - b) <= 1e-10 * np.linalg.norm(b)


def test_spilu_tight_tolerance_is_near_exact():
    M, A, rng = _random_system(3)
    g = spilu(M, drop_tol=1e-10, fill_per_row=80)
    b = rng.standard_normal(80)
    x = g.solve(b)
    assert np.linalg.norm(A @ x - b) <= 1e-6 * np.linalg.norm(b)
    xt = g.solve(b, trans="T")
    assert np.linalg.norm(A.T @ xt - b) <= 1e-6 * np.linalg.norm(b)


def test_spilu_coarse_is_a_contraction():
    """A coarse ILUT apply must still beat the identity preconditioner:
    ||A M^-1 b - b|| << ||b||."""
    M, A, rng = _random_system(4)
    g = spilu(M, drop_tol=1e-2, fill_per_row=4)
    b = rng.standard_normal(80)
    z = g.solve(b)
    assert np.linalg.norm(A @ z - b) <= 0.5 * np.linalg.norm(b)
    assert g.nnz < splu(M).nnz


def test_bad_args_raise():
    M, _A, _rng = _random_system(5)
    with pytest.raises(ValueError, match="permc_spec"):
        splu(M, permc_spec="COLAMD")
    with pytest.raises(ValueError, match="trans"):
        splu(M).solve(np.zeros(80), trans="H")
