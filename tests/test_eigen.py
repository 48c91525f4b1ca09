"""Eigen solver tests."""

import numpy as np

from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import eigsh_extremal, power_iteration
from sparse_matrix_tpu.solvers.poisson import poisson_2d_csr


def test_power_iteration_poisson():
    n = 16
    A = poisson_2d_csr(n, dtype=np.float32)
    op = SpmvOperator(A)
    res = power_iteration(op, n * n, tol=1e-8, maxiter=3000)
    lam = float(res.eigenvalue)
    # exact largest eigenvalue of the 5-point Laplacian
    exact = 4 + 4 * np.sin(np.pi * n / (2 * (n + 1))) ** 2 * 2 - 4  # placeholder
    exact = 8 * np.sin(np.pi * n / (2 * (n + 1))) ** 2
    assert abs(lam - exact) < 0.05 * exact


def test_eigsh_extremal_poisson():
    n = 16
    A = poisson_2d_csr(n, dtype=np.float32)
    op = SpmvOperator(A)
    lo, hi = eigsh_extremal(op, n * n, m=80)
    exact_hi = 8 * np.sin(np.pi * n / (2 * (n + 1))) ** 2
    exact_lo = 8 * np.sin(np.pi / (2 * (n + 1))) ** 2
    assert abs(hi - exact_hi) < 0.05 * exact_hi
    assert lo < exact_lo * 3 + 0.05


def test_inverse_power_iteration_smallest():
    from sparse_matrix_tpu.solvers import inverse_power_iteration

    n = 12
    A = poisson_2d_csr(n, dtype=np.float32)
    op = SpmvOperator(A)
    res = inverse_power_iteration(op, n * n, tol=1e-6, maxiter=50)
    exact_lo = 8 * np.sin(np.pi / (2 * (n + 1))) ** 2
    assert abs(float(res.eigenvalue) - exact_lo) < 0.02 * exact_lo


def test_scipy_interop_on_class():
    import scipy.sparse as sp

    from sparse_matrix_tpu.formats import CsrMatrix

    s = sp.random(30, 20, density=0.2, format="csr", random_state=0)
    A = CsrMatrix.from_scipy(s)
    assert A.invariants()
    np.testing.assert_allclose(A.to_scipy().toarray(), s.toarray())


def test_shift_invert_finds_interior_eigenvalue():
    """sigma != 0: shift-invert targets the eigenvalue NEAREST sigma
    (MINRES inner solves on the indefinite shifted operator)."""
    import numpy as np

    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import inverse_power_iteration, poisson_2d_csr

    p = poisson_2d_csr(10, dtype=np.float32)
    ev = np.linalg.eigvalsh(p.to_dense().astype(np.float64))
    # pick a shift near an interior eigenvalue, away from its neighbors
    target_idx = len(ev) // 2
    gaps = np.diff(ev)
    sigma = float(ev[target_idx]) + 0.3 * float(min(gaps[target_idx - 1], gaps[target_idx]))
    res = inverse_power_iteration(
        SpmvOperator(p, dtype=np.float32), p.rows, sigma=sigma,
        tol=1e-6, inner_tol=1e-8, inner_maxiter=2000,
    )
    lam = float(res.eigenvalue)
    nearest = float(ev[np.argmin(np.abs(ev - sigma))])
    assert abs(lam - nearest) < 1e-3 * max(1.0, abs(nearest)), (lam, nearest, sigma)


def test_shift_invert_direct_ldl_inner():
    """direct_a= routes the inner solves through one exact LDL^T
    factorization of A - sigma I (indefinite-safe, no Krylov inner)."""
    import numpy as np

    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import inverse_power_iteration, poisson_2d_csr

    p = poisson_2d_csr(10, dtype=np.float32)
    ev = np.linalg.eigvalsh(p.to_dense().astype(np.float64))
    gaps = np.diff(ev)
    # interior target with non-degenerate gaps on both sides (the 2-D
    # Laplacian spectrum has exact multiplicities; sigma must not land ON
    # an eigenvalue or the shifted operator is singular)
    ok = np.nonzero((gaps[:-1] > 1e-3) & (gaps[1:] > 1e-3))[0] + 1
    target_idx = int(ok[len(ok) // 2])
    sigma = float(ev[target_idx]) + 0.3 * float(min(gaps[target_idx - 1], gaps[target_idx]))
    res = inverse_power_iteration(
        SpmvOperator(p, dtype=np.float32), p.rows, sigma=sigma,
        tol=1e-6, direct_a=p,
    )
    lam = float(res.eigenvalue)
    nearest = float(ev[np.argmin(np.abs(ev - sigma))])
    assert abs(lam - nearest) < 1e-3 * max(1.0, abs(nearest)), (lam, nearest, sigma)
