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
