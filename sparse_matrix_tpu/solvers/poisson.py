"""2D Poisson 5-point Laplacian model problem (north-star CG workload)."""

from __future__ import annotations

import numpy as np

from ..formats.csr import CsrMatrix

__all__ = ["poisson_2d_csr", "poisson_3d_csr"]


def poisson_2d_csr(n: int, *, dtype=np.float64) -> CsrMatrix:
    """The n^2 x n^2 five-point Laplacian on an n x n grid (Dirichlet).

    Row for grid point (i, j): 4 on the diagonal, -1 for each in-grid
    neighbor. Built directly in COO, O(n^2).
    """
    idx = np.arange(n * n, dtype=np.int64)
    i, j = idx // n, idx % n

    rows = [idx]
    cols = [idx]
    vals = [np.full(n * n, 4, dtype=dtype)]

    for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        ii, jj = i + di, j + dj
        ok = (ii >= 0) & (ii < n) & (jj >= 0) & (jj < n)
        rows.append(idx[ok])
        cols.append((ii * n + jj)[ok])
        vals.append(np.full(int(ok.sum()), -1, dtype=dtype))

    return CsrMatrix.from_coo(
        n * n,
        n * n,
        np.concatenate(rows),
        np.concatenate(cols),
        np.concatenate(vals),
        sum_duplicates=False,
    )


def poisson_3d_csr(n: int, *, dtype=np.float64) -> CsrMatrix:
    """The n^3 x n^3 seven-point Laplacian on an n^3 grid (Dirichlet),
    assembled from the 1-D stencil with the framework's own Kronecker
    product: ``L (x) I (x) I + I (x) L (x) I + I (x) I (x) L``."""
    from ..formats.construct import diags, eye, kron

    l1 = diags([2.0, -1.0, -1.0], [0, -1, 1], shape=(n, n), dtype=dtype)
    i1 = eye(n, dtype=dtype)
    i2 = eye(n * n, dtype=dtype)
    return kron(l1, i2) + kron(i1, kron(l1, i1)) + kron(i2, l1)
