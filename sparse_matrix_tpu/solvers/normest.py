"""1-norm estimation and condition-number estimation (Hager/Higham).

scipy-parity surface (``onenormest``/``condest``) the reference lacks.
The estimator needs only matvecs with ``A`` and ``A^T`` — so it runs on
the planned device operators — and ``condest`` composes it with the
exact sparse LU (``solvers/cholesky.py``): ``cond_1(A) = |A|_1 *
|A^{-1}|_1``, the second factor estimated through ``lu_solve`` applies
(Higham's power method on the dual norm; SIAM ed. 2, alg. 15.1 —
algorithmic description, no code consulted).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

__all__ = ["onenormest", "condest"]


def onenormest(
    matvec: Callable,
    rmatvec: Callable,
    n: int,
    *,
    itmax: int = 8,
) -> float:
    """Estimate ``|A|_1`` from matvec/rmatvec only (Hager's algorithm,
    single probe vector). Exact for matrices with a dominant column;
    within a small factor in general — it is a lower bound by
    construction (each iterate is ``|A x|_1`` for some ``|x|_1 = 1``)."""
    x = np.full(n, 1.0 / n, dtype=np.float64)
    est = 0.0
    for _ in range(itmax):
        y = np.asarray(matvec(x), dtype=np.float64)
        est_new = float(np.abs(y).sum())
        z = np.asarray(rmatvec(np.sign(y)), dtype=np.float64)
        j = int(np.argmax(np.abs(z)))
        if np.abs(z[j]) <= z @ x or est_new <= est:
            est = max(est, est_new)
            break
        est = est_new
        x = np.zeros(n, dtype=np.float64)
        x[j] = 1.0
    return est


def condest(a, *, itmax: int = 8) -> float:
    """1-norm condition estimate ``cond_1(A) ~= |A|_1 * est(|A^{-1}|_1)``
    for square host CSR ``A``: ``|A|_1`` exactly (column sums),
    ``|A^{-1}|_1`` by Hager probes through one exact sparse LU."""
    from .cholesky import lu, lu_solve

    if a.rows != a.cols:
        raise ValueError("condest requires a square matrix")
    n = a.rows
    col_sums = np.zeros(n, dtype=np.float64)
    np.add.at(col_sums, a.indices.astype(np.int64), np.abs(a.vals.astype(np.float64)))
    a1 = float(col_sums.max()) if n else 0.0

    from .ilu import trisolve_host

    f = lu(a)
    # A^{-T} applies come from the SAME factor: A^{-1} = Q U^{-1} L^{-1} P
    # (lu_solve), so A^{-T} = P^T L^{-T} U^{-T} Q^T — two transposed
    # trisolves, no second factorization
    ut, lt = f.u.transpose(), f.l.transpose()

    def rmatvec(c):
        w = np.asarray(c, np.float64)[f.q] if f.q is not None else np.asarray(c, np.float64)
        t = trisolve_host(ut, w, lower=True)
        s_v = trisolve_host(lt, t, lower=False, unit=True)
        return s_v[f.pinv]

    inv1 = onenormest(lambda v: lu_solve(f, v), rmatvec, n, itmax=itmax)
    return a1 * inv1
