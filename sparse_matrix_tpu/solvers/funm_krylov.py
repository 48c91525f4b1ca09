"""Restarted Krylov evaluation of ``f(tA) b`` (Eiermann–Ernst).

scipy parity: ``scipy.sparse.linalg.funm_multiply_krylov`` (the general-
``f`` companion of the Chebyshev/Taylor ``expm_multiply`` family in
:mod:`.funm`). The Arnoldi loop is host-orchestrated (numpy, same stance
as :mod:`.eigen` — the irregular control flow is small and the matvec is
the hot op, which runs wherever the supplied operator runs: SpmvOperator
matvecs execute on device); ``f`` is applied to the small accumulated
block-Hessenberg matrix on the host.

Restart scheme: after cycle ``j`` the Arnoldi relations glue into one
block-Hessenberg matrix ``H⁽ʲ⁾`` (diagonal blocks = per-cycle ``H_m``,
subdiagonal coupling ``h_{m+1,m} e₁ e_mᵀ``), and

    f(tA) b  ≈  β · Σ_j V_j · [f(t H⁽ʲ⁾) e₁]_{block j}

so each restart costs one dense ``f`` of a ``(j·m, j·m)`` matrix and m
matvecs, never re-orthogonalizing against old cycles (Eiermann & Ernst,
"A restarted Krylov subspace method for the evaluation of matrix
functions", SINUM 2006).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

__all__ = ["funm_multiply_krylov"]


def _as_matvec(a):
    if callable(a) and not hasattr(a, "shape"):
        return a
    if hasattr(a, "matvec"):
        return a.matvec
    if hasattr(a, "toarray") and hasattr(a, "offsets"):  # CsrMatrix
        import scipy.sparse as _sp

        s = _sp.csr_matrix(
            (np.asarray(a.vals, np.float64), np.asarray(a.indices, np.int64),
             np.asarray(a.offsets, np.int64)), shape=a.shape)
        return lambda v: s @ v
    arr = np.asarray(a, dtype=np.float64)
    return lambda v: arr @ v


def funm_multiply_krylov(
    f: Callable,
    a,
    b,
    *,
    assume_a: str = "general",
    t: float = 1.0,
    atol: float = 0.0,
    rtol: float = 1e-6,
    restart_every_m: int = None,
    max_restarts: int = 20,
) -> np.ndarray:
    """Evaluate ``f(t A) @ b`` through restarted Arnoldi (Lanczos when
    ``assume_a`` is ``'her'``/``'sym'`` — same three-term recurrence, the
    full basis is still kept for the final combination). ``f`` receives a
    dense square ndarray and must return the matrix function of it (e.g.
    ``scipy.linalg.expm``). Converged when a restart's correction has
    norm ``<= atol + rtol * |result|``.
    """
    matvec = _as_matvec(a)
    b = np.asarray(b, dtype=np.float64).ravel()
    n = b.shape[0]
    m = int(restart_every_m) if restart_every_m else min(max(1, n), 30)
    m = min(m, n)
    sym = assume_a.lower() in ("her", "sym", "symmetric", "hermitian")

    beta = float(np.linalg.norm(b))
    if beta == 0.0:
        return np.zeros_like(b)

    v = b / beta
    h_blocks = []  # per-cycle (m+1, m) Hessenberg panels
    result = np.zeros(n)
    size = 0
    for cycle in range(max(1, int(max_restarts))):
        basis = np.zeros((m + 1, n))
        basis[0] = v
        h = np.zeros((m + 1, m))
        steps = m
        for j in range(m):
            w = np.asarray(matvec(basis[j]), dtype=np.float64)
            lo = max(0, j - 1) if sym else 0
            for i in range(lo, j + 1):
                h[i, j] = basis[i] @ w
                w = w - h[i, j] * basis[i]
            # one re-orthogonalization pass keeps the combination stable
            for i in range(lo, j + 1):
                c = basis[i] @ w
                h[i, j] += c
                w = w - c * basis[i]
            h[j + 1, j] = np.linalg.norm(w)
            if h[j + 1, j] <= 1e-14 * abs(h[: j + 1, j]).max(initial=1.0):
                steps = j + 1  # invariant subspace: exact within it
                break
            basis[j + 1] = w / h[j + 1, j]
        h = h[: steps + 1, : steps]
        basis = basis[: steps + 1]
        h_blocks.append(h)

        # assemble the accumulated block-Hessenberg matrix
        new_size = size + steps
        big = np.zeros((new_size, new_size))
        off = 0
        for hb in h_blocks:
            s = hb.shape[1]
            big[off:off + s, off:off + s] = hb[:s, :]
            if off + s < new_size:  # coupling h_{m+1,m} e1 e_m^T into next
                big[off + s, off + s - 1] = hb[s, s - 1]
            off += s

        fh = np.atleast_2d(np.asarray(f(t * big), dtype=np.float64))
        y = beta * fh[:, 0]
        update = y[size:new_size] @ basis[:steps]
        result = result + update
        size = new_size

        unorm = float(np.linalg.norm(update))
        if unorm <= atol + rtol * max(float(np.linalg.norm(result)), 1e-300):
            break
        if steps < m:  # breakdown: the Krylov space is exhausted
            break
        v = basis[steps]
    return result
