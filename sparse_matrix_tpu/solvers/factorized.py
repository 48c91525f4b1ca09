"""Factor-object API: ``splu`` / ``spilu`` / ``factorized``.

scipy.sparse.linalg surface parity (north-star scope, not in the Rust
reference): the exact machinery already lives in :mod:`.cholesky` (sparse
LU with partial pivoting, Gilbert-Peierls) and :mod:`.ilu` (ILUT dual
dropping); this module wraps it in SuperLU-shaped reusable factor objects
— factor once, ``.solve(b)`` many times, including ``trans="T"`` solves
from the same factorization (the transpose trisolves run on the cached
CSR transposes of L and U).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

__all__ = ["SpluFactor", "SpiluFactor", "splu", "spilu", "factorized"]


class SpluFactor:
    """Reusable exact factorization ``P A Q = L U`` (scipy ``SuperLU``
    analog). ``perm_c`` is the fill-reducing column order ``Q`` (None =
    natural); ``pinv`` maps original row -> pivot position (``P``)."""

    def __init__(self, f, shape):
        self._f = f
        self.shape = shape
        self.L = f.l
        self.U = f.u
        self.pinv = f.pinv
        self.perm_c = f.q
        self._lt = None
        self._ut = None

    @property
    def nnz(self) -> int:
        return self.L.nnz() + self.U.nnz()

    def solve(self, b, trans: str = "N") -> np.ndarray:
        """Solve ``A x = b`` (``trans="N"``) or ``A^T x = b``
        (``trans="T"``) from the one factorization. 1-D or column-block
        ``b``; host f64 exact trisolves."""
        from .cholesky import lu_solve
        from .ilu import trisolve_host

        if trans == "N":
            return lu_solve(self._f, b)
        if trans != "T":
            raise ValueError(f"trans must be 'N' or 'T', got {trans!r}")
        # A = P^T L U Q^T  =>  A^T = Q U^T L^T P:
        #   w = Q^T b  (w[j] = b[q[j]]);  U^T y = w;  L^T z = y;
        #   x = P^T z  (x[i] = z[pinv[i]])
        if self._ut is None:
            self._ut = self.U.transpose()  # lower, non-unit
            self._lt = self.L.transpose()  # upper, unit diagonal
        b = np.asarray(b, dtype=np.float64)
        one_d = b.ndim == 1
        bb = b[:, None] if one_d else b
        out = np.empty_like(bb)
        for k in range(bb.shape[1]):
            w = bb[:, k] if self.perm_c is None else bb[self.perm_c, k]
            y = trisolve_host(self._ut, w, lower=True, unit=False)
            z = trisolve_host(self._lt, y, lower=False, unit=True)
            out[:, k] = z[self.pinv]
        return out[:, 0] if one_d else out

    def __call__(self, b) -> np.ndarray:
        return self.solve(b)


class SpiluFactor:
    """Reusable INCOMPLETE factorization ``A ~= L U`` (scipy ``spilu``
    analog): exact trisolves on the incomplete factors = the classic ILUT
    preconditioner apply. No pivoting (ILUT keeps A's row order)."""

    def __init__(self, f, shape):
        self._f = f
        self.shape = shape
        self.L = f.l
        self.U = f.u
        self._lt = None
        self._ut = None

    @property
    def nnz(self) -> int:
        return self.L.nnz() + self.U.nnz()

    def solve(self, b, trans: str = "N") -> np.ndarray:
        from .ilu import trisolve_host

        b = np.asarray(b, dtype=np.float64)
        one_d = b.ndim == 1
        bb = b[:, None] if one_d else b
        out = np.empty_like(bb)
        if trans == "N":
            for k in range(bb.shape[1]):
                y = trisolve_host(self.L, bb[:, k], lower=True, unit=True)
                out[:, k] = trisolve_host(self.U, y, lower=False)
        elif trans == "T":
            if self._ut is None:
                self._ut = self.U.transpose()
                self._lt = self.L.transpose()
            for k in range(bb.shape[1]):
                y = trisolve_host(self._ut, bb[:, k], lower=True, unit=False)
                out[:, k] = trisolve_host(self._lt, y, lower=False, unit=True)
        else:
            raise ValueError(f"trans must be 'N' or 'T', got {trans!r}")
        return out[:, 0] if one_d else out

    def __call__(self, b) -> np.ndarray:
        return self.solve(b)


def splu(a, permc_spec: str = "RCM") -> SpluFactor:
    """Exact sparse LU factor object (scipy ``splu`` analog; reference
    anchor for the host-factorization stance:
    ``/root/reference/spam_csr/src/mul_hash.rs`` — the irregular
    elimination runs on the host). ``permc_spec``: ``"RCM"`` | ``"ND"`` |
    ``"NATURAL"`` fill-reducing column order."""
    from .cholesky import lu

    spec = permc_spec.upper()
    reorder = {"RCM": "rcm", "ND": "nd", "NATURAL": "natural"}.get(spec)
    if reorder is None:
        raise ValueError(
            f"unknown permc_spec {permc_spec!r} (RCM|ND|NATURAL)"
        )
    return SpluFactor(lu(a, reorder=reorder), (a.rows, a.cols))


def spilu(a, *, drop_tol: float = 1e-4, fill_per_row: int = 10) -> SpiluFactor:
    """ILUT(p, tau) factor object (scipy ``spilu`` analog): ``drop_tol``
    is Saad's tau, ``fill_per_row`` the per-row fill cap p (scipy's
    fill_factor is a global multiplier; per-row is this library's native
    parameterization — see :func:`~.ilu.ilut`)."""
    from .ilu import ilut

    return SpiluFactor(
        ilut(a, tau=drop_tol, p=fill_per_row), (a.rows, a.cols)
    )


def factorized(a) -> Callable:
    """scipy parity: returns ``solve(b)`` backed by one :func:`splu`."""
    return splu(a).solve
