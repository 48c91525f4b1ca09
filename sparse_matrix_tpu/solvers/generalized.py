"""Generalized symmetric eigenproblems ``A x = lambda M x`` (M SPD).

Closes the last documented eigensolver gap (the facade used to raise
``NotImplementedError`` for ``eigsh(M=...)`` / ``lobpcg(B=...)``). The
design follows the same host-irregular / device-regular split as the
shift-invert solvers (see ``eigen.py::eigsh_shift_invert`` and the
reference's stance that the host owns the irregular part,
``/root/reference/spam_csr/src/mul_hash.rs``): one exact sparse
factorization (``chol(M)`` or ``ldl(A - sigma*M)``, both host-native with
Python fallbacks), then an M-inner-product Lanczos recurrence with full
reorthogonalization in f64 next to the factors.

Why M-Lanczos instead of reducing to ``L^-1 A L^-T``: the pencil operator
``M^-1 A`` (or ``(A - sigma M)^-1 M``) is self-adjoint in the M-inner
product, so Lanczos applies directly and the Ritz vectors come out
M-orthonormal (``V^T M V = I``, scipy's normalization) with no back-
substitution through the Cholesky factor.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

__all__ = ["eigsh_generalized", "eigs_generalized", "lobpcg_generalized"]


def _scaled_csr(a, s: float):
    from ..formats.csr import CsrMatrix

    return CsrMatrix(
        a.rows, a.cols, a.vals.astype(np.float64) * s,
        a.indices.copy(), a.offsets.copy(), is_sorted=a.is_sorted,
    )


def _m_lanczos(
    op: Callable[[np.ndarray], np.ndarray],
    mv_m: Callable[[np.ndarray], np.ndarray],
    n: int,
    m: int,
    seed: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lanczos for an operator self-adjoint in the M-inner product.

    ``op``: the pencil operator apply (``M^-1 A`` or ``(A-sM)^-1 M``);
    ``mv_m``: exact ``M @ v``. Returns ``(alphas, betas, basis)`` with the
    rows of ``basis`` M-orthonormal. Full reorthogonalization twice per
    step (Parlett), as in ``eigen.py::eigsh_shift_invert``.
    """
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n)
    v /= np.sqrt(v @ mv_m(v))
    basis = np.zeros((m, n))
    mbasis = np.zeros((m, n))  # cached M @ basis rows for O(1) M-projections
    alphas = np.zeros(m)
    betas = np.zeros(m)
    for j in range(m):
        basis[j] = v
        mbasis[j] = mv_m(v)
        w = op(v)
        alphas[j] = float(w @ mbasis[j])
        # full M-reorthogonalization against every kept vector, twice
        w -= basis[: j + 1].T @ (mbasis[: j + 1] @ w)
        w -= basis[: j + 1].T @ (mbasis[: j + 1] @ w)
        beta = float(np.sqrt(max(w @ mv_m(w), 0.0)))
        betas[j] = beta
        if beta <= 1e-14:
            return alphas[: j + 1], betas[: j + 1], basis[: j + 1]
        v = w / beta
    return alphas, betas, basis


def _ritz(alphas, betas, basis):
    m = len(alphas)
    t = np.diag(alphas)
    if m > 1:
        t += np.diag(betas[: m - 1], 1) + np.diag(betas[: m - 1], -1)
    theta, y = np.linalg.eigh(t)
    return theta, basis.T @ y  # columns M-orthonormal


def eigsh_generalized(
    a,
    m_mat,
    k: int = 6,
    *,
    which: str = "LA",
    sigma: Optional[float] = None,
    m: Optional[int] = None,
    tol: float = 1e-8,
    seed: int = 0,
    reorder: str = "rcm",
) -> Tuple[np.ndarray, np.ndarray]:
    """``k`` eigenpairs of the symmetric pencil ``(A, M)``, M SPD.

    scipy's ``eigsh(A, k, M=M)`` surface: ``which`` in LA/LM (largest
    algebraic) or SA/SM (smallest algebraic); ``sigma=`` switches to
    shift-invert (eigenvalues NEAREST sigma via one exact LDL^T of
    ``A - sigma*M``). Returns ``(vals ascending, vecs)`` with
    ``vecs^T M vecs = I`` (scipy normalization).

    Convergence: unless ``m`` pins the subspace size, the Lanczos space is
    doubled until every returned pair satisfies
    ``||A x - lambda M x|| <= tol * max(1, |lambda|)`` — plain Lanczos on
    ``M^-1 A`` converges slowly at the smallest end of Laplacian-like
    pencils, so a fixed default subspace silently under-converges.
    """
    from .cholesky import chol, chol_solve, ldl, ldl_solve

    n = a.rows
    if a.rows != a.cols or m_mat.rows != m_mat.cols or m_mat.rows != n:
        raise ValueError("eigsh_generalized needs square A, M of equal size")
    if not 1 <= k < n:
        raise ValueError(f"k={k} out of range for n={n}")
    adaptive = m is None
    if adaptive:
        m = min(n, max(4 * k + 20, 40))
    m = int(min(max(m, k + 2), n))

    def mv_m(v):
        return m_mat.dot(np.asarray(v, np.float64))

    if sigma is None:
        fac = chol(m_mat, reorder=reorder)

        def op(v):  # M^-1 A v — self-adjoint in <.,.>_M
            return chol_solve(fac, a.dot(np.asarray(v, np.float64)))

        def ritz_select(m_try):
            alphas, betas, basis = _m_lanczos(op, mv_m, n, m_try, seed)
            theta, vecs = _ritz(alphas, betas, basis)
            if which in ("LA", "LM"):
                sel = np.argsort(theta)[-k:]
            elif which in ("SA", "SM"):
                sel = np.argsort(theta)[:k]
            else:
                raise ValueError(f"which={which!r} (LA|LM|SA|SM)")
            return theta[sel], vecs[:, sel]

    else:
        shifted = a + _scaled_csr(m_mat, -float(sigma))
        fac = ldl(shifted, reorder=reorder)

        def op(v):  # (A - sigma M)^-1 M v — self-adjoint in <.,.>_M
            return ldl_solve(fac, mv_m(v))

        def ritz_select(m_try):
            alphas, betas, basis = _m_lanczos(op, mv_m, n, m_try, seed)
            theta, vecs = _ritz(alphas, betas, basis)
            keep = np.abs(theta) > 1e-14
            theta, vecs = theta[keep], vecs[:, keep]
            sel = np.argsort(-np.abs(theta))[:k]
            return float(sigma) + 1.0 / theta[sel], vecs[:, sel]

    while True:
        vals, vecs = ritz_select(m)
        if not adaptive or m >= n:
            break
        r = a.dot(vecs) - m_mat.dot(vecs) * vals[None, :]
        rn = np.linalg.norm(r, axis=0)
        if np.all(rn <= tol * np.maximum(1.0, np.abs(vals))):
            break
        m = min(n, 2 * m)

    order = np.argsort(vals)
    return vals[order], vecs[:, order]


def _host_arnoldi(op, n: int, m: int, seed: int):
    """Arnoldi with two-pass full orthogonalization (the recurrence of
    ``eigen.py::eigs_shift_invert``). Returns ``(hm, basis)`` with
    ``basis`` (actual, n)."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    basis = np.zeros((m + 1, n))
    h = np.zeros((m + 1, m))
    basis[0] = v
    actual = m
    for j in range(m):
        w = op(basis[j])
        hj = basis[: j + 1] @ w
        w -= basis[: j + 1].T @ hj
        hj2 = basis[: j + 1] @ w
        w -= basis[: j + 1].T @ hj2
        h[: j + 1, j] = hj + hj2
        beta = float(np.linalg.norm(w))
        h[j + 1, j] = beta
        if beta <= 1e-14:
            actual = j + 1
            break
        basis[j + 1] = w / beta
    return h[:actual, :actual], basis[:actual]


def eigs_generalized(
    a,
    m_mat,
    k: int = 6,
    *,
    which: str = "LM",
    sigma: Optional[float] = None,
    m: Optional[int] = None,
    tol: float = 1e-8,
    seed: int = 0,
    reorder: str = "rcm",
) -> Tuple[np.ndarray, np.ndarray]:
    """Unsymmetric generalized pencil ``A x = lambda M x`` (M SPD): scipy's
    ``eigs(A, k, M=M)`` surface. Plain mode runs host Arnoldi on
    ``M^-1 A`` (one exact chol(M), eigenvalues of the pencil are the
    operator's); ``sigma=`` runs shift-invert Arnoldi on
    ``(A - sigma M)^-1 M`` through one exact sparse LU. Returns complex
    ``(vals, vecs)`` — largest-modulus order (plain) or nearest-sigma
    order (shift-invert), matching the ``eigs`` facades.

    Like :func:`eigsh_generalized`, the Arnoldi space doubles until the
    pencil residual of every returned pair meets ``tol`` (unless ``m``
    pins it).
    """
    from .cholesky import chol, chol_solve, ldl  # noqa: F401  (chol for M)
    from .cholesky import lu, lu_solve

    n = a.rows
    if a.rows != a.cols or m_mat.rows != m_mat.cols or m_mat.rows != n:
        raise ValueError("eigs_generalized needs square A, M of equal size")
    if not 1 <= k < n:
        raise ValueError(f"k={k} out of range for n={n}")
    if which != "LM":
        raise ValueError("eigs_generalized supports which='LM' "
                         "(use sigma= for interior/smallest)")
    adaptive = m is None
    if adaptive:
        m = min(n, max(4 * k + 20, 40))
    m = int(min(max(m, k + 2), n))

    def mv_m(v):
        return m_mat.dot(np.asarray(v, np.float64))

    if sigma is None:
        fac = chol(m_mat, reorder=reorder)

        def op(v):
            return chol_solve(fac, a.dot(np.asarray(v, np.float64)))

        def select(m_try):
            hm, basis = _host_arnoldi(op, n, m_try, seed)
            theta, y = np.linalg.eig(hm)
            order = np.argsort(-np.abs(theta))[:k]
            vals = theta[order]
            vecs = basis.T.astype(np.complex128) @ y[:, order]
            vecs /= np.linalg.norm(vecs, axis=0, keepdims=True)
            return vals, vecs

    else:
        shifted = a + _scaled_csr(m_mat, -float(sigma))
        fac = lu(shifted, reorder=reorder)

        def op(v):
            return lu_solve(fac, mv_m(v))

        def select(m_try):
            hm, basis = _host_arnoldi(op, n, m_try, seed)
            theta, y = np.linalg.eig(hm)
            keep = np.abs(theta) > 1e-14
            theta, y = theta[keep], y[:, keep]
            order = np.argsort(-np.abs(theta))[:k]
            vals = float(sigma) + 1.0 / theta[order]
            vecs = basis.T.astype(np.complex128) @ y[:, order]
            vecs /= np.linalg.norm(vecs, axis=0, keepdims=True)
            fine = np.argsort(np.abs(vals - float(sigma)))
            return vals[fine], vecs[:, fine]

    while True:
        vals, vecs = select(m)
        if not adaptive or m >= n:
            break
        r = (a.dot(vecs.real) + 1j * a.dot(vecs.imag)
             - (m_mat.dot(vecs.real) + 1j * m_mat.dot(vecs.imag))
             * vals[None, :])
        rn = np.linalg.norm(r, axis=0)
        if np.all(rn <= tol * np.maximum(1.0, np.abs(vals))):
            break
        m = min(n, 2 * m)
    return vals, vecs


def lobpcg_generalized(
    a,
    x0,
    m_mat,
    *,
    largest: bool = True,
    m: Optional[int] = None,
    tol: float = 1e-8,
    seed: int = 0,
    reorder: str = "rcm",
) -> Tuple[np.ndarray, np.ndarray]:
    """scipy ``lobpcg(A, X, B=M)``-shaped front: ``k = X.shape[1]``
    extremal eigenpairs of the pencil. Routed through the exact M-Lanczos
    (one chol(M) beats LOBPCG's per-iteration B-orthonormalizations at
    the host sizes this targets); returns scipy's ordering (descending
    when ``largest``). ``m=None`` keeps the adaptive residual-driven
    subspace growth (gated by ``tol``); an explicit ``m`` pins it."""
    x0 = np.asarray(x0)
    k = x0.shape[1] if x0.ndim == 2 else 1
    vals, vecs = eigsh_generalized(
        a, m_mat, k, which="LA" if largest else "SA",
        m=m, tol=tol, seed=seed, reorder=reorder,
    )
    if largest:
        return vals[::-1], vecs[:, ::-1]
    return vals, vecs
