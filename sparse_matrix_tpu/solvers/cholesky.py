"""Exact sparse Cholesky: ``A = L @ L^T`` with fill (direct solver).

Beyond-reference scope (the reference has no solver layer); completes the
factorization spectrum next to IC(0)/ILUT (``solvers/ilu.py``), which are
APPROXIMATE no-/thresholded-fill factorizations. Design follows the
framework's host-kernel stance (`/root/reference/spam_csr/src/mul_hash.rs:
13-36` — the sequential, irregular work runs in the native C++ runtime):

* **Up-looking simplicial Cholesky** (the CSparse ``cs_chol`` family):
  elimination tree (Liu's algorithm, path compression) -> per-column
  fill counts by etree reach -> numeric phase appending each L column
  diagonal-first. All three phases in ``native/src/spmx_native.cpp``
  (``spmx_etree`` / ``spmx_chol_symbolic`` / ``spmx_chol_numeric``), with
  a same-algorithm Python fallback.
* **RCM pre-ordering by default** (``formats/reorder.py``): simplicial
  factorization of an unordered 2-D mesh operator fills catastrophically;
  RCM confines fill to the band.
* Factorization and triangular solves run in f64 on the host (exact
  direct solves are setup/oracle work); for REPEATED solves against many
  right-hand sides, the factor's :class:`~.ilu.TriangularJacobi` sweeps
  run on device like any triangular operator.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

__all__ = [
    "CholFactor", "chol", "chol_solve", "spsolve_chol",
    "LdlFactor", "ldl", "ldl_solve",
    "LuFactor", "lu", "lu_solve",
]


class CholFactor(NamedTuple):
    l: object  # CsrMatrix, lower triangular, f64
    u: object  # CsrMatrix, upper = L^T (native output layout)
    perm: Optional[np.ndarray]  # A[perm[i], perm[j]] was factored; None = natural


def _etree_python(n, offsets, indices):
    parent = np.full(n, -1, dtype=np.int64)
    ancestor = np.full(n, -1, dtype=np.int64)
    for k in range(n):
        for p in range(int(offsets[k]), int(offsets[k + 1])):
            i = int(indices[p])
            if i >= k:
                break
            while i != -1 and i != k:
                nxt = int(ancestor[i])
                ancestor[i] = k
                if nxt == -1:
                    parent[i] = k
                    break
                i = nxt
    return parent


def _ereach_python(k, offsets, indices, parent, w, s):
    n = len(w)
    top = n
    w[k] = k
    for p in range(int(offsets[k]), int(offsets[k + 1])):
        i = int(indices[p])
        if i >= k:
            break
        stack = []
        while w[i] != k:
            stack.append(i)
            w[i] = k
            i = int(parent[i])
        while stack:
            top -= 1
            s[top] = stack.pop()
    return top


def _chol_python(n, offsets, indices, vals):
    """Same three phases as the native kernel (SPMX_NO_NATIVE parity)."""
    parent = _etree_python(n, offsets, indices)
    w = np.full(n, -1, dtype=np.int64)
    s = np.empty(n, dtype=np.int64)
    colcount = np.ones(n, dtype=np.int64)
    for k in range(n):
        top = _ereach_python(k, offsets, indices, parent, w, s)
        for t in range(top, n):
            colcount[s[t]] += 1
    lp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(colcount, out=lp[1:])
    li = np.empty(max(1, int(lp[-1])), dtype=np.int64)
    lx = np.empty(max(1, int(lp[-1])), dtype=np.float64)
    c = lp[:-1].copy()
    x = np.zeros(n, dtype=np.float64)
    w[:] = -1
    for k in range(n):
        top = _ereach_python(k, offsets, indices, parent, w, s)
        d = 0.0
        for p in range(int(offsets[k]), int(offsets[k + 1])):
            j = int(indices[p])
            if j > k:
                break
            if j == k:
                d = float(vals[p])
            else:
                x[j] = float(vals[p])
        for t in range(top, n):
            i = int(s[t])
            lki = x[i] / lx[lp[i]]
            x[i] = 0.0
            for p in range(int(lp[i]) + 1, int(c[i])):
                x[li[p]] -= lx[p] * lki
            d -= lki * lki
            li[c[i]] = k
            lx[c[i]] = lki
            c[i] += 1
        if d <= 0.0:
            raise ValueError(f"chol: non-positive pivot in column {k} (input not SPD?)")
        li[c[k]] = k
        lx[c[k]] = np.sqrt(d)
        c[k] += 1
    return lp, li, lx


def chol(a, *, reorder: str = "rcm") -> CholFactor:
    """Exact sparse Cholesky of symmetric positive definite ``a``.

    ``reorder``: ``"rcm"`` (default — fill-reducing reverse Cuthill-McKee)
    or ``"natural"`` (factor as given).
    """
    from ..formats.csr import CsrMatrix
    from ..native import chol_native

    if a.rows != a.cols:
        raise ValueError("chol requires a square matrix")
    if not a.is_sorted:
        raise ValueError("chol requires sorted CSR (use from_dok / sort first)")
    perm = None
    if reorder == "rcm":
        from ..formats.reorder import rcm_reordered

        a, perm = rcm_reordered(a)
    elif reorder == "nd":
        # nested dissection: O(n log n) mesh fill vs RCM's O(n^1.5)
        from ..formats.reorder import nd_permutation, permute_symmetric

        perm = nd_permutation(a)
        a = permute_symmetric(a, perm)
    elif reorder != "natural":
        raise ValueError(f"unknown reorder {reorder!r} (rcm|nd|natural)")

    vals = a.vals.astype(np.float64)
    out = chol_native(a.rows, a.offsets, a.indices, vals)
    if out is None:
        out = _chol_python(a.rows, a.offsets, a.indices.astype(np.int64), vals)
    lp, li, lx = out
    li, lx = li[: int(lp[-1])], lx[: int(lp[-1])]  # buffers are min-1 alloc'd
    # native layout = L by columns, diagonal first = sorted CSR of U = L^T
    u = CsrMatrix(a.rows, a.cols, lx, li.astype(np.uint32), lp, is_sorted=True)
    return CholFactor(l=u.transpose(), u=u, perm=perm)


def chol_solve(f: CholFactor, b) -> np.ndarray:
    """Exact solve ``A x = b`` from a :class:`CholFactor` (host, f64).
    ``b`` may be a vector or an ``(n, K)`` block."""
    from .ilu import trisolve_host

    b = np.asarray(b, dtype=np.float64)
    one_d = b.ndim == 1
    bb = b[:, None] if one_d else b
    out = np.empty_like(bb)
    for k in range(bb.shape[1]):
        rhs = bb[:, k] if f.perm is None else bb[f.perm, k]
        y = trisolve_host(f.l, rhs, lower=True)
        z = trisolve_host(f.u, y, lower=False)
        if f.perm is None:
            out[:, k] = z
        else:
            out[f.perm, k] = z
    return out[:, 0] if one_d else out


def spsolve_chol(a, b, **kw) -> np.ndarray:
    """One-call exact SPD solve: ``chol`` + ``chol_solve``."""
    return chol_solve(chol(a, **kw), b)


# -- LDL^T: symmetric INDEFINITE direct factorization -----------------------


class LdlFactor(NamedTuple):
    l: object  # CsrMatrix, UNIT lower (explicit 1.0 diagonal), f64
    u: object  # CsrMatrix, unit upper = L^T
    d: np.ndarray  # diagonal of D (f64; may be negative)
    perm: Optional[np.ndarray]


def _ldl_python(n, offsets, indices, vals):
    """Davis's LDL recurrence, same phases as ``spmx_ldl_numeric``."""
    parent = _etree_python(n, offsets, indices)
    w = np.full(n, -1, dtype=np.int64)
    s = np.empty(n, dtype=np.int64)
    colcount = np.zeros(n, dtype=np.int64)  # strict part
    for k in range(n):
        top = _ereach_python(k, offsets, indices, parent, w, s)
        for t in range(top, n):
            colcount[s[t]] += 1
    lp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(colcount, out=lp[1:])
    li = np.empty(max(1, int(lp[-1])), dtype=np.int64)
    lx = np.empty(max(1, int(lp[-1])), dtype=np.float64)
    d = np.empty(n, dtype=np.float64)
    c = lp[:-1].copy()
    y = np.zeros(n, dtype=np.float64)
    w[:] = -1
    for k in range(n):
        top = _ereach_python(k, offsets, indices, parent, w, s)
        d[k] = 0.0
        for p in range(int(offsets[k]), int(offsets[k + 1])):
            j = int(indices[p])
            if j > k:
                break
            if j == k:
                d[k] = float(vals[p])
            else:
                y[j] = float(vals[p])
        for t in range(top, n):
            i = int(s[t])
            yi = y[i]
            y[i] = 0.0
            lki = yi / d[i]
            for p in range(int(lp[i]), int(c[i])):
                y[li[p]] -= lx[p] * yi
            d[k] -= lki * yi
            li[c[i]] = k
            lx[c[i]] = lki
            c[i] += 1
        if d[k] == 0.0:
            raise ValueError(f"ldl: zero pivot in column {k}")
    return lp, li, lx, d


def ldl(a, *, reorder: str = "rcm") -> LdlFactor:
    """Exact sparse ``A = L D L^T`` for symmetric ``a`` — no square roots,
    so INDEFINITE matrices factor too (e.g. shift-inverted operators
    ``A - sigma I``). No pivoting: numerically safe for quasi-definite /
    diagonally-dominant inputs; a zero pivot raises."""
    from ..formats.csr import CsrMatrix
    from ..native import ldl_native

    if a.rows != a.cols:
        raise ValueError("ldl requires a square matrix")
    if not a.is_sorted:
        raise ValueError("ldl requires sorted CSR (use from_dok / sort first)")
    perm = None
    if reorder == "rcm":
        from ..formats.reorder import rcm_reordered

        a, perm = rcm_reordered(a)
    elif reorder == "nd":
        # nested dissection: O(n log n) mesh fill vs RCM's O(n^1.5)
        from ..formats.reorder import nd_permutation, permute_symmetric

        perm = nd_permutation(a)
        a = permute_symmetric(a, perm)
    elif reorder != "natural":
        raise ValueError(f"unknown reorder {reorder!r} (rcm|nd|natural)")

    vals = a.vals.astype(np.float64)
    out = ldl_native(a.rows, a.offsets, a.indices, vals)
    if out is None:
        out = _ldl_python(a.rows, a.offsets, a.indices.astype(np.int64), vals)
    lp, li, lx, d = out
    li, lx = li[: int(lp[-1])], lx[: int(lp[-1])]  # buffers are min-1 alloc'd
    # strict L by columns = CSR of strict U; add explicit unit diagonals
    u_strict = CsrMatrix(
        a.rows, a.cols, lx, li.astype(np.uint32), lp, is_sorted=True
    )
    eye_r = np.arange(a.rows, dtype=np.int64)
    rid = u_strict.row_ids()
    cid = u_strict.indices.astype(np.int64)
    u = CsrMatrix.from_coo(
        a.rows, a.cols,
        np.concatenate([rid, eye_r]),
        np.concatenate([cid, eye_r]),
        np.concatenate([u_strict.vals, np.ones(a.rows)]),
    )
    return LdlFactor(l=u.transpose(), u=u, d=d, perm=perm)


def ldl_solve(f: LdlFactor, b) -> np.ndarray:
    """Exact solve ``A x = b`` from a :class:`LdlFactor` (host, f64)."""
    from .ilu import trisolve_host

    b = np.asarray(b, dtype=np.float64)
    one_d = b.ndim == 1
    bb = b[:, None] if one_d else b
    out = np.empty_like(bb)
    for k in range(bb.shape[1]):
        rhs = bb[:, k] if f.perm is None else bb[f.perm, k]
        y = trisolve_host(f.l, rhs, lower=True, unit=True)
        z = y / f.d
        x = trisolve_host(f.u, z, lower=False, unit=True)
        if f.perm is None:
            out[:, k] = x
        else:
            out[f.perm, k] = x
    return out[:, 0] if one_d else out


# -- LU with partial pivoting: the UNSYMMETRIC direct factorization ----------


class LuFactor(NamedTuple):
    l: object  # CsrMatrix, unit lower (pivot-position rows), f64
    u: object  # CsrMatrix, upper triangular, f64
    pinv: np.ndarray  # original row -> pivot position
    q: Optional[np.ndarray]  # column order factored (A[:, q]); None = natural


def _csc_of_columns(a, q):
    """CSC arrays of ``A[:, q]``: CSR of A^T with its rows taken in order
    ``q`` (a column of A is a row of A^T)."""
    at = a.transpose()
    offs = np.asarray(at.offsets)
    lens = np.diff(offs)
    if q is None:
        return offs.astype(np.int64), at.indices.astype(np.int64), at.vals
    lens_q = lens[q]
    bp = np.zeros(len(q) + 1, dtype=np.int64)
    np.cumsum(lens_q, out=bp[1:])
    total = int(bp[-1])
    starts = offs[:-1][q]
    gather = np.repeat(starts - bp[:-1], lens_q) + np.arange(total)
    return bp, at.indices[gather].astype(np.int64), at.vals[gather]


def _lu_python(n, bp, bi, bx):
    """Gilbert-Peierls left-looking LU, same semantics as ``spmx_lu``."""
    lp = [0]
    li, lx, up, ui, ux = [], [], [], [], []
    pinv = np.full(n, -1, dtype=np.int64)
    x = np.zeros(n, dtype=np.float64)
    w = np.full(n, -1, dtype=np.int64)
    for k in range(n):
        # reach by DFS over finished L columns
        topo = []
        for p in range(int(bp[k]), int(bp[k + 1])):
            start = int(bi[p])
            if w[start] == k:
                continue
            stack = [(start, None)]
            while stack:
                node, it = stack[-1]
                jj = int(pinv[node])
                if w[node] != k:
                    w[node] = k
                    it = iter(range(lp[jj] + 1, lp[jj + 1]) if jj >= 0 else ())
                    stack[-1] = (node, it)
                advanced = False
                for pp in it:
                    nxt = int(li[pp])
                    if w[nxt] != k:
                        stack.append((nxt, None))
                        advanced = True
                        break
                if not advanced:
                    stack.pop()
                    topo.append(node)
        topo.reverse()
        for p in range(int(bp[k]), int(bp[k + 1])):
            x[int(bi[p])] = bx[p]
        for i in topo:
            jj = int(pinv[i])
            if jj < 0 or x[i] == 0.0:
                continue
            xv = x[i]
            for pp in range(lp[jj] + 1, lp[jj + 1]):
                x[int(li[pp])] -= lx[pp] * xv
        ipiv, amax = -1, -1.0
        for i in topo:
            if pinv[i] < 0 and abs(x[i]) > amax:
                amax, ipiv = abs(x[i]), i
        if ipiv < 0 or amax <= 0.0:
            raise ValueError(f"lu: singular at column {k}")
        pivot = x[ipiv]
        pinv[ipiv] = k
        for i in topo:
            if int(pinv[i]) >= 0 and i != ipiv:
                ui.append(int(pinv[i]))
                ux.append(x[i])
        ui.append(k)
        ux.append(pivot)
        li.append(ipiv)
        lx.append(1.0)
        for i in topo:
            if pinv[i] < 0:
                li.append(i)
                lx.append(x[i] / pivot)
            x[i] = 0.0
        x[ipiv] = 0.0
        lp.append(len(li))
        up.append(len(ui))
    li = np.fromiter((pinv[i] for i in li), dtype=np.int64, count=len(li))
    return (
        np.asarray(lp, np.int64), li, np.asarray(lx, np.float64),
        np.asarray([0] + up, np.int64), np.asarray(ui, np.int64),
        np.asarray(ux, np.float64), pinv,
    )


def lu(a, *, reorder: str = "rcm") -> LuFactor:
    """Exact sparse ``P A Q = L U`` with partial (row) pivoting — the
    UNSYMMETRIC direct factorization (Gilbert-Peierls left-looking, the
    scipy ``splu`` analog). ``reorder`` permutes COLUMNS for fill
    (``"rcm"`` on the symmetrized pattern, or ``"natural"``)."""
    from ..formats.csr import CsrMatrix
    from ..native import lu_native

    if a.rows != a.cols:
        raise ValueError("lu requires a square matrix")
    if not a.is_sorted:
        raise ValueError("lu requires sorted CSR (use from_dok / sort first)")
    n = a.rows
    q = None
    if reorder == "rcm":
        from ..formats.reorder import rcm_permutation

        # symmetrize the pattern for the ordering only
        q = rcm_permutation(a + a.transpose())
    elif reorder == "nd":
        from ..formats.reorder import nd_permutation

        q = nd_permutation(a + a.transpose())
    elif reorder != "natural":
        raise ValueError(f"unknown reorder {reorder!r} (rcm|nd|natural)")

    bp, bi, bx = _csc_of_columns(a, q)
    bx = bx.astype(np.float64)
    out = lu_native(n, bp, bi, bx)
    if out is None:
        out = _lu_python(n, bp, bi, bx)
    lp, li, lx, up, ui, ux, pinv = out
    li, lx = li[: int(lp[-1])], lx[: int(lp[-1])]  # buffers are min-1 alloc'd
    ui, ux = ui[: int(up[-1])], ux[: int(up[-1])]
    # L, U arrive by COLUMNS with unsorted row order inside each column:
    # rebuild as sorted CSR via from_coo (cols of the CSC are CSR rows of
    # the transpose)
    lcol = np.repeat(np.arange(n, dtype=np.int64), np.diff(lp))
    ucol = np.repeat(np.arange(n, dtype=np.int64), np.diff(up))
    l_mat = CsrMatrix.from_coo(n, n, li, lcol, lx)
    u_mat = CsrMatrix.from_coo(n, n, ui, ucol, ux)
    return LuFactor(l=l_mat, u=u_mat, pinv=pinv, q=q)


def lu_solve(f: LuFactor, b) -> np.ndarray:
    """Exact solve ``A x = b`` from a :class:`LuFactor` (host, f64)."""
    from .ilu import trisolve_host

    b = np.asarray(b, dtype=np.float64)
    one_d = b.ndim == 1
    bb = b[:, None] if one_d else b
    out = np.empty_like(bb)
    for k in range(bb.shape[1]):
        pb = np.empty(len(f.pinv), dtype=np.float64)
        pb[f.pinv] = bb[:, k]
        y = trisolve_host(f.l, pb, lower=True, unit=True)
        z = trisolve_host(f.u, y, lower=False)
        if f.q is None:
            out[:, k] = z
        else:
            out[f.q, k] = z
    return out[:, 0] if one_d else out
