"""``sparse_matrix_tpu.sparse`` — a scipy.sparse-shaped alias namespace.

Lets scipy.sparse users switch with minimal edits::

    from sparse_matrix_tpu import sparse
    a = sparse.random(512, 512, density=0.01, random_state=0)
    b = sparse.eye(512) - 0.1 * a          # (scalar mul via .astype/vals)
    from sparse_matrix_tpu.sparse.linalg import cg, spsolve
    x, info = cg(a_spd, rhs)

Everything constructs/returns :class:`~sparse_matrix_tpu.formats.csr.
CsrMatrix` (the host format behind every device plan). The reference has no
such compat layer — this is switching-cost work for the rebuild's users; the
underlying behaviors mirror the reference surface (CSR invariants
``spam_csr/src/lib.rs:47-81``, DOK/MatrixMarket ``spam_dok/src/lib.rs``).

Deliberate deltas from scipy, documented here once:

* every matrix is CSR under the hood — ``csc_matrix``/``coo_matrix`` accept
  the same constructor forms but return (row-major) ``CsrMatrix``;
* ``.nnz`` is a method on ``CsrMatrix`` (reference trait parity) — the scipy
  property spelling is ``getnnz()``;
* ``random`` REQUIRES ``random_state`` (capability discipline: no ambient
  randomness — the reference bans ambient-authority APIs repo-wide via
  ``clippy.toml:14-181``).
"""

from __future__ import annotations

import numpy as np

from ..core.dok import DokMatrix
from ..formats.csr import CsrMatrix
from ..formats.construct import (  # noqa: F401
    block_diag,
    bmat,
    diags,
    eye,
    find,
    hstack,
    kron,
    load_npz,
    save_npz,
    tril,
    triu,
    vstack,
)

from . import linalg  # noqa: E402,F401
from . import csgraph  # noqa: E402,F401

__all__ = [
    "csr_matrix", "csc_matrix", "coo_matrix", "csr_array", "coo_array",
    "identity", "eye", "diags", "diags_array", "spdiags", "kron", "kronsum",
    "random", "rand", "random_array", "hstack", "vstack", "bmat",
    "block_diag", "tril", "triu", "find", "issparse", "isspmatrix",
    "isspmatrix_csr", "save_npz", "load_npz", "linalg", "csgraph",
]


def _from_dense(arr, dtype=None) -> CsrMatrix:
    arr = np.asarray(arr)
    if dtype is not None:
        arr = arr.astype(dtype)
    if arr.ndim != 2:
        raise ValueError(f"expected a 2-D array, got ndim={arr.ndim}")
    r, c = np.nonzero(arr)
    return CsrMatrix.from_coo(arr.shape[0], arr.shape[1], r, c, arr[r, c])


def csr_matrix(arg1, shape=None, dtype=None) -> CsrMatrix:
    """scipy.sparse.csr_matrix-shaped constructor. Accepts:

    * a dense 2-D array-like;
    * another ``CsrMatrix`` / any scipy.sparse matrix / ``DokMatrix``;
    * ``(data, (row, col))`` COO triplets (duplicates summed);
    * ``(data, indices, indptr)`` raw CSR arrays;
    * an ``(M, N)`` shape tuple for an all-zero matrix.
    """
    if isinstance(arg1, CsrMatrix):
        out = arg1.astype(dtype) if dtype is not None else arg1.copy()
    elif isinstance(arg1, DokMatrix):
        out = CsrMatrix.from_dok(arg1, dtype=dtype)
    elif hasattr(arg1, "tocsr") and hasattr(arg1, "tocoo"):  # scipy.sparse
        out = CsrMatrix.from_scipy(arg1)
        if dtype is not None:
            out = out.astype(dtype)
    elif isinstance(arg1, tuple) and len(arg1) == 2 and all(
        isinstance(d, (int, np.integer)) for d in arg1
    ):
        m, n = int(arg1[0]), int(arg1[1])
        out = CsrMatrix.new(m, n, dtype=dtype if dtype is not None else np.float64)
    elif isinstance(arg1, tuple) and len(arg1) == 2:
        data, (row, col) = arg1
        data = np.asarray(data)
        if dtype is not None:
            data = data.astype(dtype)
        row = np.asarray(row, dtype=np.int64)
        col = np.asarray(col, dtype=np.int64)
        if shape is None:
            shape = (int(row.max()) + 1 if len(row) else 1,
                     int(col.max()) + 1 if len(col) else 1)
        out = CsrMatrix.from_coo(shape[0], shape[1], row, col, data)
    elif isinstance(arg1, tuple) and len(arg1) == 3:
        data, indices, indptr = (np.asarray(x) for x in arg1)
        if dtype is not None:
            data = data.astype(dtype)
        rows = len(indptr) - 1
        if shape is None:
            shape = (rows, int(indices.max()) + 1 if len(indices) else 1)
        out = CsrMatrix(shape[0], shape[1], data, indices, indptr,
                        is_sorted=bool(_rows_sorted(indices, indptr)),
                        validate=True)
    else:
        out = _from_dense(arg1, dtype=dtype)
    if shape is not None and out.shape != tuple(shape):
        raise ValueError(f"shape {tuple(shape)} does not match data shape {out.shape}")
    return out


def _rows_sorted(indices, indptr) -> bool:
    ind = np.asarray(indices, dtype=np.int64)
    if len(ind) < 2:
        return True
    inc = ind[1:] > ind[:-1]
    starts = np.asarray(indptr[1:-1], dtype=np.int64)
    inc[starts[(starts > 0) & (starts < len(ind))] - 1] = True
    return bool(inc.all())


# same logical matrix, same (row-major CSR) storage — see module docstring
csc_matrix = csr_matrix
coo_matrix = csr_matrix
csr_array = csr_matrix
coo_array = csr_matrix


def identity(n: int, dtype=np.float64) -> CsrMatrix:
    return CsrMatrix.identity(int(n), dtype=dtype)


def diags_array(diagonals, *, offsets=0, shape=None, dtype=None) -> CsrMatrix:
    if np.isscalar(offsets):
        # scipy rule: scalar offsets => diagonals is one 1-D array
        offsets = [int(offsets)]
        diagonals = [np.atleast_1d(np.asarray(diagonals))]
    return diags(list(diagonals), list(offsets), shape=shape, dtype=dtype)


def spdiags(data, diags_off, m=None, n=None) -> CsrMatrix:
    """scipy.sparse.spdiags semantics: row k of ``data`` goes on diagonal
    ``diags_off[k]``, and superdiagonal data is read from column offset
    (i.e. entry (i, i+k) takes ``data[row, i+k]``)."""
    data = np.atleast_2d(np.asarray(data))
    offs = np.atleast_1d(np.asarray(diags_off, dtype=np.int64))
    if m is None or n is None:
        m = n = data.shape[1]
    m, n = int(m), int(n)
    rr, cc, vv = [], [], []
    for k, off in enumerate(offs):
        off = int(off)
        i0, j0 = max(0, -off), max(0, off)
        d = max(0, min(m - i0, n - j0))
        if d == 0:
            continue
        i = np.arange(i0, i0 + d, dtype=np.int64)
        j = np.arange(j0, j0 + d, dtype=np.int64)
        v = data[k, j]  # dia_matrix convention: entry (i, j) reads data[k, j]
        rr.append(i)
        cc.append(j)
        vv.append(v)
    if not rr:
        return CsrMatrix.new(m, n, dtype=data.dtype)
    r = np.concatenate(rr)
    c = np.concatenate(cc)
    v = np.concatenate(vv)
    keep = v != 0
    return CsrMatrix.from_coo(m, n, r[keep], c[keep], v[keep])


def kronsum(a: CsrMatrix, b: CsrMatrix) -> CsrMatrix:
    """``kron(I_b, A) + kron(B, I_a)`` (scipy.sparse.kronsum)."""
    if a.rows != a.cols or b.rows != b.cols:
        raise ValueError("kronsum needs square operands")
    ia = CsrMatrix.identity(a.rows, dtype=a.vals.dtype)
    ib = CsrMatrix.identity(b.rows, dtype=b.vals.dtype)
    return kron(ib, a) + kron(b, ia)


def random(m: int, n: int, density: float = 0.01, format: str = "csr",
           dtype=np.float64, random_state=None) -> CsrMatrix:
    """Uniform-random pattern with standard-normal values.

    ``random_state`` is REQUIRED (int seed or ``np.random.Generator``) —
    capability discipline bans ambient randomness (``clippy.toml:14-181``
    in the reference)."""
    from ..formats.construct import random_csr

    if random_state is None:
        raise ValueError(
            "random_state is required (int seed or np.random.Generator): "
            "no ambient randomness (capability discipline)"
        )
    rng = (random_state if isinstance(random_state, np.random.Generator)
           else np.random.default_rng(int(random_state)))
    del format  # storage is always CSR here
    return random_csr(int(m), int(n), float(density), rng, dtype=dtype)


rand = random
random_array = random


def issparse(x) -> bool:
    return isinstance(x, (CsrMatrix, DokMatrix))


isspmatrix = issparse


def isspmatrix_csr(x) -> bool:
    return isinstance(x, CsrMatrix)
