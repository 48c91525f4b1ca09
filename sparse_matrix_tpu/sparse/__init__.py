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


# ---------------------------------------------------------------------------
# remaining scipy.sparse surface: format aliases, predicates, utilities
# ---------------------------------------------------------------------------

from ..core.matrix import Matrix as _MatrixABC  # noqa: E402

# isinstance targets, scipy spelling: both formats subclass the trait ABC
sparray = _MatrixABC
spmatrix = _MatrixABC


class SparseWarning(Warning):
    """scipy.sparse.SparseWarning parity."""


class SparseEfficiencyWarning(SparseWarning):
    """scipy.sparse.SparseEfficiencyWarning parity."""


def dok_matrix(arg1, shape=None, dtype=None) -> DokMatrix:
    """scipy.sparse.dok_matrix-shaped: returns the dict-backed
    :class:`DokMatrix` (incremental ``d[i, j] = v`` supported). Accepts
    an ``(M, N)`` shape tuple, a dense array, a ``CsrMatrix``/scipy
    matrix, or another ``DokMatrix``."""
    del shape  # only meaningful with the tuple form, where arg1 IS it
    if isinstance(arg1, DokMatrix):
        return DokMatrix(arg1.rows, arg1.cols, dict(arg1.entries),
                         dtype=dtype if dtype is not None else arg1.dtype)
    if isinstance(arg1, tuple) and len(arg1) == 2 and all(
        isinstance(d, (int, np.integer)) for d in arg1
    ):
        return DokMatrix.new(int(arg1[0]), int(arg1[1]), dtype=dtype)
    return csr_matrix(arg1, dtype=dtype).to_dok()


def dia_matrix(arg1, shape=None, dtype=None) -> CsrMatrix:
    """scipy.sparse.dia_matrix-shaped constructor (storage is CSR; the
    DEVICE dia format is planned separately via ``SpmvOperator`` /
    ``formats.dia``). The ``(data, offsets)`` form uses scipy's
    column-aligned convention: entry ``(j - off, j)`` reads
    ``data[k, j]``. Explicit stored zeros inside the band are KEPT
    (scipy ``.tocsr()`` parity)."""
    if isinstance(arg1, tuple) and len(arg1) == 2 and not all(
        isinstance(d, (int, np.integer)) for d in arg1
    ):
        data, offsets = arg1
        data = np.atleast_2d(np.asarray(data))
        if dtype is not None:
            data = data.astype(dtype)
        offs = np.atleast_1d(np.asarray(offsets, dtype=np.int64))
        if shape is None:
            shape = (data.shape[1], data.shape[1])
        m, n = int(shape[0]), int(shape[1])
        rr, cc, vv = [], [], []
        for k, off in enumerate(offs):
            off = int(off)
            j0 = max(0, off)
            j1 = min(n, m + off, data.shape[1])
            if j1 <= j0:
                continue
            j = np.arange(j0, j1, dtype=np.int64)
            rr.append(j - off)
            cc.append(j)
            vv.append(data[k, j0:j1])
        if not rr:
            return CsrMatrix.new(m, n, dtype=data.dtype)
        return CsrMatrix.from_coo(m, n, np.concatenate(rr),
                                  np.concatenate(cc), np.concatenate(vv))
    return csr_matrix(arg1, shape=shape, dtype=dtype)


def bsr_matrix(arg1, shape=None, dtype=None, blocksize=None) -> CsrMatrix:
    """scipy.sparse.bsr_matrix-shaped constructor (storage is CSR; block
    structure is rediscovered by the device block-SpGEMM/BCSR planners).
    Accepts the raw BSR triple ``(data, indices, indptr)`` with 3-D
    ``data`` of shape (nblocks, R, C), plus every ``csr_matrix`` form."""
    if (isinstance(arg1, tuple) and len(arg1) == 3
            and np.asarray(arg1[0]).ndim == 3):
        data, indices, indptr = (np.asarray(x) for x in arg1)
        if dtype is not None:
            data = data.astype(dtype)
        nb, br, bc = data.shape
        brows = len(indptr) - 1
        if shape is None:
            bcols = (int(indices.max()) + 1) if len(indices) else 1
            shape = (brows * br, bcols * bc)
        blockrow = np.repeat(np.arange(brows, dtype=np.int64),
                             np.diff(indptr.astype(np.int64)))
        r = (blockrow[:, None, None] * br
             + np.arange(br, dtype=np.int64)[None, :, None])
        c = (indices.astype(np.int64)[:, None, None] * bc
             + np.arange(bc, dtype=np.int64)[None, None, :])
        r = np.broadcast_to(r, data.shape).ravel()
        c = np.broadcast_to(c, data.shape).ravel()
        return CsrMatrix.from_coo(int(shape[0]), int(shape[1]), r, c,
                                  data.ravel())
    del blocksize  # storage is CSR either way
    return csr_matrix(arg1, shape=shape, dtype=dtype)


lil_matrix = csr_matrix
csc_array = csr_matrix
lil_array = csr_matrix
dia_array = dia_matrix
bsr_array = bsr_matrix
dok_array = dok_matrix
block_array = bmat


def eye_array(m, n=None, *, k=0, dtype=np.float64) -> CsrMatrix:
    """scipy.sparse.eye_array parity."""
    return eye(int(m), None if n is None else int(n), int(k), dtype=dtype)


def isspmatrix_csc(x) -> bool:
    return False  # storage here is always row-major CSR


def isspmatrix_coo(x) -> bool:
    return False


def isspmatrix_dia(x) -> bool:
    return False


def isspmatrix_lil(x) -> bool:
    return False


def isspmatrix_bsr(x) -> bool:
    return False


def isspmatrix_dok(x) -> bool:
    return isinstance(x, DokMatrix)


def swapaxes(x, axis1: int, axis2: int):
    """Array-API parity for 2-D sparse: (0, 1) transposes."""
    ax = {axis1 % 2, axis2 % 2}
    return x.transpose() if ax == {0, 1} else csr_matrix(x)


def permute_dims(x, axes=None):
    """Array-API parity for 2-D sparse: (1, 0) transposes."""
    if axes is None or tuple(axes) == (1, 0):
        return x.transpose()
    if tuple(axes) == (0, 1):
        return csr_matrix(x)
    raise ValueError(f"axes must be a permutation of (0, 1), got {axes!r}")


def get_index_dtype(arrays=(), maxval=None, check_contents=False):
    """scipy.sparse.get_index_dtype parity: int32 when every index fits,
    else int64."""
    i32max = np.iinfo(np.int32).max
    if maxval is not None and maxval > i32max:
        return np.int64
    for arr in arrays:
        arr = np.asarray(arr)
        if arr.dtype.kind not in "iu":
            return np.int64
        if check_contents and arr.size:
            if int(arr.max(initial=0)) > i32max or int(arr.min(initial=0)) < np.iinfo(np.int32).min:
                return np.int64
        elif np.iinfo(arr.dtype).max > i32max:
            return np.int64
    return np.int32


def safely_cast_index_arrays(a, idx_dtype=np.int32, msg=""):
    """scipy.sparse.safely_cast_index_arrays parity for CSR inputs:
    returns (indices, indptr) cast to ``idx_dtype``, raising ValueError
    when a value would not survive the cast."""
    a = csr_matrix(a)
    idx_dtype = np.dtype(idx_dtype)
    out = []
    for arr in (a.indices, a.offsets):
        arr = np.asarray(arr)
        cast = arr.astype(idx_dtype)
        if arr.size and not np.array_equal(cast.astype(np.int64),
                                           arr.astype(np.int64)):
            raise ValueError(f"index values too large for {idx_dtype}{msg and ': ' + msg}")
        out.append(cast)
    return tuple(out)


__all__ += [
    "sparray", "spmatrix", "SparseWarning", "SparseEfficiencyWarning",
    "dok_matrix", "dok_array", "dia_matrix", "dia_array", "bsr_matrix",
    "bsr_array", "lil_matrix", "lil_array", "csc_array", "block_array",
    "eye_array", "kronsum", "spdiags", "isspmatrix_csc", "isspmatrix_coo",
    "isspmatrix_dia", "isspmatrix_lil", "isspmatrix_bsr", "isspmatrix_dok",
    "swapaxes", "permute_dims", "get_index_dtype", "safely_cast_index_arrays",
]


def expand_dims(x, axis=0):
    """scipy.sparse.expand_dims produces an n-D sparse array; storage
    here is strictly 2-D (CSR), so this is an explicit capability gate
    rather than a silent wrong answer."""
    raise NotImplementedError(
        "expand_dims targets n-D sparse arrays; this library's storage is "
        "2-D CSR. Reshape through dense/COO data explicitly instead.")


__all__ += ["expand_dims"]
