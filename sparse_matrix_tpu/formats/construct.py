"""Sparse construction utilities: ``eye`` / ``diags`` / ``random_csr`` /
``kron`` / ``block_diag``.

New scope beyond the reference (which constructs only via DOK inserts and
MatrixMarket); the scipy.sparse-shaped builders users reach for first.
Everything is vectorized numpy emitting sorted :class:`~.csr.CsrMatrix`
(the planners' expected input).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .csr import CsrMatrix

__all__ = [
    "eye", "diags", "random_csr", "kron", "block_diag",
    "vstack", "hstack", "tril", "triu", "submatrix",
    "bmat", "find", "norm", "matrix_power", "save_npz", "load_npz",
]


def eye(n: int, m: int = None, k: int = 0, *, dtype=np.float64) -> CsrMatrix:
    """Identity / shifted-identity: ones on diagonal ``k`` of an (n, m)
    matrix (``m`` defaults to ``n``)."""
    m = n if m is None else m
    r0 = max(0, -k)
    c0 = max(0, k)
    d = max(0, min(n - r0, m - c0))
    rows = np.arange(r0, r0 + d, dtype=np.int64)
    cols = np.arange(c0, c0 + d, dtype=np.int64)
    return CsrMatrix.from_coo(n, m, rows, cols, np.ones(d, dtype=dtype))


def diags(
    diagonals: Sequence, offsets: Sequence[int] = None, shape=None, *, dtype=None
) -> CsrMatrix:
    """Matrix from diagonals: ``diagonals[i]`` goes on offset
    ``offsets[i]`` (scalars broadcast along the diagonal). Default
    offsets are ``0, 1, ..`` for one list; shape defaults to the smallest
    square that fits every diagonal."""
    if offsets is None:
        offsets = list(range(len(diagonals)))
    if len(diagonals) != len(offsets):
        raise ValueError("diagonals and offsets must have the same length")
    lens = []
    for d, k in zip(diagonals, offsets):
        d = np.atleast_1d(np.asarray(d))
        lens.append((len(d) if d.size > 1 else None, k))
    if shape is None:
        n = 0
        for ln, k in lens:
            if ln is None:
                raise ValueError("scalar diagonals need an explicit shape")
            n = max(n, ln + abs(k))
        shape = (n, n)
    n, m = shape
    rr, cc, vv = [], [], []
    for d, k in zip(diagonals, offsets):
        d = np.atleast_1d(np.asarray(d))
        r0, c0 = max(0, -k), max(0, k)
        length = max(0, min(n - r0, m - c0))
        if d.size == 1:
            vals = np.full(length, d[0])
        else:
            if len(d) < length:
                raise ValueError(
                    f"diagonal for offset {k} has {len(d)} entries, needs {length}"
                )
            vals = d[:length]
        rr.append(np.arange(r0, r0 + length, dtype=np.int64))
        cc.append(np.arange(c0, c0 + length, dtype=np.int64))
        vv.append(vals)
    v = np.concatenate(vv) if vv else np.zeros(0)
    if dtype is not None:
        v = v.astype(dtype)
    return CsrMatrix.from_coo(
        n, m, np.concatenate(rr) if rr else np.zeros(0, np.int64),
        np.concatenate(cc) if cc else np.zeros(0, np.int64), v,
    )


def random_csr(
    rows: int, cols: int, density: float, rng: np.random.Generator, *,
    dtype=np.float64,
) -> CsrMatrix:
    """Uniform-random sparsity with standard-normal values. The rng is a
    REQUIRED argument (capability discipline: no ambient randomness —
    ``clippy.toml``'s ban list is the reference's version of this rule)."""
    if not 0.0 <= density <= 1.0:
        raise ValueError(f"density must be in [0, 1], got {density}")
    nnz = int(round(rows * cols * density))
    flat = rng.choice(rows * cols, size=min(nnz, rows * cols), replace=False)
    r = (flat // cols).astype(np.int64)
    c = (flat % cols).astype(np.int64)
    return CsrMatrix.from_coo(
        rows, cols, r, c, rng.standard_normal(len(flat)).astype(dtype)
    )


def kron(a: CsrMatrix, b: CsrMatrix) -> CsrMatrix:
    """Kronecker product ``A (x) B`` (the classic way to build 2-D/3-D
    operators from 1-D stencils: ``poisson2d = kron(L, I) + kron(I, L)``)."""
    ra = a.row_ids()
    ca = a.indices.astype(np.int64)
    rb = b.row_ids()
    cb = b.indices.astype(np.int64)
    # outer expansion: every A entry spawns all B entries
    rows = (ra[:, None] * b.rows + rb[None, :]).ravel()
    cols = (ca[:, None] * b.cols + cb[None, :]).ravel()
    vals = (a.vals[:, None] * b.vals[None, :]).ravel()
    return CsrMatrix.from_coo(a.rows * b.rows, a.cols * b.cols, rows, cols, vals)


def block_diag(blocks: Sequence[CsrMatrix]) -> CsrMatrix:
    """Direct sum: blocks stacked along the diagonal."""
    if not blocks:
        raise ValueError("need at least one block")
    rr, cc, vv = [], [], []
    r0 = c0 = 0
    for blk in blocks:
        rr.append(blk.row_ids() + r0)
        cc.append(blk.indices.astype(np.int64) + c0)
        vv.append(blk.vals)
        r0 += blk.rows
        c0 += blk.cols
    return CsrMatrix.from_coo(
        r0, c0, np.concatenate(rr), np.concatenate(cc), np.concatenate(vv)
    )


def vstack(blocks: Sequence[CsrMatrix]) -> CsrMatrix:
    """Stack CSR blocks vertically (equal col counts) — pure offset
    chaining, no re-sort (each block keeps its row order)."""
    if not blocks:
        raise ValueError("vstack needs at least one block")
    cols = blocks[0].cols
    if any(b.cols != cols for b in blocks):
        raise ValueError("vstack blocks must share col count")
    offs = [np.asarray(blocks[0].offsets)]
    for b in blocks[1:]:
        offs.append(np.asarray(b.offsets[1:]) + int(offs[-1][-1]))
    return CsrMatrix(
        sum(b.rows for b in blocks), cols,
        np.concatenate([b.vals for b in blocks]),
        np.concatenate([b.indices for b in blocks]),
        np.concatenate(offs),
        is_sorted=all(b.is_sorted for b in blocks),
    )


def hstack(blocks: Sequence[CsrMatrix]) -> CsrMatrix:
    """Stack CSR blocks horizontally (equal row counts); column indices
    shift by the running width. Sorted blocks merge into sorted rows
    because the shifted column ranges are disjoint and increasing."""
    if not blocks:
        raise ValueError("hstack needs at least one block")
    rows = blocks[0].rows
    if any(b.rows != rows for b in blocks):
        raise ValueError("hstack blocks must share row count")
    shifts = np.cumsum([0] + [b.cols for b in blocks])
    rr = np.concatenate([b.row_ids() for b in blocks])
    cc = np.concatenate([
        b.indices.astype(np.int64) + s for b, s in zip(blocks, shifts)
    ])
    vv = np.concatenate([b.vals for b in blocks])
    return CsrMatrix.from_coo(
        rows, int(shifts[-1]), rr, cc, vv, sum_duplicates=False
    )


def tril(a: CsrMatrix, k: int = 0) -> CsrMatrix:
    """Entries on/below the k-th diagonal (scipy.sparse.tril analog)."""
    return _diag_mask(a, lambda o: o <= k)


def triu(a: CsrMatrix, k: int = 0) -> CsrMatrix:
    """Entries on/above the k-th diagonal (scipy.sparse.triu analog)."""
    return _diag_mask(a, lambda o: o >= k)


def _diag_mask(a: CsrMatrix, pred) -> CsrMatrix:
    r = a.row_ids()
    mask = pred(a.indices.astype(np.int64) - r)
    offs = np.zeros(a.rows + 1, np.int64)
    offs[1:] = np.bincount(r[mask], minlength=a.rows)
    np.cumsum(offs, out=offs)
    return CsrMatrix(
        a.rows, a.cols, a.vals[mask], a.indices[mask], offs,
        is_sorted=a.is_sorted,
    )


def submatrix(a: CsrMatrix, rows: tuple, cols: tuple) -> CsrMatrix:
    """Contiguous sub-block ``A[r0:r1, c0:c1]`` (half-open ranges). Row
    slicing is pure offset arithmetic; the column range masks entries
    (row-sorted CSR keeps (row, col) order under a column-range mask)."""
    r0, r1 = rows
    c0, c1 = cols
    if not (0 <= r0 <= r1 <= a.rows and 0 <= c0 <= c1 <= a.cols):
        raise ValueError("submatrix range out of bounds")
    lo, hi = int(a.offsets[r0]), int(a.offsets[r1])
    idx = a.indices[lo:hi].astype(np.int64)
    mask = (idx >= c0) & (idx < c1)
    rloc = np.repeat(
        np.arange(r1 - r0, dtype=np.int64), np.diff(a.offsets[r0 : r1 + 1])
    )[mask]
    offs = np.zeros(r1 - r0 + 1, np.int64)
    offs[1:] = np.bincount(rloc, minlength=r1 - r0)
    np.cumsum(offs, out=offs)
    return CsrMatrix(
        r1 - r0, c1 - c0, a.vals[lo:hi][mask],
        (idx[mask] - c0).astype(a.indices.dtype), offs,
        is_sorted=a.is_sorted,
    )


def bmat(blocks) -> CsrMatrix:
    """Assemble a matrix from a 2-D grid of blocks (scipy.sparse.bmat
    analog): ``blocks[i][j]`` is a :class:`CsrMatrix` or ``None`` (zero
    block). Row heights / column widths are inferred from the non-None
    blocks of each grid row / column; a fully-None row or column is
    ambiguous and rejected."""
    grid = [list(row) for row in blocks]
    if not grid or not grid[0]:
        raise ValueError("bmat needs a non-empty 2-D grid")
    br, bc = len(grid), len(grid[0])
    if any(len(row) != bc for row in grid):
        raise ValueError("bmat rows must have equal length")
    heights = [None] * br
    widths = [None] * bc
    for i, row in enumerate(grid):
        for j, blk in enumerate(row):
            if blk is None:
                continue
            if heights[i] is not None and heights[i] != blk.rows:
                raise ValueError(f"inconsistent block heights in grid row {i}")
            if widths[j] is not None and widths[j] != blk.cols:
                raise ValueError(f"inconsistent block widths in grid col {j}")
            heights[i] = blk.rows
            widths[j] = blk.cols
    if any(h is None for h in heights) or any(w is None for w in widths):
        raise ValueError("bmat: a fully-None row or column has no size")
    r_off = np.cumsum([0] + heights)
    c_off = np.cumsum([0] + widths)
    rr, cc, vv = [], [], []
    for i, row in enumerate(grid):
        for j, blk in enumerate(row):
            if blk is None or blk.nnz() == 0:
                continue
            rr.append(blk.row_ids() + int(r_off[i]))
            cc.append(blk.indices.astype(np.int64) + int(c_off[j]))
            vv.append(blk.vals)
    if not rr:
        return CsrMatrix.new(
            int(r_off[-1]), int(c_off[-1]), dtype=np.float64
        )
    return CsrMatrix.from_coo(
        int(r_off[-1]), int(c_off[-1]),
        np.concatenate(rr), np.concatenate(cc), np.concatenate(vv),
        sum_duplicates=False,
    )


def find(a: CsrMatrix):
    """Return ``(rows, cols, vals)`` of the stored entries in row-major
    order (scipy.sparse.find analog; explicit zeros are never stored, so
    the arrays are exactly the nonzeros)."""
    return a.row_ids(), a.indices.astype(np.int64), a.vals.copy()


def norm(a: CsrMatrix, ord="fro") -> float:
    """Sparse matrix norm (scipy.sparse.linalg.norm analog): ``'fro'``
    (default), ``1`` (max column abs-sum), ``inf`` (max row abs-sum), or
    ``'max'`` (largest entry magnitude). Spectral norm is intentionally
    not offered here — use :func:`~sparse_matrix_tpu.solvers.svd.svds`
    for sigma_max."""
    # abs BEFORE the f64 cast: complex -> float64 astype would discard imag
    av = np.abs(a.vals).astype(np.float64, copy=False)
    if ord in ("fro", "f"):
        return float(np.sqrt(np.sum(av * av)))
    if ord == 1:
        if a.nnz() == 0:
            return 0.0
        return float(
            np.bincount(a.indices.astype(np.int64), weights=av,
                        minlength=a.cols).max()
        )
    if ord in (np.inf, float("inf"), "inf"):
        if a.nnz() == 0:
            return 0.0
        return float(
            np.bincount(a.row_ids(), weights=av, minlength=a.rows).max()
        )
    if ord == "max":
        return float(av.max()) if a.nnz() else 0.0
    raise ValueError(f"unsupported norm ord {ord!r}")


def matrix_power(a: CsrMatrix, n: int) -> CsrMatrix:
    """``A**n`` for square sparse ``A`` by repeated squaring through the
    dispatched SpGEMM (``__matmul__``); ``n == 0`` gives the identity."""
    if a.rows != a.cols:
        raise ValueError("matrix_power needs a square matrix")
    if n < 0:
        raise ValueError("negative powers are not sparse")
    result = None
    base = a
    while True:
        if n & 1:
            result = base if result is None else result @ base
        n >>= 1
        if n == 0:
            break
        base = base @ base
    if result is None:
        return CsrMatrix.identity(a.rows, dtype=a.vals.dtype)
    return result


def save_npz(path, a: CsrMatrix) -> None:
    """Persist a CSR matrix as a compressed npz (scipy save_npz analog;
    MatrixMarket text I/O remains the interchange format — this is the
    fast binary checkpoint)."""
    np.savez_compressed(
        path, fmt="csr", rows=a.rows, cols=a.cols,
        vals=a.vals, indices=a.indices, offsets=a.offsets,
        is_sorted=a.is_sorted,
    )


def load_npz(path) -> CsrMatrix:
    """Load a matrix saved by :func:`save_npz`."""
    z = np.load(path, allow_pickle=False)
    if str(z["fmt"]) != "csr":
        raise ValueError(f"unknown sparse npz format {z['fmt']!r}")
    return CsrMatrix(
        int(z["rows"]), int(z["cols"]), z["vals"], z["indices"],
        z["offsets"], is_sorted=bool(z["is_sorted"]),
    )
