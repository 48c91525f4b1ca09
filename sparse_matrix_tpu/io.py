"""``sparse_matrix_tpu.io`` — scipy.io-shaped MatrixMarket entry points.

``mmread``/``mmwrite``/``mminfo`` over the library's MatrixMarket engine
(`core/matrix_market.py`, reference parity ``spam_dok/src/lib.rs:268-490``
including the pattern/skew/hermitian variants the reference left as
``todo!()``). Deltas from scipy, stated once:

* ``mmread`` returns the host :class:`CsrMatrix` (scipy returns COO);
  ``array`` headers are accepted and densified the same way.
* ``mmwrite`` emits coordinate ``general`` text (field ``real``,
  ``integer`` or ``pattern``); symmetry compression on write is not
  offered — readers (ours and scipy's) accept the general form always.
"""

from __future__ import annotations

import os
from typing import Union

import numpy as np

from .core.matrix_market import (
    MatrixMarketError,
    parse_matrix_market,
    parse_matrix_market_csr,
)
from .formats.csr import CsrMatrix

__all__ = ["mmread", "mmwrite", "mminfo"]


def _read_text(source) -> str:
    if hasattr(source, "read"):
        data = source.read()
        return data.decode() if isinstance(data, bytes) else data
    with open(os.fspath(source), "r") as f:
        return f.read()


def mmread(source) -> CsrMatrix:
    """Read MatrixMarket text (path / file-like) into a ``CsrMatrix``.
    scipy parity: ``scipy.io.mmread`` (which returns COO; conversion here
    is direct to the CSR every device plan starts from)."""
    text = _read_text(source)
    header = text.split("\n", 1)[0].split()
    fmt = header[2].lower() if len(header) >= 5 else ""
    field = header[3].lower() if len(header) >= 5 else ""
    if fmt == "array":
        return _read_array_format(text, field,
                                  header[4].lower() if len(header) >= 5
                                  else "general")
    if field == "real":
        return parse_matrix_market_csr(text)
    return CsrMatrix.from_dok(parse_matrix_market(text).matrix)


def _read_array_format(text: str, field: str, symmetry: str) -> CsrMatrix:
    """Dense (``array``) MatrixMarket body: column-major values, only the
    lower triangle stored under symmetric/skew/hermitian (MM spec)."""
    if field == "pattern":
        raise MatrixMarketError("array format cannot be pattern")
    lines = text.splitlines()
    i = 1
    while i < len(lines) and (lines[i].lstrip().startswith("%")
                              or not lines[i].strip()):
        i += 1
    if i >= len(lines):
        raise MatrixMarketError("missing size line")
    try:
        rows, cols = (int(p) for p in lines[i].split())
    except ValueError as e:
        raise MatrixMarketError(f"bad size line: {lines[i]!r}") from e
    body = [ln.split() for ln in lines[i + 1:] if ln.strip()]
    if field == "complex":
        vals = np.array([complex(float(p[0]), float(p[1])) for p in body])
    else:
        vals = np.array([float(p[0]) for p in body])
    dense = np.zeros((rows, cols), dtype=vals.dtype)
    k = 0
    for j in range(cols):
        if symmetry in ("symmetric", "hermitian"):
            i0 = j
        elif symmetry == "skew-symmetric":
            i0 = j + 1  # diagonal implicitly zero, strictly-lower stored
        else:
            i0 = 0
        n = rows - i0
        if k + n > len(vals):
            raise MatrixMarketError("array body shorter than size line")
        dense[i0:rows, j] = vals[k:k + n]
        k += n
    if k != len(vals):
        raise MatrixMarketError("array body longer than size line")
    if symmetry == "symmetric":
        dense = dense + np.tril(dense, -1).T
    elif symmetry == "skew-symmetric":
        dense = dense - np.tril(dense, -1).T
    elif symmetry == "hermitian":
        dense = dense + np.conj(np.tril(dense, -1)).T
    r, c = np.nonzero(dense)
    return CsrMatrix.from_coo(rows, cols, r, c, dense[r, c])


def mmwrite(target, a, comment: str = "", field: str = None,
            precision: int = None, symmetry: str = "general") -> None:
    """Write coordinate MatrixMarket text. ``a`` may be a ``CsrMatrix``,
    ``DokMatrix``, scipy.sparse matrix, or dense 2-D array."""
    if symmetry not in (None, "general", "AUTO"):
        raise NotImplementedError(
            "symmetry compression on write is not offered; files are "
            "written 'general' (readable by every MM reader)")
    if not isinstance(a, CsrMatrix):
        if hasattr(a, "tocsr") and hasattr(a, "tocoo"):
            a = CsrMatrix.from_scipy(a)
        elif hasattr(a, "entries") and hasattr(a, "iter_entries"):
            a = CsrMatrix.from_dok(a)
        else:
            arr = np.asarray(a)
            if arr.ndim != 2:
                raise ValueError("mmwrite expects a 2-D matrix")
            r, c = np.nonzero(arr)
            a = CsrMatrix.from_coo(arr.shape[0], arr.shape[1], r, c,
                                   arr[r, c])
    if field is None:
        field = ("integer"
                 if np.issubdtype(np.asarray(a.vals).dtype, np.integer)
                 else "real")
    if field not in ("real", "integer", "pattern"):
        raise NotImplementedError(f"mmwrite field {field!r} not offered")

    lines = [f"%%MatrixMarket matrix coordinate {field} general"]
    for cl in str(comment).splitlines():
        lines.append(f"%{cl}")
    nnz = int(a.nnz() if callable(a.nnz) else a.nnz)
    lines.append(f"{a.rows} {a.cols} {nnz}")
    off = np.asarray(a.offsets, dtype=np.int64)
    rows = np.repeat(np.arange(a.rows), np.diff(off))
    cols = np.asarray(a.indices, dtype=np.int64)
    vals = np.asarray(a.vals)
    fmt = (f"{{:.{precision}e}}".format if precision is not None
           else lambda v: repr(float(v)))
    for i in range(nnz):
        if field == "pattern":
            lines.append(f"{rows[i] + 1} {cols[i] + 1}")
        elif field == "integer":
            lines.append(f"{rows[i] + 1} {cols[i] + 1} {int(vals[i])}")
        else:
            lines.append(f"{rows[i] + 1} {cols[i] + 1} {fmt(float(vals[i]))}")
    text = "\n".join(lines) + "\n"
    if hasattr(target, "write"):
        target.write(text)
    else:
        path = os.fspath(target)
        if not path.endswith(".mtx"):
            path += ".mtx"  # scipy appends the extension too
        with open(path, "w") as f:
            f.write(text)


def mminfo(source):
    """(rows, cols, entries, format, field, symmetry) from the header +
    size line only (no entry parse). scipy parity: ``scipy.io.mminfo``."""
    text = _read_text(source)
    lines = text.splitlines()
    if not lines or not lines[0].startswith("%%MatrixMarket"):
        raise MatrixMarketError("missing %%MatrixMarket header")
    head = lines[0].split()
    if len(head) < 5 or head[1].lower() != "matrix":
        raise MatrixMarketError(f"bad header: {lines[0]!r}")
    fmt, field, symmetry = (head[2].lower(), head[3].lower(),
                            head[4].lower())
    i = 1
    while i < len(lines) and (lines[i].lstrip().startswith("%")
                              or not lines[i].strip()):
        i += 1
    if i >= len(lines):
        raise MatrixMarketError("missing size line")
    parts = lines[i].split()
    if fmt == "coordinate":
        if len(parts) != 3:
            raise MatrixMarketError(f"bad size line: {lines[i]!r}")
        rows, cols, entries = (int(p) for p in parts)
    elif fmt == "array":
        if len(parts) != 2:
            raise MatrixMarketError(f"bad size line: {lines[i]!r}")
        rows, cols = (int(p) for p in parts)
        entries = rows * cols
    else:
        raise MatrixMarketError(f"unknown format {fmt!r}")
    return rows, cols, entries, fmt, field, symmetry
