"""MatrixMarket coordinate-format I/O.

Re-design of the reference's nom-based parser + serializer
(``spam_dok/src/lib.rs:282-490``) as a plain line-oriented Python parser.

Behavior mirrored from the reference:

* header ``%%MatrixMarket matrix coordinate <integer|real|complex|pattern>
  <general|symmetric|skew-symmetric|hermitian>``; ``pattern`` entries and
  ``skew-symmetric``/``hermitian`` shapes are ``todo!()`` in the reference
  (``spam_dok/src/lib.rs:373,446``) — here they are fully implemented:
  ``pattern`` entries are two-field lines stored with value 1;
  ``skew-symmetric`` mirrors ``(c, r) = -t`` and rejects diagonal entries;
  ``hermitian`` (complex only) mirrors the conjugate and requires a real
  diagonal.  Invalid combinations (``pattern`` with ``skew-symmetric`` or
  ``hermitian``, ``hermitian`` with a non-complex entry type) raise
  :class:`MatrixMarketError`.
* ``%``-prefixed comment lines after the header are skipped
  (``spam_dok/src/lib.rs:376``).
* size line ``rows cols nnz``; entries are 1-indexed and converted to
  0-indexed (``spam_dok/src/lib.rs:337-340``).
* exact-zero entries are dropped (``spam_dok/src/lib.rs:336``).
* ``symmetric`` inserts both ``(r, c)`` and ``(c, r)``
  (``spam_dok/src/lib.rs:342-352``).
* a zero row or column count is rejected
  (``FromMatrixMarketError::HasZeroDimension``, ``spam_dok/src/lib.rs:274-280``).
* serializer emits ``real general``, 1-indexed, with an ``nnz`` header line
  (``into_float_matrix_market``, ``spam_dok/src/lib.rs:480-490``).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import TextIO, Union

import numpy as np

from .dok import DokMatrix

__all__ = [
    "MatrixType",
    "ParsedMatrix",
    "MatrixMarketError",
    "HasZeroDimensionError",
    "parse_matrix_market",
    "write_matrix_market",
    "to_matrix_market_string",
    "load_matrix_market",
    "save_matrix_market",
]


class MatrixMarketError(ValueError):
    """Malformed MatrixMarket input (reference ``FromMatrixMarketError::Nom``)."""


class HasZeroDimensionError(MatrixMarketError):
    """Row or column count is zero (``spam_dok/src/lib.rs:277-279``)."""


class MatrixType(enum.Enum):
    """Entry type of a parsed matrix (``spam_dok/src/lib.rs:268-272``)."""

    INTEGER = "integer"
    REAL = "real"
    COMPLEX = "complex"
    PATTERN = "pattern"


@dataclass
class ParsedMatrix:
    """Result of :func:`parse_matrix_market`: the DOK matrix plus its entry type."""

    type: MatrixType
    matrix: DokMatrix

    @property
    def is_integer(self) -> bool:
        return self.type is MatrixType.INTEGER

    @property
    def is_real(self) -> bool:
        return self.type is MatrixType.REAL

    @property
    def is_complex(self) -> bool:
        return self.type is MatrixType.COMPLEX


_ENTRY_TYPES = ("integer", "real", "complex", "pattern")
_SHAPES = ("general", "symmetric", "skew-symmetric", "hermitian")


def parse_matrix_market(
    text: str, *, int_dtype=np.int64, float_dtype=np.float64
) -> ParsedMatrix:
    """Parse MatrixMarket coordinate text into a :class:`DokMatrix`.

    Reference: ``parse_matrix_market`` (``spam_dok/src/lib.rs:282-478``).
    """
    lines = text.splitlines()
    if not lines:
        raise MatrixMarketError("empty input")

    header = lines[0].strip()
    prefix = "%%MatrixMarket matrix coordinate"
    if not header.startswith(prefix):
        raise MatrixMarketError(f"bad header: {header!r}")
    rest = header[len(prefix) :].split()
    if len(rest) != 2:
        raise MatrixMarketError(f"bad header qualifier: {header!r}")
    entry_type, shape = rest[0].lower(), rest[1].lower()
    if entry_type not in _ENTRY_TYPES:
        raise MatrixMarketError(f"unknown entry type {entry_type!r}")
    if shape not in _SHAPES:
        raise MatrixMarketError(f"unknown shape {shape!r}")
    # pattern / skew-symmetric / hermitian are todo!() in the reference
    # (spam_dok/src/lib.rs:358,373,446); implemented here per the MM spec.
    if entry_type == "pattern" and shape in ("skew-symmetric", "hermitian"):
        raise MatrixMarketError(f"pattern matrices cannot be {shape}")
    if shape == "hermitian" and entry_type != "complex":
        raise MatrixMarketError("hermitian requires complex entries")
    symmetric = shape == "symmetric"
    skew = shape == "skew-symmetric"
    hermitian = shape == "hermitian"

    # skip comment lines (spam_dok/src/lib.rs:376)
    i = 1
    while i < len(lines) and (lines[i].lstrip().startswith("%") or not lines[i].strip()):
        i += 1
    if i >= len(lines):
        raise MatrixMarketError("missing size line")

    size_fields = lines[i].split()
    if len(size_fields) != 3:
        raise MatrixMarketError(f"bad size line: {lines[i]!r}")
    try:
        rows, cols, nnz = (int(f) for f in size_fields)
    except ValueError as e:
        raise MatrixMarketError(f"bad size line: {lines[i]!r}") from e
    if rows == 0 or cols == 0:
        raise HasZeroDimensionError("number of rows or columns is 0")
    i += 1

    if entry_type == "integer":
        scalar = np.dtype(int_dtype).type
        dtype = np.dtype(int_dtype)
        nfields = 3
        mtype = MatrixType.INTEGER
    elif entry_type == "real":
        scalar = np.dtype(float_dtype).type
        dtype = np.dtype(float_dtype)
        nfields = 3
        mtype = MatrixType.REAL
    elif entry_type == "pattern":  # "r c" lines, value = 1
        scalar = np.dtype(float_dtype).type
        dtype = np.dtype(float_dtype)
        nfields = 2
        mtype = MatrixType.PATTERN
    else:  # complex: "r c re im"
        scalar = None
        dtype = np.dtype(np.result_type(float_dtype, np.complex64))
        nfields = 4
        mtype = MatrixType.COMPLEX

    m = DokMatrix(rows, cols, dtype=dtype)
    count = 0
    for line in lines[i:]:
        fields = line.split()
        if not fields:
            continue
        if len(fields) != nfields:
            raise MatrixMarketError(f"bad entry line: {line!r}")
        try:
            r = int(fields[0])
            c = int(fields[1])
            if entry_type == "complex":
                t = dtype.type(complex(float(fields[2]), float(fields[3])))
            elif entry_type == "pattern":
                t = scalar(1)
            else:
                t = scalar(fields[2])
        except (ValueError, OverflowError) as e:
            raise MatrixMarketError(f"bad entry line: {line!r}") from e
        if not (1 <= r <= rows and 1 <= c <= cols):
            raise MatrixMarketError(f"entry out of bounds: {line!r}")
        if skew and r == c:
            # a skew-symmetric matrix has a zero diagonal; the MM spec stores
            # only the strictly lower triangle
            raise MatrixMarketError(f"skew-symmetric entry on diagonal: {line!r}")
        if hermitian and r == c and complex(t).imag != 0.0:
            raise MatrixMarketError(f"hermitian diagonal entry not real: {line!r}")
        count += 1
        if t == 0:  # zeros dropped (spam_dok/src/lib.rs:336)
            continue
        m.entries[(r - 1, c - 1)] = t  # 1-indexed -> 0-indexed
        if symmetric and r != c:
            m.entries[(c - 1, r - 1)] = t
        elif skew:
            m.entries[(c - 1, r - 1)] = -t
        elif hermitian and r != c:
            m.entries[(c - 1, r - 1)] = np.conj(t)
    if count != nnz:
        raise MatrixMarketError(f"expected {nnz} entries, found {count}")
    return ParsedMatrix(mtype, m)


def to_matrix_market_string(m: DokMatrix) -> str:
    """Serialize as ``real general`` coordinate text, 1-indexed.

    Reference: ``into_float_matrix_market`` (``spam_dok/src/lib.rs:480-490``).
    """
    out = [f"%%MatrixMarket matrix coordinate real general"]
    out.append(f"{m.rows} {m.cols} {m.nnz()}")
    for (i, j), t in m.iter_entries():
        out.append(f"{i + 1} {j + 1} {_fmt_float(t)}")
    return "\n".join(out) + "\n"


def _fmt_float(t) -> str:
    # repr of a python float round-trips exactly through float()
    return repr(float(t))


def write_matrix_market(m: DokMatrix, f: TextIO) -> None:
    f.write(to_matrix_market_string(m))


def parse_matrix_market_csr(text: str, *, float_dtype=np.float64):
    """Fast path: MatrixMarket ``real``/``integer`` coordinate text straight
    to a sorted CSR, using the native C scanner for the O(nnz) entry lines
    when available (falling back to the DOK parser otherwise).

    Same semantics as :func:`parse_matrix_market` except duplicate
    coordinates are not collapsed (standard MatrixMarket files have none;
    the DOK path keeps last-wins semantics for adversarial inputs).
    """
    from ..formats.csr import CsrMatrix

    lines = text.splitlines()
    header = lines[0].strip().split() if lines else []
    # fast path covers `real` only; integer stays exact and complex two-field
    # through the python parser
    if len(header) < 5 or header[3].lower() != "real":
        parsed = parse_matrix_market(text, float_dtype=float_dtype)
        return CsrMatrix.from_dok(parsed.matrix)
    shape = header[4].lower()
    symmetric = shape == "symmetric"
    skew = shape == "skew-symmetric"
    if shape == "hermitian":
        # real hermitian is invalid per the MM spec; the DOK parser raises
        parsed = parse_matrix_market(text, float_dtype=float_dtype)
        return CsrMatrix.from_dok(parsed.matrix)
    i = 1
    while i < len(lines) and (lines[i].lstrip().startswith("%") or not lines[i].strip()):
        i += 1
    if i >= len(lines):
        raise MatrixMarketError("missing size line")
    try:
        rows, cols, nnz = (int(f) for f in lines[i].split())
    except ValueError as e:
        raise MatrixMarketError(f"bad size line: {lines[i]!r}") from e
    if rows == 0 or cols == 0:
        raise HasZeroDimensionError("number of rows or columns is 0")

    from ..native import parse_entries_native

    body = "\n".join(lines[i + 1 :])
    got = parse_entries_native(body, nnz + 1, 1)
    if got is None:
        parsed = parse_matrix_market(text, float_dtype=float_dtype)
        return CsrMatrix.from_dok(parsed.matrix)
    r, c, v, _vi, n = got
    if n != nnz:
        raise MatrixMarketError(f"expected {nnz} entries, found {n}")
    if n and not ((r >= 1).all() and (r <= rows).all() and (c >= 1).all() and (c <= cols).all()):
        raise MatrixMarketError("entry out of bounds")
    if skew and n and (r == c).any():
        raise MatrixMarketError("skew-symmetric entry on diagonal")
    r = r - 1
    c = c - 1
    keep = v != 0
    r, c, v = r[keep], c[keep], v[keep]
    if symmetric:
        off = r != c
        r, c, v = (
            np.concatenate([r, c[off]]),
            np.concatenate([c, r[off]]),
            np.concatenate([v, v[off]]),
        )
    elif skew:
        r, c, v = (
            np.concatenate([r, c]),
            np.concatenate([c, r]),
            np.concatenate([v, -v]),
        )
    return CsrMatrix.from_coo(
        rows, cols, r, c, v.astype(float_dtype), sum_duplicates=False
    )


def load_matrix_market(path: Union[str, "os.PathLike"], **kw) -> ParsedMatrix:
    with open(path, "r") as f:
        return parse_matrix_market(f.read(), **kw)


def load_matrix_market_csr(path: Union[str, "os.PathLike"], **kw):
    with open(path, "r") as f:
        return parse_matrix_market_csr(f.read(), **kw)


def save_matrix_market(m: DokMatrix, path: Union[str, "os.PathLike"]) -> None:
    with open(path, "w") as f:
        write_matrix_market(m, f)
