"""Dictionary-of-keys matrix — the semantic oracle.

Re-design of the reference's "dumb matrix implementation to test against"
(``spam_dok/src/lib.rs:29-36``): a plain dict keyed by ``(row, col)``,
zero entries never stored, lexicographic iteration, elementwise add/sub by
sorted merge, naive O(m*n*k) multiply used purely as the differential-test
oracle for the device kernels.
"""

from __future__ import annotations

import operator
from typing import Callable, Dict, Iterator, Optional, Tuple, TypeVar

import numpy as np

from .matrix import Matrix, MatrixIndexError, check_dims

T = TypeVar("T")

__all__ = ["DokMatrix"]


def _is_zero(t) -> bool:
    # `t == 0` handles python ints/floats/complex and numpy scalars alike;
    # NaN compares false so NaN entries are (correctly) stored.
    return bool(t == 0)


class DokMatrix(Matrix[T]):
    """Dict-backed sparse matrix (reference ``DokMatrix``, ``spam_dok/src/lib.rs:32``).

    Invariants (``spam_dok/src/lib.rs:123-126``): every key in bounds and no
    explicit zero values.
    """

    __slots__ = ("_rows", "_cols", "entries", "dtype")

    def __init__(self, rows: int, cols: int, entries: Optional[Dict[Tuple[int, int], T]] = None, dtype=None):
        self._rows, self._cols = check_dims(rows, cols)
        self.entries: Dict[Tuple[int, int], T] = dict(entries) if entries else {}
        self.dtype = dtype

    # -- construction --------------------------------------------------------
    @classmethod
    def new(cls, rows: int, cols: int, *, dtype=None) -> "DokMatrix[T]":
        return cls(rows, cols, dtype=dtype)

    @classmethod
    def identity(cls, n: int, *, dtype=None) -> "DokMatrix[T]":
        one = np.dtype(dtype).type(1) if dtype is not None else 1
        m = cls(n, n, dtype=dtype)
        for i in range(n):
            m.entries[(i, i)] = one
        return m

    @classmethod
    def from_entries(cls, rows: int, cols: int, entries, dtype=None) -> "DokMatrix[T]":
        """Build from an iterable of ((r, c), v); later duplicates win, zeros dropped."""
        m = cls(rows, cols, dtype=dtype)
        for (r, c), v in entries:
            m.set_element((r, c), v)
        return m

    # -- shape / access ------------------------------------------------------
    @property
    def rows(self) -> int:
        return self._rows

    @property
    def cols(self) -> int:
        return self._cols

    def nnz(self) -> int:
        return len(self.entries)

    def get_element(self, pos: Tuple[int, int]) -> Optional[T]:
        self._check_bounds(pos)
        return self.entries.get(pos)

    def set_element(self, pos: Tuple[int, int], t: T) -> Optional[T]:
        # zero writes delete the entry (spam_dok/src/lib.rs:167-176)
        self._check_bounds(pos)
        if _is_zero(t):
            return self.entries.pop(pos, None)
        old = self.entries.get(pos)
        self.entries[pos] = t
        return old

    def __getitem__(self, pos: Tuple[int, int]) -> T:
        """scipy.sparse.dok spelling: absent entries read as 0 (the
        trait-parity spelling, ``get_element``, returns None instead —
        ``spam_matrix/src/lib.rs`` Matrix::get)."""
        v = self.get_element((int(pos[0]), int(pos[1])))
        if v is not None:
            return v
        return np.dtype(self.dtype).type(0) if self.dtype is not None else 0

    def __setitem__(self, pos: Tuple[int, int], t: T) -> None:
        """scipy.sparse.dok spelling of :meth:`set_element` (zero writes
        delete, same as the named method)."""
        self.set_element((int(pos[0]), int(pos[1])), t)

    def transpose(self) -> "DokMatrix[T]":
        return DokMatrix(
            self._cols,
            self._rows,
            {(j, i): t for (i, j), t in self.entries.items()},
            dtype=self.dtype,
        )

    def invariants(self) -> bool:
        return all(
            0 <= r < self._rows and 0 <= c < self._cols and not _is_zero(t)
            for (r, c), t in self.entries.items()
        )

    def iter_entries(self) -> Iterator[Tuple[Tuple[int, int], T]]:
        # lexicographic (row, col) order, as the reference's BTreeMap iteration
        for pos in sorted(self.entries):
            yield pos, self.entries[pos]

    # -- arithmetic -----------------------------------------------------------
    def _apply_elementwise(self, rhs: "DokMatrix[T]", f: Callable[[T, T], T]) -> "DokMatrix[T]":
        # sorted merge over both entry sets (spam_dok/src/lib.rs:101-119);
        # in Python a keys-union pass is equivalent and simpler.
        if self.shape != rhs.shape:
            raise ValueError("matrices must have identical dimensions")
        zero = self._zero()
        out = DokMatrix(self._rows, self._cols, dtype=self.dtype)
        for pos in self.entries.keys() | rhs.entries.keys():
            t = f(self.entries.get(pos, zero), rhs.entries.get(pos, zero))
            out.set_element(pos, t)
        return out

    def _zero(self):
        if self.dtype is not None:
            return np.dtype(self.dtype).type(0)
        for t in self.entries.values():
            if isinstance(t, np.generic):
                return type(t)(0)
            return type(t)()
        return 0

    def __add__(self, rhs: "DokMatrix[T]") -> "DokMatrix[T]":
        return self._apply_elementwise(rhs, operator.add)

    def __sub__(self, rhs: "DokMatrix[T]") -> "DokMatrix[T]":
        return self._apply_elementwise(rhs, operator.sub)

    def __mul__(self, rhs: "DokMatrix[T]") -> "DokMatrix[T]":
        # naive triple loop — the multiplication oracle (spam_dok/src/lib.rs:206-233).
        # Iterates explicit entries only, which is equivalent to the reference's
        # dense loop (absent entries contribute zero terms) but fast enough to
        # use as an oracle on larger fuzz cases.
        if self._cols != rhs._rows:
            raise ValueError("LHS cols != RHS rows")
        if self._has_nonfinite() or rhs._has_nonfinite():
            # The reference's dense loop (spam_dok/src/lib.rs:206-233) multiplies
            # non-finite values by *implicit* zeros (NaN*0 = NaN, inf*0 = NaN),
            # which an explicit-entries-only product would miss. Reproduce it.
            return self._mul_dense(rhs)
        zero = self._zero()
        acc: Dict[Tuple[int, int], T] = {}
        rhs_rows: Dict[int, list] = {}
        for (k, j), t in sorted(rhs.entries.items()):
            rhs_rows.setdefault(k, []).append((j, t))
        for (i, k), t in sorted(self.entries.items()):
            for j, t1 in rhs_rows.get(k, ()):
                pos = (i, j)
                acc[pos] = acc.get(pos, zero) + t * t1
        out = DokMatrix(self._rows, rhs._cols, dtype=self.dtype)
        for pos, t in acc.items():
            out.set_element(pos, t)
        return out

    def _has_nonfinite(self) -> bool:
        for t in self.entries.values():
            if isinstance(t, (float, complex, np.floating, np.complexfloating)) and not np.all(
                np.isfinite(t)
            ):
                return True
        return False

    def _mul_dense(self, rhs: "DokMatrix[T]") -> "DokMatrix[T]":
        zero = self._zero()
        out = DokMatrix(self._rows, rhs._cols, dtype=self.dtype)
        for i in range(self._rows):
            for j in range(rhs._cols):
                t = zero
                for k in range(self._cols):
                    a = self.entries.get((i, k), zero)
                    b = rhs.entries.get((k, j), zero)
                    t = t + a * b
                out.set_element((i, j), t)
        return out

    # -- misc -----------------------------------------------------------------
    def __eq__(self, other) -> bool:
        if not isinstance(other, DokMatrix):
            return NotImplemented
        if self.shape != other.shape or len(self.entries) != len(other.entries):
            return False
        for pos, t in self.entries.items():
            u = other.entries.get(pos)
            if u is None or not _eq_scalar(t, u):
                return False
        return True

    def __hash__(self):  # pragma: no cover - mutable; defined for dict debug use only
        return id(self)

    def __repr__(self) -> str:
        ents = ", ".join(f"({i}, {j}): {t!r}" for (i, j), t in self.iter_entries())
        return f"DokMatrix({self._rows}x{self._cols}, {{{ents}}})"

    def debug_in_scientific_notation(self) -> str:
        """Readable float dump (``spam_dok/src/lib.rs:38-50``)."""
        body = ", ".join(f"({i}, {j}, {float(t):e})" for (i, j), t in self.iter_entries())
        return "{" + body + "}"

    def to_dense(self) -> np.ndarray:
        dtype = self.dtype if self.dtype is not None else np.result_type(
            *(np.asarray(t).dtype for t in self.entries.values())
        ) if self.entries else np.float64
        a = np.zeros((self._rows, self._cols), dtype=dtype)
        for (i, j), t in self.entries.items():
            a[i, j] = t
        return a

    @classmethod
    def from_dense(cls, a: np.ndarray) -> "DokMatrix":
        a = np.asarray(a)
        m = cls(a.shape[0], a.shape[1], dtype=a.dtype)
        for i, j in zip(*np.nonzero(a)):
            m.entries[(int(i), int(j))] = a[i, j]
        return m


def _eq_scalar(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (np.isnan(a) and np.isnan(b))
    return bool(a == b)
