"""Host CSR format.

Re-design of the reference ``CsrMatrix<T, const IS_SORTED: bool>``
(``spam_csr/src/lib.rs:26-32``) as a numpy-array-backed Python class with a
runtime ``is_sorted`` flag instead of a const generic. This is the *host*
representation: construction, conversion and element access live here; the
device kernels (``sparse_matrix_tpu.ops``) consume its arrays as jnp pytrees.

The seven structural invariants (``spam_csr/src/lib.rs:47-81``):

1. ``len(indices) == len(vals)``
2. ``len(offsets) == rows + 1``
3. ``offsets`` is non-decreasing
4. ``offsets[rows] == nnz``
5. all column indices are in ``[0, cols)``
6. per-row indices strictly increasing if sorted, else all-distinct
7. ``offsets[0] == 0``

Unlike DOK, CSR stores explicit zeros (e.g. from additive cancellation, as the
reference's ``apply_elementwise`` does, ``spam_csr/src/lib.rs:83-148``).

Index dtype is uint32 with ``0xFFFF_FFFF`` reserved as the empty/pad sentinel,
carrying the reference's contract that column indices be < 2^32-1
(``spam_csr/src/mul_hash.rs:12``); it doubles as the padding sentinel of the
tiled device formats.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from ..core.dok import DokMatrix
from ..core.matrix import Matrix, check_dims

__all__ = [
    "CsrMatrix", "INDEX_DTYPE", "OFFSET_DTYPE", "SENTINEL", "sample_row_bands"
]


def sample_row_bands(m: "CsrMatrix", target_nnz: int = 200_000):
    """(sub_csr, scale): a few contiguous row bands totalling about
    ``target_nnz`` entries, and the factor to scale entry/slab/chunk
    counts back up. Contiguous bands preserve the local structure the
    format planners' cost estimators key on; their counts scale linearly
    in nnz. Used by the dispatch estimators on multi-million-nnz
    operators (a full estimator pass there costs seconds of AMG setup
    per level)."""
    nnz = m.nnz()
    if nnz <= target_nnz:
        return m, 1.0
    # memoized per (matrix, target): dispatch costing, kw selection, and
    # the bell pre-filter each re-sample the same operator during one
    # plan, and every fresh sample re-derives row_ids/slab counts from
    # scratch (0.8 s of a 2048² AMG setup)
    memo = m._cache.setdefault("row_band_sample", {})
    hit = memo.get(target_nnz)
    if hit is not None:
        return hit
    nbands = 4
    band_nnz = target_nnz // nbands
    starts = np.linspace(0, nnz - band_nnz, nbands).astype(np.int64)
    offs = m.offsets
    vals_parts, idx_parts, counts, bounds = [], [], [], []
    new_row = 0
    for st in starts:
        r0 = int(np.searchsorted(offs, st, side="right") - 1)
        r1 = int(np.searchsorted(offs, st + band_nnz, side="right"))
        r1 = min(max(r1, r0 + 1), m.rows)
        lo, hi = int(offs[r0]), int(offs[r1])
        vals_parts.append(m.vals[lo:hi])
        idx_parts.append(m.indices[lo:hi].astype(np.int64))
        counts.append(np.diff(offs[r0 : r1 + 1]))
        bounds.append(r0 - new_row)  # band's row renumbering shift
        new_row += r1 - r0
    # renumbering rows breaks every element offset c - r unless the
    # band's columns shift along with its rows; a uniform extra offset C
    # keeps shifted columns non-negative without changing the offset
    # structure (layer/bucket/chunk patterns are shift-invariant)
    C = max(max(bounds), 0)
    idx_parts = [
        (ip - sh + C).astype(INDEX_DTYPE) for ip, sh in zip(idx_parts, bounds)
    ]
    cnt = np.concatenate(counts)
    sub_offs = np.zeros(len(cnt) + 1, OFFSET_DTYPE)
    np.cumsum(cnt, out=sub_offs[1:])
    sub = CsrMatrix(
        len(cnt), m.cols + C, np.concatenate(vals_parts),
        np.concatenate(idx_parts), sub_offs, is_sorted=m.is_sorted,
    )
    out = (sub, nnz / max(1, sub.nnz()))
    memo[target_nnz] = out
    return out

INDEX_DTYPE = np.uint32
OFFSET_DTYPE = np.int64
SENTINEL = np.uint32(0xFFFFFFFF)  # empty/pad marker (mul_hash.rs:12 contract)


class CsrMatrix(Matrix):
    """Compressed sparse row matrix with optional within-row column sorting."""

    __slots__ = (
        "_rows", "_cols", "vals", "indices", "offsets", "is_sorted", "_cache",
        "_version",
    )

    def __init__(
        self,
        rows: int,
        cols: int,
        vals: np.ndarray,
        indices: np.ndarray,
        offsets: np.ndarray,
        *,
        is_sorted: bool,
        validate: bool = False,
    ):
        self._rows, self._cols = check_dims(rows, cols)
        self.vals = np.asarray(vals)
        self.indices = np.asarray(indices, dtype=INDEX_DTYPE)
        self.offsets = np.asarray(offsets, dtype=OFFSET_DTYPE)
        self.is_sorted = bool(is_sorted)
        # memo for idempotent structure analyses (DIA probes, offset
        # histograms): the operator planner and the SpGEMM dispatcher probe
        # the same matrix repeatedly during AMG setup (45 try_dia calls =
        # 10.5 s of the 2048^2 profile). Invalidated by set_element, which
        # also bumps _version (memo stamps of OTHER matrices referencing
        # this one — the transpose memo — check it to detect mutation).
        self._cache = {}
        self._version = 0
        if validate and not self.invariants():
            raise ValueError("CSR invariants violated")

    # -- construction --------------------------------------------------------
    @classmethod
    def new(cls, rows: int, cols: int, *, dtype=np.float64, is_sorted: bool = True) -> "CsrMatrix":
        # the reference pre-allocates min(1000, r*c/5) capacity
        # (spam_csr/src/lib.rs:162-171) — a growth heuristic numpy doesn't need.
        rows, cols = check_dims(rows, cols)
        return cls(
            rows,
            cols,
            np.zeros(0, dtype=dtype),
            np.zeros(0, dtype=INDEX_DTYPE),
            np.zeros(rows + 1, dtype=OFFSET_DTYPE),
            is_sorted=is_sorted,
        )

    @classmethod
    def identity(cls, n: int, *, dtype=np.float64, is_sorted: bool = True) -> "CsrMatrix":
        # spam_csr/src/lib.rs:177-185
        return cls(
            n,
            n,
            np.ones(n, dtype=dtype),
            np.arange(n, dtype=INDEX_DTYPE),
            np.arange(n + 1, dtype=OFFSET_DTYPE),
            is_sorted=is_sorted,
        )

    @classmethod
    def from_dok(cls, dok: DokMatrix, *, dtype=None) -> "CsrMatrix":
        """Sorted CSR from DOK via one pass over lexicographic entries
        (``spam_csr/src/lib.rs:315-334``)."""
        dtype = dtype if dtype is not None else (dok.dtype or np.float64)
        n = dok.nnz()
        rr = np.empty(n, dtype=np.int64)
        cc = np.empty(n, dtype=np.int64)
        vv = np.empty(n, dtype=dtype)
        for k, ((i, j), t) in enumerate(dok.iter_entries()):
            rr[k], cc[k], vv[k] = i, j, t
        offsets = np.zeros(dok.rows + 1, dtype=OFFSET_DTYPE)
        offsets[1:] = np.bincount(rr, minlength=dok.rows)
        np.cumsum(offsets, out=offsets)
        return cls(dok.rows, dok.cols, vv, cc.astype(INDEX_DTYPE), offsets, is_sorted=True)

    @classmethod
    def from_dok_shuffled(cls, dok: DokMatrix, rng: np.random.Generator, *, dtype=None) -> "CsrMatrix":
        """Unsorted CSR from DOK: shuffle entries, then stable-sort by row only,
        so within-row column order is randomized — the adversarial-order
        generator used throughout the reference tests
        (``from_dok``, ``spam_csr/src/lib.rs:336-358``)."""
        m = cls.from_dok(dok, dtype=dtype)
        perm_vals = m.vals.copy()
        perm_idx = m.indices.copy()
        for r in range(m.rows):
            lo, hi = int(m.offsets[r]), int(m.offsets[r + 1])
            if hi - lo > 1:
                p = rng.permutation(hi - lo)
                perm_vals[lo:hi] = perm_vals[lo:hi][p]
                perm_idx[lo:hi] = perm_idx[lo:hi][p]
        return cls(m.rows, m.cols, perm_vals, perm_idx, m.offsets, is_sorted=False)

    @classmethod
    def from_coo(
        cls, rows: int, cols: int, r: np.ndarray, c: np.ndarray, v: np.ndarray, *, sum_duplicates: bool = True
    ) -> "CsrMatrix":
        """Sorted CSR from COO triplets (vectorized lexsort path)."""
        rows, cols = check_dims(rows, cols)
        r = np.asarray(r, dtype=np.int64)
        c = np.asarray(c, dtype=np.int64)
        v = np.asarray(v)
        order = np.lexsort((c, r))
        r, c, v = r[order], c[order], v[order]
        if sum_duplicates and len(r):
            keys = r * cols + c
            head = np.empty(len(keys), dtype=bool)
            head[0] = True
            np.not_equal(keys[1:], keys[:-1], out=head[1:])
            seg = np.cumsum(head) - 1
            v = _segsum_exact(seg, v)
            r, c = r[head], c[head]
        offsets = np.zeros(rows + 1, dtype=OFFSET_DTYPE)
        offsets[1:] = np.bincount(r, minlength=rows)
        np.cumsum(offsets, out=offsets)
        return cls(rows, cols, v, c.astype(INDEX_DTYPE), offsets, is_sorted=True)

    @classmethod
    def from_scipy(cls, s) -> "CsrMatrix":
        """From any scipy.sparse matrix (sorted CSR)."""
        from ..verify.differential import from_scipy

        return from_scipy(s)

    def to_scipy(self):
        """To scipy.sparse.csr_matrix."""
        from ..verify.differential import to_scipy

        return to_scipy(self)

    @classmethod
    def from_bcoo(cls, b) -> "CsrMatrix":
        """From a ``jax.experimental.sparse.BCOO`` (unbatched, unblocked);
        duplicate coordinates are summed (BCOO allows them, CSR invariant 6
        does not)."""
        if getattr(b, "n_batch", 0) or getattr(b, "n_dense", 0):
            raise ValueError("from_bcoo supports unbatched/unblocked BCOO only")
        idx = np.asarray(b.indices, dtype=np.int64)
        return cls.from_coo(
            int(b.shape[0]), int(b.shape[1]), idx[:, 0], idx[:, 1],
            np.asarray(b.data),
        )

    def to_bcoo(self, *, dtype=None):
        """To ``jax.experimental.sparse.BCOO`` — the bridge to jax's own
        experimental sparse stack (``sparsify`` transforms, BCOO matmuls).
        Note BCOO's general matvec lowers to XLA gather/scatter (~0.14
        Gelem/s on v5e, docs/PERF.md); planned operators
        (:class:`~sparse_matrix_tpu.ops.operator.SpmvOperator`) stay the
        fast path — this exists for interop, not speed."""
        import jax.numpy as jnp
        from jax.experimental import sparse as jsparse

        v = self.vals if dtype is None else self.vals.astype(dtype)
        idx = np.stack(
            [self.row_ids(), self.indices.astype(np.int64)], axis=1
        )
        return jsparse.BCOO(
            (jnp.asarray(v), jnp.asarray(idx)), shape=self.shape,
            indices_sorted=self.is_sorted, unique_indices=True,
        )

    def to_dok(self) -> DokMatrix:
        """CSR -> DOK (zero entries dropped by DOK set semantics),
        reference ``From<CsrMatrix> for DokMatrix`` (``spam_csr/src/lib.rs:375-384``)."""
        m = DokMatrix(self._rows, self._cols, dtype=self.vals.dtype)
        for pos, t in self.iter_entries():
            m.set_element(pos, t)
        return m

    # -- shape / access ------------------------------------------------------
    @property
    def rows(self) -> int:
        return self._rows

    @property
    def cols(self) -> int:
        return self._cols

    def nnz(self) -> int:
        return int(self.indices.shape[0])

    def row_slice(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        lo, hi = int(self.offsets[i]), int(self.offsets[i + 1])
        return self.indices[lo:hi], self.vals[lo:hi]

    def get_element(self, pos: Tuple[int, int]):
        # binary search when sorted, linear scan otherwise
        # (spam_csr/src/lib.rs:199-213)
        self._check_bounds(pos)
        i, j = pos
        cidx, vals = self.row_slice(i)
        if self.is_sorted:
            k = np.searchsorted(cidx, j)
            if k < len(cidx) and cidx[k] == j:
                return vals[k]
            return None
        hits = np.nonzero(cidx == j)[0]
        return vals[hits[0]] if len(hits) else None

    def set_element(self, pos: Tuple[int, int], t):
        # CSR stores explicit zeros; inserting shifts the tail and bumps
        # offsets (spam_csr/src/lib.rs:215-254). Numpy arrays make this a
        # rebuild-with-insert; same semantics, vectorized shift.
        self._check_bounds(pos)
        i, j = pos
        lo, hi = int(self.offsets[i]), int(self.offsets[i + 1])
        cidx = self.indices[lo:hi]
        if self.is_sorted:
            k = int(np.searchsorted(cidx, j))
            found = k < len(cidx) and cidx[k] == j
        else:
            hits = np.nonzero(cidx == j)[0]
            found = len(hits) > 0
            k = int(hits[0]) if found else len(cidx)  # append at row end
        self._cache = {}
        self._version += 1
        if found:
            old = self.vals[lo + k]
            self.vals = self.vals.copy()
            self.vals[lo + k] = t
            return old
        ins = lo + k
        self.vals = np.insert(self.vals, ins, t)
        self.indices = np.insert(self.indices, ins, INDEX_DTYPE(j))
        self.offsets = self.offsets.copy()
        self.offsets[i + 1 :] += 1
        return None

    # -- structure ------------------------------------------------------------
    def transpose(self) -> "CsrMatrix":
        """Transpose by stable (col, row) sort — O(nnz log nnz), replacing the
        reference's dense O(r*c) sweep (``spam_csr/src/lib.rs:256-264``, noted
        as a simplicity artifact in SURVEY.md). Output rows end up sorted, as
        the reference's does. The native runtime runs it as an O(nnz)
        counting sort (row-major iteration makes the stable scatter emit
        each transposed row already sorted — identical output).

        Memoized both ways with a version stamp (AMG setup transposed each
        42M-nnz prolongator twice — once for the Galerkin product, once for
        the restriction operator); a mutated result drops the memo."""
        memo = self._cache.get("transpose")
        if memo is not None:
            t, stamp = memo
            if t._version == stamp:
                return t
        t = self._transpose_impl()
        self._cache["transpose"] = (t, t._version)
        t._cache["transpose"] = (self, self._version)  # reverse memo
        return t

    def _transpose_impl(self) -> "CsrMatrix":
        from ..native import csr_transpose_native

        res = csr_transpose_native(
            self._rows, self._cols, self.offsets, self.indices, self.vals
        )
        if res is not None:
            t_offsets, t_indices, t_vals = res
            return CsrMatrix(
                self._cols,
                self._rows,
                t_vals,
                t_indices,
                t_offsets.astype(OFFSET_DTYPE),
                is_sorted=self.is_sorted,
            )
        n = self.nnz()
        row_ids = np.repeat(np.arange(self._rows, dtype=np.int64), np.diff(self.offsets))
        order = np.lexsort((row_ids, self.indices.astype(np.int64)))
        new_offsets = np.zeros(self._cols + 1, dtype=OFFSET_DTYPE)
        new_offsets[1:] = np.bincount(self.indices.astype(np.int64), minlength=self._cols)
        np.cumsum(new_offsets, out=new_offsets)
        return CsrMatrix(
            self._cols,
            self._rows,
            self.vals[order],
            row_ids[order].astype(INDEX_DTYPE),
            new_offsets,
            is_sorted=self.is_sorted,
        )

    # -- invariants ------------------------------------------------------------
    def invariant1(self) -> bool:
        return self.indices.shape[0] == self.vals.shape[0]

    def invariant2(self) -> bool:
        return self.offsets.shape[0] == self._rows + 1

    def invariant3(self) -> bool:
        return bool(np.all(np.diff(self.offsets) >= 0))

    def invariant4(self) -> bool:
        return int(self.offsets[self._rows]) == self.indices.shape[0]

    def invariant5(self) -> bool:
        return bool(np.all(self.indices < self._cols)) if self.nnz() else True

    def invariant6(self) -> bool:
        if self.nnz() == 0:
            return True
        idx = self.indices.astype(np.int64)
        d = np.diff(idx)
        row_start_mask = np.zeros(len(idx), dtype=bool)
        starts = self.offsets[:-1][np.diff(self.offsets) > 0]
        row_start_mask[starts.astype(np.int64)] = True
        if self.is_sorted:
            # strictly increasing within each row
            return bool(np.all((d > 0) | row_start_mask[1:]))
        # all-distinct within each row
        for r in range(self._rows):
            lo, hi = int(self.offsets[r]), int(self.offsets[r + 1])
            if hi - lo != len(np.unique(idx[lo:hi])):
                return False
        return True

    def invariant7(self) -> bool:
        return int(self.offsets[0]) == 0

    def invariants(self) -> bool:
        return (
            self.invariant1()
            and self.invariant2()
            and self.invariant3()
            and self.invariant4()
            and self.invariant5()
            and self.invariant6()
            and self.invariant7()
        )

    # -- iteration -------------------------------------------------------------
    def iter_entries(self) -> Iterator[Tuple[Tuple[int, int], object]]:
        for r in range(self._rows):
            lo, hi = int(self.offsets[r]), int(self.offsets[r + 1])
            for k in range(lo, hi):
                yield (r, int(self.indices[k])), self.vals[k]

    def matvec_host(self, x: np.ndarray) -> np.ndarray:
        """Exact host ``A @ x`` in f64 (oracle/residual checks; vectors or
        ``(cols, K)`` blocks). The device paths live in ``ops/``."""
        x = np.asarray(x, dtype=np.float64)
        rid = self.row_ids()
        idx = self.indices.astype(np.int64)
        v = self.vals.astype(np.float64)
        if x.ndim == 1:
            out = np.zeros(self._rows, np.float64)
            np.add.at(out, rid, v * x[idx])
        else:
            out = np.zeros((self._rows, x.shape[1]), np.float64)
            np.add.at(out, rid, v[:, None] * x[idx])
        return out

    def row_ids(self) -> np.ndarray:
        """Per-entry row index (expansion of offsets).

        Memoized (callers must treat the result as read-only): format
        planning and SpGEMM dispatch re-derive it repeatedly — np.repeat
        alone was 1.7 s of the 2048^2 AMG setup profile. Invalidated by
        ``set_element`` with the rest of ``_cache``."""
        out = self._cache.get("row_ids")
        if out is None:
            out = np.repeat(np.arange(self._rows, dtype=np.int64), np.diff(self.offsets))
            self._cache["row_ids"] = out
        return out

    # -- arithmetic -------------------------------------------------------------
    def apply_elementwise(self, rhs: "CsrMatrix", f) -> "CsrMatrix":
        """Union-merge combine keeping cancellation zeros explicit, as the
        reference's ``apply_elementwise`` (``spam_csr/src/lib.rs:83-148``):
        for every position present in either operand the result stores
        ``f(t1, t2)`` with the absent side as zero. ``f`` must be a numpy
        ufunc-compatible binary function (vectorized)."""
        if self.shape != rhs.shape:
            raise ValueError("matrices must have identical dimensions")
        dtype = np.result_type(self.vals.dtype, rhs.vals.dtype)
        zero = dtype.type(0)
        ra, ca, va = self.row_ids(), self.indices.astype(np.int64), self.vals
        rb, cb, vb = rhs.row_ids(), rhs.indices.astype(np.int64), rhs.vals
        # tag 0 = lhs, 1 = rhs; lexsort by (row, col, tag) aligns pairs
        r = np.concatenate([ra, rb])
        c = np.concatenate([ca, cb])
        v = np.concatenate([va.astype(dtype), vb.astype(dtype)])
        tag = np.concatenate(
            [np.zeros(len(ra), np.int8), np.ones(len(rb), np.int8)]
        )
        if self._rows * self._cols < 2**62:
            # packed single-key stable sort (radix) == lexsort((tag, c, r)):
            # stability preserves lhs-before-rhs concatenation order for
            # equal (row, col), which is exactly the tag order
            order = np.argsort(r * self._cols + c, kind="stable")
        else:  # packed key would overflow int64
            order = np.lexsort((tag, c, r))
        r, c, v, tag = r[order], c[order], v[order], tag[order]
        n = len(r)
        if n == 0:
            return CsrMatrix(
                self._rows, self._cols, v, c.astype(INDEX_DTYPE),
                np.zeros(self._rows + 1, dtype=OFFSET_DTYPE), is_sorted=True,
            )
        head = np.empty(n, dtype=bool)
        head[0] = True
        head[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        both = ~head  # second element of an aligned pair
        # per unique key: lhs value (or 0) and rhs value (or 0)
        lhs_v = np.where(tag == 0, v, zero)
        rhs_v = np.where(tag == 1, v, zero)
        pair_next_rhs = np.zeros(n, dtype=dtype)
        pair_next_rhs[:-1] = np.where(both[1:], rhs_v[1:], zero)
        t1 = np.where(head, lhs_v, zero)
        t2 = np.where(head, np.where(tag == 0, pair_next_rhs, rhs_v), zero)
        out_v = f(t1[head], t2[head])
        r_o, c_o = r[head], c[head]
        offsets = np.zeros(self._rows + 1, dtype=OFFSET_DTYPE)
        offsets[1:] = np.bincount(r_o, minlength=self._rows)
        np.cumsum(offsets, out=offsets)
        return CsrMatrix(
            self._rows,
            self._cols,
            np.asarray(out_v, dtype=dtype),
            c_o.astype(INDEX_DTYPE),
            offsets,
            is_sorted=True,
        )

    def __add__(self, rhs: "CsrMatrix") -> "CsrMatrix":
        return self.apply_elementwise(rhs, np.add)

    def __sub__(self, rhs: "CsrMatrix") -> "CsrMatrix":
        return self.apply_elementwise(rhs, np.subtract)

    def __matmul__(self, rhs: "CsrMatrix") -> "CsrMatrix":
        # unsorted output, as the reference's Mul operator
        # (spam_csr/src/lib.rs:292-297); engine picked by cost model
        from ..ops.spgemm_block import spgemm_auto

        return spgemm_auto(self, rhs, output_sorted=False)

    def __eq__(self, other) -> bool:
        if not isinstance(other, CsrMatrix):
            return NotImplemented
        return (
            self.shape == other.shape
            and self.is_sorted == other.is_sorted
            and np.array_equal(self.offsets, other.offsets)
            and np.array_equal(self.indices, other.indices)
            and np.array_equal(self.vals, other.vals, equal_nan=np.issubdtype(self.vals.dtype, np.floating))
        )

    def __hash__(self):  # pragma: no cover
        return id(self)

    def __repr__(self) -> str:
        return (
            f"CsrMatrix({self._rows}x{self._cols}, nnz={self.nnz()}, "
            f"sorted={self.is_sorted}, dtype={self.vals.dtype})"
        )

    def to_dense(self) -> np.ndarray:
        a = np.zeros((self._rows, self._cols), dtype=self.vals.dtype)
        r = self.row_ids()
        # duplicate-free by invariant 6, so direct assignment is safe
        a[r, self.indices.astype(np.int64)] = self.vals
        return a

    # -- scipy.sparse-shaped convenience surface -------------------------------
    # Aliases so scipy.sparse users can switch with minimal edits (the compat
    # namespace ``sparse_matrix_tpu.sparse`` builds on these). One deliberate
    # difference: ``nnz`` is a METHOD here (reference ``Matrix::nnz``,
    # spam_matrix/src/lib.rs:15-27), not scipy's property — use ``getnnz()``
    # for the scipy spelling.

    @property
    def T(self) -> "CsrMatrix":
        return self.transpose()

    def toarray(self) -> np.ndarray:
        return self.to_dense()

    def todense(self) -> np.ndarray:
        return self.to_dense()

    def tocsr(self) -> "CsrMatrix":
        return self

    def getnnz(self) -> int:
        return self.nnz()

    def count_nonzero(self) -> int:
        return int(np.count_nonzero(self.vals))

    def dot(self, other):
        """Matrix-matrix (CsrMatrix) or matrix-vector/block (ndarray)."""
        if isinstance(other, CsrMatrix):
            return self @ other
        arr = np.asarray(other)
        if arr.ndim == 1:
            return self.matvec_host(arr)
        if arr.ndim == 2:
            return np.stack(
                [self.matvec_host(arr[:, j]) for j in range(arr.shape[1])], axis=1
            )
        raise ValueError("dot expects a CsrMatrix, vector, or 2-D block")

    def diagonal(self, k: int = 0) -> np.ndarray:
        """The k-th diagonal as a dense vector (scipy semantics: missing
        entries read as zero)."""
        n = max(0, min(self._rows + min(k, 0), self._cols - max(k, 0)))
        out = np.zeros(n, dtype=self.vals.dtype)
        r = self.row_ids()
        c = self.indices.astype(np.int64)
        on = c - r == k
        out[np.where(k >= 0, r[on], c[on])] = self.vals[on]
        return out

    def astype(self, dtype) -> "CsrMatrix":
        return CsrMatrix(
            self._rows, self._cols, self.vals.astype(dtype),
            self.indices.copy(), self.offsets.copy(), is_sorted=self.is_sorted,
        )

    def copy(self) -> "CsrMatrix":
        return self.astype(self.vals.dtype)

    def conj(self) -> "CsrMatrix":
        return CsrMatrix(
            self._rows, self._cols, np.conj(self.vals),
            self.indices.copy(), self.offsets.copy(), is_sorted=self.is_sorted,
        )

    def multiply(self, other: "CsrMatrix") -> "CsrMatrix":
        """Elementwise (Hadamard) product; the output pattern is the
        INTERSECTION of the two patterns (scipy.sparse semantics, unlike
        :meth:`apply_elementwise`'s union merge for add/sub)."""
        if not isinstance(other, CsrMatrix):
            other = CsrMatrix.from_coo(
                self._rows, self._cols,
                *np.nonzero(np.asarray(other)),
                np.asarray(other)[np.nonzero(np.asarray(other))],
            )
        if self.shape != other.shape:
            raise ValueError("matrices must have identical dimensions")
        ka = self.row_ids() * self._cols + self.indices.astype(np.int64)
        kb = other.row_ids() * self._cols + other.indices.astype(np.int64)
        _, ia, ib = np.intersect1d(ka, kb, assume_unique=True, return_indices=True)
        v = self.vals[ia] * other.vals[ib]
        k = ka[ia]
        return CsrMatrix.from_coo(
            self._rows, self._cols, k // self._cols, k % self._cols, v,
            sum_duplicates=False,
        )

    def sum(self, axis=None):
        """Total (axis=None), column sums (axis=0), or row sums (axis=1) —
        returned as plain ndarrays, not np.matrix."""
        if axis is None:
            return self.vals.sum()
        if axis in (0, -2):
            return np.bincount(
                self.indices.astype(np.int64), weights=self.vals.real,
                minlength=self._cols,
            ).astype(self.vals.dtype) if not np.iscomplexobj(self.vals) else (
                np.bincount(self.indices.astype(np.int64), weights=self.vals.real, minlength=self._cols)
                + 1j * np.bincount(self.indices.astype(np.int64), weights=self.vals.imag, minlength=self._cols)
            )
        if axis in (1, -1):
            out = np.zeros(self._rows, dtype=self.vals.dtype)
            np.add.at(out, self.row_ids(), self.vals)
            return out
        raise ValueError(f"axis must be None, 0, or 1, got {axis}")


def _segsum_exact(seg: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Segment sum preserving dtype (wrapping ints wrap; floats sum in order)."""
    nseg = int(seg[-1]) + 1 if len(seg) else 0
    out = np.zeros(nseg, dtype=v.dtype)
    np.add.at(out, seg, v)
    return out
