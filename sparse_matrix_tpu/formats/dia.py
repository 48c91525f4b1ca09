"""DIA (diagonal) format for banded matrices.

North-star scope (padded device formats). Stencil operators — the 2D Poisson
Laplacian of the CG workload being the canonical case — have all nonzeros on
a handful of diagonals. Stored per-diagonal, SpMV needs **no index data at
all**: each band is a contiguous slice of x times a contiguous vector of
values, which XLA fuses into one memory-bound pass (4 bytes/nnz vs 8 for
ideal CSR; measured >2x the LanePack kernel on Poisson).

``data[b, i] = A[i, i + off[b]]`` (rows outside the band are zero-padded).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .csr import CsrMatrix

__all__ = ["DiaMatrix", "try_dia_from_csr"]

MAX_BANDS = 64
MIN_FILL = 0.25  # band slots actually used


@dataclass(frozen=True)
class DiaMatrix:
    rows: int
    cols: int
    data: np.ndarray  # (nbands, rows)
    offsets: tuple  # static band offsets (col - row), python ints

    @property
    def nbands(self) -> int:
        return int(self.data.shape[0])

    def nnz(self) -> int:
        return int(np.count_nonzero(self.data))

    def to_csr(self) -> CsrMatrix:
        rows_l, cols_l, vals_l = [], [], []
        for b, off in enumerate(self.offsets):
            i = np.arange(self.rows, dtype=np.int64)
            j = i + off
            ok = (j >= 0) & (j < self.cols) & (self.data[b] != 0)
            rows_l.append(i[ok])
            cols_l.append(j[ok])
            vals_l.append(self.data[b][ok])
        return CsrMatrix.from_coo(
            self.rows,
            self.cols,
            np.concatenate(rows_l),
            np.concatenate(cols_l),
            np.concatenate(vals_l),
            sum_duplicates=False,
        )


def try_dia_from_csr(
    m: CsrMatrix,
    *,
    dtype=np.float32,
    max_bands: int = MAX_BANDS,
    min_fill: float = MIN_FILL,
) -> Optional[DiaMatrix]:
    """Convert to DIA when the matrix is band-structured enough to pay:
    at most ``max_bands`` distinct diagonals and at least ``min_fill`` of
    the band storage occupied. Returns None otherwise.

    Results are memoized on the matrix (the operator planner, the hybrid
    splitter, and the SpGEMM dispatcher all probe the same operators
    during AMG setup — 45 probes = 10.5 s of the 2048^2 setup profile
    before the memo)."""
    if m.nnz() == 0:
        return None
    key = ("dia", np.dtype(dtype).str, max_bands, float(min_fill))
    cache = getattr(m, "_cache", None)
    if cache is not None and key in cache:
        return cache[key]
    res = _try_dia_from_csr(m, dtype=dtype, max_bands=max_bands, min_fill=min_fill)
    if cache is not None:
        cache[key] = res
    return res


def _try_dia_from_csr(m, *, dtype, max_bands, min_fill):
    from ..native import offset_hist_native

    hist = offset_hist_native(m.rows, m.offsets, m.indices, max_bands)
    if hist == -1:  # early exit: more than max_bands distinct diagonals
        return None
    if hist is not None:
        offs = hist[0]
    else:
        r = m.row_ids()
        c = m.indices.astype(np.int64)
        if m.nnz() > 1_000_000:
            # sampled pre-filter: a full unique over tens of millions of
            # offsets costs ~1 s per call, and the operator planner probes
            # MANY large non-banded candidates (AMG prolongator shards made
            # 51 calls = 41 s of the 2048^2 setup). A 100k sample showing
            # more than max_bands distinct offsets rejects for certain.
            idx = np.linspace(0, m.nnz() - 1, 100_000).astype(np.int64)
            if len(np.unique(c[idx] - r[idx])) > max_bands:
                return None
        offs = np.unique(c - r)
        if len(offs) > max_bands:
            return None
    if m.nnz() < min_fill * len(offs) * m.rows:
        return None
    data = np.zeros((len(offs), m.rows), dtype=dtype)
    vals = m.vals if m.vals.dtype == np.dtype(dtype) else m.vals.astype(dtype)
    from ..native import dia_fill_native

    if dia_fill_native(m.rows, m.offsets, m.indices, vals, offs, data) is None:
        r = m.row_ids()
        c = m.indices.astype(np.int64)
        band = np.searchsorted(offs, c - r)
        data[band, r] = vals
    return DiaMatrix(m.rows, m.cols, data, tuple(int(o) for o in offs))
