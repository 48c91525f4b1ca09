"""Structural CSR generators: build valid vals/indices/offsets directly.

Re-design of the reference's structural proptest generators
(``spam_csr/src/tests.rs:25-91``): instead of going through DOK, these
construct the CSR arrays per row — a random distinct column set (unsorted
variant) or a sorted subsequence of all columns (sorted variant) — validating
the format's invariant checker itself and the iterator paths.
"""

from __future__ import annotations

import numpy as np
from hypothesis import strategies as st

from ..formats.csr import CsrMatrix, INDEX_DTYPE, OFFSET_DTYPE

__all__ = ["csr_structural"]

MAX_DIM = 10  # dims in 1..10 as the reference (tests.rs:23)


@st.composite
def csr_structural(draw, *, sorted_rows: bool, dtype=np.int8, max_dim: int = MAX_DIM):
    rows = draw(st.integers(1, max_dim))
    cols = draw(st.integers(1, max_dim))
    all_cols = list(range(cols))
    indices = []
    offsets = [0]
    for _ in range(rows):
        if sorted_rows:
            # sorted variant: a subsequence of 0..cols (tests.rs:58-91)
            row_cols = [c for c in all_cols if draw(st.booleans())]
        else:
            # unsorted variant: a shuffled distinct set (tests.rs:25-51)
            k = draw(st.integers(0, cols))
            row_cols = draw(st.permutations(all_cols))[:k]
        indices.extend(row_cols)
        offsets.append(len(indices))
    nnz = len(indices)
    vals = np.asarray(
        [draw(st.integers(-128, 127)) for _ in range(nnz)], dtype=dtype
    )
    return CsrMatrix(
        rows,
        cols,
        vals,
        np.asarray(indices, dtype=INDEX_DTYPE),
        np.asarray(offsets, dtype=OFFSET_DTYPE),
        is_sorted=sorted_rows,
    )
