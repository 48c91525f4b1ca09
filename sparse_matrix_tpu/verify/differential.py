"""Differential testing against scipy.sparse — the working analog of the
reference's deleted Intel MKL differential backend (``fuzz/Cargo.toml:25-33``,
``mkl-sys`` in ``fuzz/Cargo.lock``; sources deleted upstream).

scipy is the independent third implementation: CSR SpGEMM, add, transpose.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..formats.csr import CsrMatrix

__all__ = ["to_scipy", "from_scipy", "scipy_available"]


def scipy_available() -> bool:
    try:
        import scipy.sparse  # noqa: F401

        return True
    except ImportError:  # pragma: no cover
        return False


def to_scipy(m: CsrMatrix):
    import scipy.sparse as sp

    return sp.csr_matrix(
        (m.vals.copy(), m.indices.astype(np.int64), m.offsets.astype(np.int64)),
        shape=m.shape,
    )


def from_scipy(s) -> CsrMatrix:
    s = s.tocsr()
    s.sort_indices()
    return CsrMatrix(
        s.shape[0],
        s.shape[1],
        s.data,
        s.indices.astype(np.uint32),
        s.indptr.astype(np.int64),
        is_sorted=True,
    )
