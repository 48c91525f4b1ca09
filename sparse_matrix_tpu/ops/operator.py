"""Planned SpMV operator with automatic format selection.

A production sparse library picks the storage scheme from the structure of
the operator (MKL/cuSPARSE ship DIA/banded paths next to CSR). Here:

* band-structured matrices (few distinct diagonals, decently filled) go to
  DIA — index-free shifts+FMA SpMV at memory speed-of-light;
* everything else goes to LanePack — the general Pallas kernel.

The plan is built once and reused across applications (CG iterates the same
operator hundreds of times).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..formats.csr import CsrMatrix
from ..formats.dia import try_dia_from_csr
from ..formats.lanepack import plan_lanepack

__all__ = ["SpmvOperator"]


class SpmvOperator:
    """``op = SpmvOperator(csr); y = op(x)`` — jit-friendly planned SpMV."""

    def __init__(self, m: CsrMatrix, *, dtype=np.float32, force: Optional[str] = None):
        self.rows, self.cols = m.rows, m.cols
        self.nnz = m.nnz()
        dia = try_dia_from_csr(m, dtype=dtype) if force in (None, "dia") else None
        if force == "lanepack":
            dia = None
        if dia is not None:
            from .spmv_dia import dia_device_arrays

            self.format = "dia"
            self._dia = dia
            self._arrs = dia_device_arrays(dia)
        else:
            from .spmv import lanepack_device_arrays

            self.format = "lanepack"
            self._plan = plan_lanepack(m, dtype=dtype)
            self._arrs = lanepack_device_arrays(self._plan)

    def __call__(self, x):
        if self.format == "dia":
            from .spmv_dia import spmv_dia

            return spmv_dia(self._dia, x, device_arrays=self._arrs)
        from .spmv import spmv_lanepack

        return spmv_lanepack(self._plan, x, device_arrays=self._arrs)

    def bytes_per_apply(self) -> int:
        """HBM bytes streamed per SpMV (operator data only)."""
        if self.format == "dia":
            return int(self._dia.data.nbytes)
        return self._plan.slot_bytes()
