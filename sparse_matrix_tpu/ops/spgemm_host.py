"""Host-side SpGEMM: planner + Gustavson-hash + vectorized ESC.

Re-design of the reference's parallel two-phase hash SpGEMM
(``spam_csr/src/mul_hash.rs``, itself "based off pengdada/mtspgemmlib") for the
host runtime. Three entry points:

* :func:`flops_per_row` / :func:`partition_rows_by_flops` — the FLOP-counting
  load balancer (reference ``rows_to_threads``, ``mul_hash.rs:38-64``), shared
  by the host paths, the C++ native runtime, and the device tile planner.
* :func:`spgemm_hash_host` — Gustavson row-wise hash SpGEMM with the
  symbolic/numeric two-phase structure (``mul_hash_symbolic``/
  ``mul_hash_numeric``, ``mul_hash.rs:66-201``). Dispatches to the C++ native
  runtime when built; the pure-Python fallback uses
  :class:`~sparse_matrix_tpu.utils.linprobe.LinProbeMap` tables and supports
  probe-length instrumentation behind the debug flag.
* :func:`spgemm_esc_host` — vectorized expand-sort-compress in numpy; the
  fast pure-host path and the structural model for the XLA device kernel.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..formats.csr import CsrMatrix, INDEX_DTYPE, OFFSET_DTYPE
from ..utils.debugflags import debug_enabled, record_histogram
from ..utils.linprobe import LinProbeMap

__all__ = [
    "flops_per_row",
    "partition_rows_by_flops",
    "spgemm_hash_host",
    "spgemm_esc_host",
    "expand_products",
]


def flops_per_row(lhs: CsrMatrix, rhs: CsrMatrix) -> np.ndarray:
    """Upper bound on per-row output nnz: the intermediate-product count
    ``row_nz[i] = sum_{k in row i of lhs} nnz(rhs row k)``
    (``mul_hash.rs:40-50``). One native sweep when available (the numpy
    gather + full-nnz cumsum was 7.4 s of a 4096^2 AMG setup); vectorized
    gather + windowed-sum otherwise."""
    from ..native import flops_per_row_native, native_available

    if native_available():
        return flops_per_row_native(lhs, rhs)
    rhs_row_nnz = np.diff(rhs.offsets)
    gathered = rhs_row_nnz[lhs.indices.astype(np.int64)]
    cs = np.zeros(len(gathered) + 1, dtype=np.int64)
    np.cumsum(gathered, out=cs[1:])
    return cs[lhs.offsets[1:]] - cs[lhs.offsets[:-1]]


def partition_rows_by_flops(flop_row: np.ndarray, num_parts: int) -> np.ndarray:
    """Split rows into ``num_parts`` contiguous chunks of ~equal FLOPs.

    Mirrors ``rows_to_threads`` (``mul_hash.rs:51-63``): inclusive prefix scan,
    then boundary ``t`` at ``partition_point(ps <= avg*t) - 1``. Returns
    ``rows_offset`` of length ``num_parts + 1`` with ``rows_offset[0] == 0``
    and ``rows_offset[-1] == rows``.
    """
    rows = len(flop_row)
    ps = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(flop_row, out=ps[1:])
    total = int(ps[-1])
    avg = -(-total // num_parts) if num_parts > 0 else total  # ceil div
    bounds = [0]
    for t in range(1, num_parts):
        bounds.append(int(np.searchsorted(ps, avg * t, side="right")) - 1)
    bounds.append(rows)
    return np.asarray(bounds, dtype=np.int64)


def spgemm_hash_host(
    lhs: CsrMatrix,
    rhs: CsrMatrix,
    *,
    output_sorted: bool = False,
    force_python: bool = False,
) -> CsrMatrix:
    """Gustavson hash SpGEMM on the host.

    Phases as the reference (``mul_hash.rs:13-36``):
      1. plan: per-row FLOP upper bounds (:func:`flops_per_row`);
      2. symbolic: exact per-row output nnz via hash-set row merge;
      3. numeric: exact-allocation accumulate into per-row hash maps, then
         write out (sorted per row iff ``output_sorted``).

    Dispatches to the C++ native runtime when available (the reference's whole
    crate is native; see ``sparse_matrix_tpu/native``).
    """
    if lhs.cols != rhs.rows:
        raise ValueError("LHS cols != RHS rows")
    if not force_python:
        from ..native import native_spgemm_available, spgemm_hash_native

        if native_spgemm_available() and _native_dtype_ok(lhs, rhs):
            return spgemm_hash_native(lhs, rhs, output_sorted=output_sorted)
    return _spgemm_hash_python(lhs, rhs, output_sorted=output_sorted)


def _native_dtype_ok(lhs: CsrMatrix, rhs: CsrMatrix) -> bool:
    return (
        lhs.vals.dtype == rhs.vals.dtype
        and lhs.vals.dtype in (np.dtype(np.float64), np.dtype(np.float32), np.dtype(np.int64))
    )


def _spgemm_hash_python(lhs: CsrMatrix, rhs: CsrMatrix, *, output_sorted: bool) -> CsrMatrix:
    row_nz = flops_per_row(lhs, rhs)  # phase 1: upper bounds
    rows = lhs.rows
    dtype = np.result_type(lhs.vals.dtype, rhs.vals.dtype)
    if debug_enabled():
        # per-phase row_nz dumps, as the reference's `debug` feature
        # (spam_csr/src/mul_hash.rs:18-25: dbg! after plan and symbolic)
        record_histogram(
            "spgemm.plan.row_nz", dict(zip(*map(list, np.unique(row_nz, return_counts=True))))
        )

    # phases 2+3 fused per row: with a Python dict standing in for the probe
    # loop, symbolic and numeric collapse (the dict *is* the exact-nnz count).
    # Under the debug flag we run the linprobe table instead, which records
    # probe-length histograms like the reference's `debug` feature.
    instrument = debug_enabled()
    out_rows = []
    lo_all, li_all, lv_all = lhs.offsets, lhs.indices, lhs.vals
    ro_all, ri_all, rv_all = rhs.offsets, rhs.indices, rhs.vals
    for i in range(rows):
        acc = {}
        if instrument:
            table = LinProbeMap(max(1, int(row_nz[i])), record_probes=True)
        for p in range(int(lo_all[i]), int(lo_all[i + 1])):
            k = int(li_all[p])
            t = lv_all[p]
            for q in range(int(ro_all[k]), int(ro_all[k + 1])):
                j = int(ri_all[q])
                t1 = t * rv_all[q]
                if j in acc:
                    acc[j] = acc[j] + t1
                else:
                    acc[j] = t1
                if instrument:
                    table.upsert(j, t1, lambda a, b: a + b)
        if instrument:
            record_histogram("spgemm.numeric.probe_lengths", table.probe_lengths)
        cols = sorted(acc) if output_sorted else list(acc)
        out_rows.append((cols, [acc[c] for c in cols]))

    nnz_row = np.array([len(c) for c, _ in out_rows], dtype=np.int64)
    if instrument:
        record_histogram(
            "spgemm.symbolic.row_nz",
            dict(zip(*map(list, np.unique(nnz_row, return_counts=True)))),
        )
    offsets = np.zeros(rows + 1, dtype=OFFSET_DTYPE)
    np.cumsum(nnz_row, out=offsets[1:])
    nnz = int(offsets[-1])
    indices = np.empty(nnz, dtype=INDEX_DTYPE)
    vals = np.empty(nnz, dtype=dtype)
    for i, (cols, vv) in enumerate(out_rows):
        lo = int(offsets[i])
        indices[lo : lo + len(cols)] = cols
        vals[lo : lo + len(cols)] = vv
    return CsrMatrix(lhs.rows, rhs.cols, vals, indices, offsets, is_sorted=output_sorted)


def expand_products(
    lhs: CsrMatrix, rhs: CsrMatrix
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Expand all intermediate products of C = A@B as COO triplets.

    For lhs entry p (row r, col k, val a), emits (r, rhs.indices[q], a*rhs.vals[q])
    for q in rhs row k. Fully vectorized; the structural model for the device
    ESC kernel."""
    lhs_rows = lhs.row_ids()
    k_idx = lhs.indices.astype(np.int64)
    rhs_row_nnz = np.diff(rhs.offsets)
    reps = rhs_row_nnz[k_idx]  # products per lhs entry
    total = int(reps.sum())
    src_entry = np.repeat(np.arange(lhs.nnz(), dtype=np.int64), reps)
    # position within each lhs entry's product run
    run_starts = np.zeros(lhs.nnz() + 1, dtype=np.int64)
    np.cumsum(reps, out=run_starts[1:])
    within = np.arange(total, dtype=np.int64) - run_starts[src_entry]
    q = rhs.offsets[k_idx[src_entry]].astype(np.int64) + within
    out_r = lhs_rows[src_entry]
    out_c = rhs.indices.astype(np.int64)[q]
    out_v = lhs.vals[src_entry] * rhs.vals[q]
    return out_r, out_c, out_v


def spgemm_esc_host(
    lhs: CsrMatrix, rhs: CsrMatrix, *, output_sorted: bool = True
) -> CsrMatrix:
    """Expand-sort-compress SpGEMM, vectorized in numpy."""
    if lhs.cols != rhs.rows:
        raise ValueError("LHS cols != RHS rows")
    r, c, v = expand_products(lhs, rhs)
    out = CsrMatrix.from_coo(lhs.rows, rhs.cols, r, c, v)
    out = CsrMatrix(
        lhs.rows, rhs.cols, out.vals, out.indices, out.offsets, is_sorted=output_sorted
    )
    return out
