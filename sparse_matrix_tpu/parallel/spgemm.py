"""Distributed SpGEMM over a device mesh.

Row-parallel Gustavson at mesh scale: the direct descendant of the
reference's ``rows_to_threads`` FLOP-balanced row chunking
(``spam_csr/src/mul_hash.rs:38-64``) — but chunks go to *devices*, and each
device runs the sort-based ESC numeric phase (``ops.device_sorted``) on its
row block with the B operand replicated. Per-device expansion plans are built
on host (the symbolic phase), padded to the max device workload so the
``shard_map`` is a single SPMD program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.csr import CsrMatrix, INDEX_DTYPE, OFFSET_DTYPE
from ..ops.spgemm_host import flops_per_row, partition_rows_by_flops

__all__ = ["dist_spgemm"]


def _shard_plans(lhs: CsrMatrix, rhs: CsrMatrix, ndev: int):
    """FLOP-balanced row partition + per-device padded expansion plans."""
    flops = flops_per_row(lhs, rhs)
    bounds = partition_rows_by_flops(flops, ndev)
    rhs_row_nnz = np.diff(rhs.offsets)
    plans = []
    max_products = 1
    for d in range(ndev):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        elo, ehi = int(lhs.offsets[lo]), int(lhs.offsets[hi])
        k_idx = lhs.indices[elo:ehi].astype(np.int64)
        reps = rhs_row_nnz[k_idx]
        total = int(reps.sum())
        src = np.repeat(np.arange(elo, ehi, dtype=np.int64), reps)
        starts = np.zeros(len(k_idx) + 1, dtype=np.int64)
        np.cumsum(reps, out=starts[1:])
        within = np.arange(total, dtype=np.int64) - starts[src - elo]
        q = rhs.offsets[lhs.indices[src].astype(np.int64)].astype(np.int64) + within
        out_r = lhs.row_ids()[src]
        plans.append((src, q, out_r))
        max_products = max(max_products, total)
    # pad each device's plan to max_products with sentinel products
    # (src/q -> entry 0, out_r -> rows, value masked to 0 on device)
    srcs = np.zeros((ndev, max_products), np.int32)
    qs = np.zeros((ndev, max_products), np.int32)
    rcs = np.full((ndev, max_products), lhs.rows, np.int32)
    valid = np.zeros((ndev, max_products), bool)
    for d, (src, q, out_r) in enumerate(plans):
        n = len(src)
        srcs[d, :n] = src
        qs[d, :n] = q
        rcs[d, :n] = out_r
        valid[d, :n] = True
    return srcs, qs, rcs, valid


def dist_spgemm(lhs: CsrMatrix, rhs: CsrMatrix, mesh: Mesh, *, axis: str = "rows", dtype=np.float32) -> CsrMatrix:
    """C = A @ B with A's rows FLOP-balanced across the mesh and B
    replicated; each device sorts+reduces its own products (ESC)."""
    if lhs.cols != rhs.rows:
        raise ValueError("LHS cols != RHS rows")
    from ..ops.device_sorted import _run_reduce

    if lhs.nnz() == 0 or rhs.nnz() == 0 or int(flops_per_row(lhs, rhs).sum()) == 0:
        return CsrMatrix.new(lhs.rows, rhs.cols, dtype=dtype)

    ndev = mesh.devices.size
    srcs, qs, rcs, valid = _shard_plans(lhs, rhs, ndev)
    rows = lhs.rows

    lhs_vals = jnp.asarray(lhs.vals.astype(dtype))
    rhs_vals = jnp.asarray(rhs.vals.astype(dtype))
    rhs_idx = jnp.asarray(rhs.indices.astype(np.int32))

    dev = NamedSharding(mesh, P(axis, None))
    srcs_j = jax.device_put(jnp.asarray(srcs), dev)
    qs_j = jax.device_put(jnp.asarray(qs), dev)
    rcs_j = jax.device_put(jnp.asarray(rcs), dev)
    valid_j = jax.device_put(jnp.asarray(valid), dev)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis)),
    )
    def _numeric(lv, rv, ri, src, q, rc, ok):
        src, q, rc, ok = src[0], q[0], rc[0], ok[0]
        out_c = ri[q]
        out_v = jnp.where(ok, lv[src] * rv[q], 0.0).astype(lv.dtype)
        out_r = jnp.where(ok, rc, rows).astype(jnp.int32)
        r_s, c_s, v_s = jax.lax.sort((out_r, out_c, out_v), num_keys=2)
        row_o, col_o, val_o, nnz = _run_reduce(r_s, c_s, v_s, rows)
        return row_o[None], col_o[None], val_o[None], nnz[None]

    row_o, col_o, val_o, nnz = _numeric(
        lhs_vals, rhs_vals, rhs_idx, srcs_j, qs_j, rcs_j, valid_j
    )
    # assemble on host: concatenate per-device results, trimmed
    rows_l, cols_l, vals_l = [], [], []
    row_h, col_h, val_h, nnz_h = (np.asarray(a) for a in (row_o, col_o, val_o, nnz))
    for d in range(ndev):
        n = int(nnz_h[d])
        # sentinel rows (== rows) mark merged padding; drop them
        keep = row_h[d, :n] < rows
        rows_l.append(row_h[d, :n][keep])
        cols_l.append(col_h[d, :n][keep])
        vals_l.append(val_h[d, :n][keep])
    r = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int64)
    c = np.concatenate(cols_l) if cols_l else np.zeros(0, np.int64)
    v = np.concatenate(vals_l) if vals_l else np.zeros(0, dtype)
    offsets = np.zeros(rows + 1, dtype=OFFSET_DTYPE)
    np.add.at(offsets, r.astype(np.int64) + 1, 1)
    np.cumsum(offsets, out=offsets)
    return CsrMatrix(
        rows, rhs.cols, v, c.astype(INDEX_DTYPE), offsets, is_sorted=True
    )
