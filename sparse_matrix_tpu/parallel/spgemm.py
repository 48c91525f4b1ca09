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

__all__ = ["dist_spgemm", "dist_spgemm_2d"]


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


def _expand_products(lhs: CsrMatrix, rhs: CsrMatrix):
    """The full Gustavson product stream: per product, the lhs entry index
    ``src``, the rhs entry index ``q``, and the output row. This is the
    host-side symbolic expansion (reference intermediate-product counting,
    ``spam_csr/src/mul_hash.rs:38-50``, materialized)."""
    rhs_row_nnz = np.diff(rhs.offsets)
    k_idx = lhs.indices.astype(np.int64)
    reps = rhs_row_nnz[k_idx]
    total = int(reps.sum())
    src = np.repeat(np.arange(lhs.nnz(), dtype=np.int64), reps)
    starts = np.zeros(lhs.nnz() + 1, dtype=np.int64)
    np.cumsum(reps, out=starts[1:])
    within = np.arange(total, dtype=np.int64) - starts[src]
    q = rhs.offsets[k_idx[src]].astype(np.int64) + within
    out_r = lhs.row_ids()[src]
    return src, q, out_r


def dist_spgemm_2d(
    lhs: CsrMatrix,
    rhs: CsrMatrix,
    mesh: Mesh,
    *,
    axes: Tuple[str, str] = ("r", "c"),
    dtype=np.float32,
) -> CsrMatrix:
    """C = A @ B over a 2-D (rows x cols) device mesh: owner-computes on
    output *tiles*. Each device (i, j) reduces exactly the products whose
    output lands in row-chunk i x col-range j, so no cross-device merge is
    needed and per-device work shrinks with BOTH mesh axes — the 2-D
    generalization of the reference's 1-D FLOP-balanced row chunking
    (``spam_csr/src/mul_hash.rs:38-64``). Row chunks are FLOP-balanced;
    column ranges are product-count-balanced (both computed from the exact
    product histogram). Communication: none beyond the initial shard
    placement — the plan arrays are sharded over both axes; operand value
    tables ride along replicated (they are the small, reused part)."""
    if lhs.cols != rhs.rows:
        raise ValueError("LHS cols != RHS rows")
    from ..ops.device_sorted import _run_reduce

    r_axis, c_axis = axes
    shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    nr, nc = shape[r_axis], shape[c_axis]
    rows = lhs.rows

    src, q, out_r = _expand_products(lhs, rhs)
    total = len(src)
    if total == 0:
        return CsrMatrix.new(lhs.rows, rhs.cols, dtype=dtype)
    out_c = rhs.indices.astype(np.int64)[q]

    # row chunks FLOP-balanced (as 1-D dist_spgemm / the reference)
    rbounds = partition_rows_by_flops(flops_per_row(lhs, rhs), nr)
    rdev = np.searchsorted(rbounds[1:-1], out_r, side="right")
    # column ranges balanced by exact product count
    col_hist = np.bincount(out_c, minlength=rhs.cols)
    csum = np.cumsum(col_hist)
    targets = (np.arange(1, nc) * total) // nc
    cbounds = np.searchsorted(csum, targets, side="left")  # split cols
    cdev = np.searchsorted(cbounds, out_c, side="right")

    cell = rdev * nc + cdev
    order = np.argsort(cell, kind="stable")
    cell_s = cell[order]
    counts = np.bincount(cell_s, minlength=nr * nc)
    maxp = max(1, int(counts.max()))
    offs = np.zeros(nr * nc + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])

    srcs = np.zeros((nr, nc, maxp), np.int32)
    qs = np.zeros((nr, nc, maxp), np.int32)
    rcs = np.full((nr, nc, maxp), rows, np.int32)
    valid = np.zeros((nr, nc, maxp), bool)
    for d in range(nr * nc):
        lo, hi = int(offs[d]), int(offs[d + 1])
        n = hi - lo
        sel = order[lo:hi]
        i, j = divmod(d, nc)
        srcs[i, j, :n] = src[sel]
        qs[i, j, :n] = q[sel]
        rcs[i, j, :n] = out_r[sel]
        valid[i, j, :n] = True

    lhs_vals = jnp.asarray(lhs.vals.astype(dtype))
    rhs_vals = jnp.asarray(rhs.vals.astype(dtype))
    rhs_idx = jnp.asarray(rhs.indices.astype(np.int32))

    dev = NamedSharding(mesh, P(r_axis, c_axis, None))
    srcs_j = jax.device_put(jnp.asarray(srcs), dev)
    qs_j = jax.device_put(jnp.asarray(qs), dev)
    rcs_j = jax.device_put(jnp.asarray(rcs), dev)
    valid_j = jax.device_put(jnp.asarray(valid), dev)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),
            P(r_axis, c_axis, None), P(r_axis, c_axis, None),
            P(r_axis, c_axis, None), P(r_axis, c_axis, None),
        ),
        out_specs=(
            P(r_axis, c_axis, None), P(r_axis, c_axis, None),
            P(r_axis, c_axis, None), P(r_axis, c_axis),
        ),
    )
    def _numeric(lv, rv, ri, s, qq, rc, ok):
        s, qq, rc, ok = s[0, 0], qq[0, 0], rc[0, 0], ok[0, 0]
        o_c = ri[qq]
        o_v = jnp.where(ok, lv[s] * rv[qq], 0.0).astype(lv.dtype)
        o_r = jnp.where(ok, rc, rows).astype(jnp.int32)
        r_s, c_s, v_s = jax.lax.sort((o_r, o_c, o_v), num_keys=2)
        row_o, col_o, val_o, nnz = _run_reduce(r_s, c_s, v_s, rows)
        return row_o[None, None], col_o[None, None], val_o[None, None], nnz[None, None]

    row_o, col_o, val_o, nnz = _numeric(
        lhs_vals, rhs_vals, rhs_idx, srcs_j, qs_j, rcs_j, valid_j
    )
    row_h, col_h, val_h, nnz_h = (np.asarray(a) for a in (row_o, col_o, val_o, nnz))
    rows_l, cols_l, vals_l = [], [], []
    for i in range(nr):
        for j in range(nc):
            n = int(nnz_h[i, j])
            keep = row_h[i, j, :n] < rows
            rows_l.append(row_h[i, j, :n][keep])
            cols_l.append(col_h[i, j, :n][keep])
            vals_l.append(val_h[i, j, :n][keep])
    r = np.concatenate(rows_l)
    c = np.concatenate(cols_l)
    v = np.concatenate(vals_l)
    # cells within a row chunk are disjoint column ranges: lexsort once
    return CsrMatrix.from_coo(
        rows, rhs.cols, r.astype(np.int64), c.astype(np.int64), v,
        sum_duplicates=False,
    )
