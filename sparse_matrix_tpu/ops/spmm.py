"""SpMM: sparse matrix times dense multi-vector block (A @ X).

New scope beyond the reference (which is mat-mat/mat-vec-free): multi-RHS
is where the MXU truly pays — every gathered operand is reused across the
``F`` right-hand sides.

* :func:`spmm_dia` — banded operator: static shifted slices of X, one fused
  elementwise pass per band, no indices.
* :func:`spmm_bcsr` — block-sparse operator: one 128x128 MXU matmul per
  stored block against the matching X block row, revisited-output
  accumulation (Pallas; XLA einsum+scatter reference on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bcsr import BsrMatrix
from ..formats.dia import DiaMatrix

__all__ = [
    "spmm_dia",
    "spmm_bcsr",
    "spmm_aligned",
    "spmm_aligned_packed",
    "aligned_matvec_multi",
    "spmm_bell",
    "bell_spmm_viable",
    "spmm_lanepack",
    "spmm_lanepack_packed",
    "lanepack_matvec_multi",
    "spmm_ell_xla",
    "pack_rhs",
    "unpack_rhs",
]


@functools.partial(jax.jit, static_argnames=("offsets", "rows"))
def _spmm_dia_jit(data, x, *, offsets: tuple, rows: int):
    lo = -min(0, min(offsets))
    hi = max(0, max(offsets)) + max(rows, x.shape[0])
    xpad = jnp.zeros((lo + hi, x.shape[1]), x.dtype).at[lo : lo + x.shape[0]].set(x)
    y = jnp.zeros((rows, x.shape[1]), x.dtype)
    for b, off in enumerate(offsets):
        y = y + data[b][:, None] * jax.lax.dynamic_slice(
            xpad, (lo + off, 0), (rows, x.shape[1])
        )
    return y


def spmm_dia(m: DiaMatrix, x):
    """Y = A @ X for a DIA operator; X is (cols, F)."""
    x = jnp.asarray(x)
    return _spmm_dia_jit(jnp.asarray(m.data), x, offsets=m.offsets, rows=m.rows)


def _make_bcsr_kernel(precision):
    from jax.experimental import pallas as pl

    def kernel(brow_ref, bcol_ref, a_ref, x_ref, y_ref):
        i = pl.program_id(0)
        first = jnp.logical_or(i == 0, brow_ref[i] != brow_ref[jnp.maximum(i - 1, 0)])
        prod = jnp.dot(
            a_ref[0], x_ref[0], preferred_element_type=y_ref.dtype, precision=precision
        )
        prev = jnp.where(first, jnp.zeros_like(y_ref[0]), y_ref[0])
        y_ref[0] = prev + prod

    return kernel


@functools.partial(jax.jit, static_argnames=("brows", "bs", "interpret", "precision"))
def _spmm_bcsr_jit(a_blocks, brow, bcol, x3, *, brows, bs, interpret, precision):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f = x3.shape[2]
    if interpret:
        prods = jnp.einsum("pij,pjk->pik", a_blocks, x3[bcol], precision=precision)
        return jnp.zeros((brows, bs, f), a_blocks.dtype).at[brow].add(prods)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(a_blocks.shape[0],),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((1, bs, f), lambda i, br, bc: (bc[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, f), lambda i, br, bc: (br[i], 0, 0)),
    )
    return pl.pallas_call(
        _make_bcsr_kernel(precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((brows, bs, f), a_blocks.dtype),
    )(brow, bcol, a_blocks, x3)


# ---------------------------------------------------------------------------
# Aligned multi-RHS SpMM (general unstructured-with-locality operators)
# ---------------------------------------------------------------------------
#
# The aligned SpMV kernel's dominant per-slab cost is the 8 dynamic x-window
# loads (docs/PERF.md round-2 ablation: ~8.5 of 18.5 ns); with K right-hand
# sides those loads amortize K-fold while the gather+multiply scales. The
# RHS block lives in a *packed* layout (c128+1, K, 128) — window-major, K in
# the sublane dimension, lanes last — so the kernel's window loads are
# (1, K, 128) dynamic slices on the leading axis and the within-row lane
# gather stays the known-fast 2-D take_along_axis(axis=1) shape. Solvers
# keep every vector in this layout (see cg_solve_multi's packed mode): the
# (n, K) <-> packed relayout happens once per solve, not per apply.

LANES = 128
SUBLANES = 8


def _make_aligned_spmm_kernel(b: int, k: int, nbuf: int = 2):
    from jax.experimental import pallas as pl

    def kernel(rb_a_ref, rb_b_ref, split_ref, col_off_ref, x_ref, vals_ref, lane_ref, y_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        base = i * b * SUBLANES
        xw = jnp.concatenate(
            [x_ref[pl.ds(col_off_ref[base + j], 1), :, :] for j in range(b * SUBLANES)],
            axis=0,
        )  # (b*8, K, 128)
        lane = lane_ref[...].reshape(b * SUBLANES, 1, LANES).astype(jnp.int32)
        idx2 = jnp.broadcast_to(lane, (b * SUBLANES, k, LANES)).reshape(
            b * SUBLANES * k, LANES
        )
        g = jnp.take_along_axis(xw.reshape(b * SUBLANES * k, LANES), idx2, axis=1)
        p = vals_ref[...].reshape(b * SUBLANES, 1, LANES) * g.reshape(
            b * SUBLANES, k, LANES
        )
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
        for bb in range(b):
            c8 = p[bb * SUBLANES : (bb + 1) * SUBLANES]  # (8, K, 128)
            total = jnp.sum(c8, axis=0)  # (K, 128)
            sp = split_ref[i * b + bb]
            # f32 mask (2-D, broadcast over K): Mosaic can't 3-D-broadcast i1
            maskf = jnp.where(sub_iota < sp, 1.0, 0.0).astype(c8.dtype)
            pa = jnp.sum(c8 * maskf[:, None, :], axis=0)
            buf = bb % nbuf
            y_ref[buf, pl.ds(rb_a_ref[i * b + bb], 1), :, :] += pa[None]
            y_ref[buf, pl.ds(rb_b_ref[i * b + bb], 1), :, :] += (total - pa)[None]

    return kernel


@functools.partial(jax.jit, static_argnames=("rows", "b", "k", "nbuf", "interpret"))
def _spmm_aligned_jit(arrs, x3, *, rows: int, b: int, k: int, nbuf: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r128 = -(-rows // LANES)
    if interpret:
        return _aligned_spmm_reference(arrs, x3, rows=rows)

    num_slabs = arrs["vals"].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_slabs // b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((b, SUBLANES, LANES), lambda i, *refs: (i, 0, 0))] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        _make_aligned_spmm_kernel(b, k, nbuf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbuf, r128, k, LANES), x3.dtype),
        # X + nbuf Y planes VMEM-resident: 16 MB default scoped limit is
        # too small near the raised operator split caps (see ops/spmv.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(
        arrs["rb_a"],
        arrs["rb_b"],
        arrs["split"],
        arrs["col_off"],
        x3,
        arrs["vals"],
        arrs["lane"],
    )
    y = jnp.sum(y, axis=0)
    return jnp.where(arrs["rb_mask"][:, None, None] > 0, y, 0.0)


def _aligned_spmm_reference(arrs, x3, *, rows: int):
    """Pure-XLA evaluation (CPU path + semantics oracle), packed layout."""
    s8 = arrs["vals"].shape[0] * SUBLANES
    k = x3.shape[1]
    vals = arrs["vals"].reshape(s8, 1, LANES)
    lane = arrs["lane"].reshape(s8, 1, LANES).astype(jnp.int32)
    xw = x3[arrs["col_off"].astype(jnp.int32)]  # (s8, K, 128)
    idx = jnp.broadcast_to(lane, (s8, k, LANES))
    p = vals * jnp.take_along_axis(xw, idx, axis=2)
    r128 = arrs["rb_mask"].shape[0]
    y = jnp.zeros((r128, k, LANES), vals.dtype).at[arrs["chunk_rb"]].add(p)
    return jnp.where(arrs["rb_mask"][:, None, None] > 0, y, 0.0)


def pack_rhs(x, cols: int, guard: int = 1):
    """(cols, K) -> packed (c128+guard, K, 128). The one relayout per
    solve. ``guard`` zero windows let kernel window slices of width
    ``guard`` never run off the end (aligned uses 1; lanepack uses kw)."""
    x = jnp.asarray(x)
    k = x.shape[1]
    c128 = -(-cols // LANES)
    xpad = jnp.zeros((c128 * LANES, k), x.dtype).at[: x.shape[0]].set(x)
    x3 = jnp.transpose(xpad.reshape(c128, LANES, k), (0, 2, 1))
    return jnp.concatenate([x3, jnp.zeros((guard, k, LANES), x.dtype)], axis=0)


def unpack_rhs(y3, rows: int):
    """Packed (r128[+pad], K, 128) -> (rows, K)."""
    r128, k = y3.shape[0], y3.shape[1]
    return jnp.transpose(y3, (0, 2, 1)).reshape(r128 * LANES, k)[:rows]


def _pick_b_spmm(k: int) -> int:
    # per-step gather scratch is ~3 arrays of (b*8, K, 128) f32; keep it a
    # few MB so the pipeline double-buffers comfortably
    return max(8, min(64, 512 // max(1, k)))


# packed VMEM budget: x3 + nbuf*y3 must stay well under the ~128 MB VMEM
_VMEM_SPMM_LIMIT = 24_000_000  # floats


def spmm_aligned_packed(plan, x3, *, device_arrays=None, nbuf: int = 2):
    """Y = A @ X on an :class:`~..formats.aligned.AlignedPlan`, packed
    layout in AND out: ``x3`` is (c128+1, K, 128), the result is
    (r128, K, 128). Iterative multi-RHS solvers stay in this layout so the
    kernel's K-fold x-window-load amortization is free of per-apply
    relayouts. ``plan.spill`` is applied per-column via the general
    LanePack kernel (spills are small by construction)."""
    from .spmv import _interpret, _spmv_lanepack_jit, aligned_device_arrays, lanepack_device_arrays

    k = int(x3.shape[1])
    r128 = -(-plan.rows // LANES)
    c128 = -(-plan.cols // LANES)
    if (c128 + 1 + nbuf * r128) * k * LANES > _VMEM_SPMM_LIMIT:
        raise ValueError(
            f"aligned SpMM keeps X and Y VMEM-resident; (rows={plan.rows}, "
            f"cols={plan.cols}, K={k}) exceeds the budget — shard over a mesh "
            "or split K"
        )
    arrs = device_arrays
    if arrs is None or arrs.get("b") != _pick_b_spmm(k):
        arrs = aligned_device_arrays(plan, b=_pick_b_spmm(k))
    interp = _interpret()

    def one(seg):
        return _spmm_aligned_jit(
            {kk: v for kk, v in seg.items() if kk not in ("b", "spill")},
            x3,
            rows=plan.rows,
            b=arrs["b"],
            k=k,
            nbuf=nbuf,
            interpret=interp,
        )

    if "segments" in arrs:
        y = one(arrs["segments"][0])
        for seg in arrs["segments"][1:]:
            y = y + one(seg)
    else:
        y = one(arrs)
    if plan.spill is not None:
        sp_arrs = arrs.get("spill")
        if sp_arrs is None:
            sp_arrs = lanepack_device_arrays(plan.spill)
        x2 = unpack_rhs(x3, plan.cols)
        cols_y = []
        for kk in range(k):
            cols_y.append(
                _spmv_lanepack_jit(
                    {a: v for a, v in sp_arrs.items() if a != "b"},
                    x2[:, kk],
                    rows=plan.rows,
                    cols=plan.cols,
                    kw=plan.spill.kw,
                    b=sp_arrs["b"],
                    interpret=interp,
                    pack=plan.spill.pack,
                )
            )
        y = y + pack_rhs(jnp.stack(cols_y, axis=1), plan.rows)[:r128]
    return y


def aligned_matvec_multi(plan, k: int, *, nbuf: int = 2):
    """Packed-layout multi-RHS matvec closure for a SQUARE aligned plan:
    (c128+1, K, 128) -> (c128+1, K, 128) (the guard row re-appended), ready
    for ``cg_solve_multi(..., rhs_axis=1)``. Device arrays are built once
    and captured."""
    from .spmv import aligned_device_arrays

    if plan.rows != plan.cols:
        raise ValueError("packed multi-RHS matvec needs a square operator")
    arrs = aligned_device_arrays(plan, b=_pick_b_spmm(k))

    def mv(x3):
        y = spmm_aligned_packed(plan, x3, device_arrays=arrs, nbuf=nbuf)
        guard = jnp.zeros((x3.shape[0] - y.shape[0], x3.shape[1], LANES), y.dtype)
        return jnp.concatenate([y, guard], axis=0)

    return mv


def spmm_aligned(plan, x, *, device_arrays=None):
    """Y = A @ X (X is (cols, K)) via the aligned kernel; convenience
    wrapper over :func:`spmm_aligned_packed` paying one relayout each way.
    """
    x3 = pack_rhs(x, plan.cols)
    y3 = spmm_aligned_packed(plan, x3, device_arrays=device_arrays)
    return unpack_rhs(y3, plan.rows)


# ---------------------------------------------------------------------------
# LanePack multi-RHS SpMM (the GENERAL path — no locality assumption)
# ---------------------------------------------------------------------------
#
# Same packed-RHS idea as the aligned SpMM, applied to the general LanePack
# kernel (ops/spmv.py::_make_lanepack_kernel): every per-chunk operand
# stream (vals/lane/ends/starts, the dominant 8 B/slot of the general
# path) and every dynamic x-window load is issued ONCE and reused across
# all K right-hand sides; only the lane gather, the MXU prefix sum (batched
# into one (chunks*K, 128) triangular matmul), and the boundary gathers
# scale with K. This removes SpmvOperator.matmat's per-column SpMV loop on
# lanepack/hybrid operators (the block-AMG V-cycle's P^T apply).


def _make_lanepack_spmm_kernel(b: int, kw: int, k: int, pack: str, nbuf: int):
    from jax.experimental import pallas as pl

    from .spmv import _lane_cumsum_mxu

    def kernel(rb_a_ref, rb_b_ref, split_ref, col_off_ref, x_ref, vals_ref, lane_ref, ends_ref, starts_ref, y_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        base = i * b * SUBLANES
        n = b * SUBLANES
        # one (kw, K, 128) window load per chunk serves all K columns
        xw = jnp.concatenate(
            [x_ref[pl.ds(col_off_ref[base + j], kw), :, :] for j in range(n)],
            axis=0,
        ).reshape(n, kw, k, LANES)

        lane = lane_ref[...].reshape(n, 1, LANES).astype(jnp.int32)
        v = vals_ref[...].reshape(n, 1, LANES)
        if kw == 1:
            idx2 = jnp.broadcast_to(lane, (n, k, LANES)).reshape(n * k, LANES)
            xg = jnp.take_along_axis(
                xw[:, 0].reshape(n * k, LANES), idx2, axis=1
            ).reshape(n, k, LANES)
        else:
            sub = jax.lax.shift_right_logical(lane, 7)
            l = jax.lax.bitwise_and(lane, 127)
            idx2 = jnp.broadcast_to(l, (n, k, LANES)).reshape(n * k, LANES)
            xg = jnp.zeros((n, k, LANES), v.dtype)
            for w in range(kw):
                g = jnp.take_along_axis(
                    xw[:, w].reshape(n * k, LANES), idx2, axis=1
                ).reshape(n, k, LANES)
                # f32 mask (Mosaic can't 3-D-broadcast i1)
                mw = jnp.where(sub == w, 1.0, 0.0).astype(v.dtype)
                xg = xg + g * mw
        p = v * xg  # (n, K, 128)

        # per-chunk inclusive lane scan, all K batched into one MXU matmul
        c = _lane_cumsum_mxu(p.reshape(n * k, LANES))
        e2 = jnp.broadcast_to(
            ends_ref[...].reshape(n, 1, LANES).astype(jnp.int32), (n, k, LANES)
        ).reshape(n * k, LANES)
        s2 = jnp.broadcast_to(
            starts_ref[...].reshape(n, 1, LANES).astype(jnp.int32), (n, k, LANES)
        ).reshape(n * k, LANES)
        g_end = jnp.take_along_axis(c, e2, axis=1)
        g_start = jnp.where(
            s2 < 0, 0.0, jnp.take_along_axis(c, jnp.maximum(s2, 0), axis=1)
        )
        contrib = (g_end - g_start).reshape(n, k, LANES)

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
        for bb in range(b):
            c8 = contrib[bb * SUBLANES : (bb + 1) * SUBLANES]  # (8, K, 128)
            total = jnp.sum(c8, axis=0)  # (K, 128)
            buf = bb % nbuf
            if pack == "per_rb":
                # single-target slabs: one unmasked accumulate
                y_ref[buf, pl.ds(rb_a_ref[i * b + bb], 1)] += total[None]
            else:
                sp = split_ref[i * b + bb]
                maskf = jnp.where(sub_iota < sp, 1.0, 0.0).astype(c8.dtype)
                pa = jnp.sum(c8 * maskf[:, None, :], axis=0)
                y_ref[buf, pl.ds(rb_a_ref[i * b + bb], 1)] += pa[None]
                y_ref[buf, pl.ds(rb_b_ref[i * b + bb], 1)] += (total - pa)[None]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rows", "kw", "b", "k", "nbuf", "interpret", "pack")
)
def _spmm_lanepack_jit(arrs, x3, *, rows, kw, b, k, nbuf, interpret, pack):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r128 = -(-rows // LANES)
    if interpret:
        return _lanepack_spmm_reference(arrs, x3, rows=rows, kw=kw)

    num_slabs = arrs["vals"].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_slabs // b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((b, SUBLANES, LANES), lambda i, *refs: (i, 0, 0))] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        _make_lanepack_spmm_kernel(b, kw, k, pack, nbuf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbuf, r128, k, LANES), x3.dtype),
        # see the aligned SpMM call's scoped-vmem note
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(
        arrs["rb_a"],
        arrs["rb_b"],
        arrs["split"],
        arrs["col_off"],
        x3,
        arrs["vals"],
        arrs["lane"],
        arrs["ends"],
        arrs["starts"],
    )
    y = jnp.sum(y, axis=0)
    return jnp.where(arrs["rb_mask"][:, None, None] > 0, y, 0.0)


def _lanepack_spmm_reference(arrs, x3, *, rows: int, kw: int):
    """Pure-XLA evaluation (CPU path + semantics oracle), packed layout."""
    s8 = arrs["vals"].shape[0] * SUBLANES
    k = x3.shape[1]
    vals = arrs["vals"].reshape(s8, 1, LANES)
    lane = arrs["lane"].reshape(s8, 1, LANES).astype(jnp.int32)
    ends = arrs["ends"].reshape(s8, 1, LANES).astype(jnp.int32)
    starts = arrs["starts"].reshape(s8, 1, LANES).astype(jnp.int32)
    co = arrs["col_off"].astype(jnp.int32)

    win = x3[co[:, None] + jnp.arange(kw)[None, :]]  # (s8, kw, K, 128)
    win = jnp.transpose(win, (0, 2, 1, 3)).reshape(s8, k, kw * LANES)
    xg = jnp.take_along_axis(win, jnp.broadcast_to(lane, (s8, k, LANES)), axis=2)
    p = vals * xg
    c = jnp.cumsum(p, axis=2)
    g_end = jnp.take_along_axis(c, jnp.broadcast_to(ends, (s8, k, LANES)), axis=2)
    s3 = jnp.broadcast_to(starts, (s8, k, LANES))
    g_start = jnp.where(
        s3 < 0, 0.0, jnp.take_along_axis(c, jnp.maximum(s3, 0), axis=2)
    )
    contrib = g_end - g_start  # (s8, K, 128)
    r128 = arrs["rb_mask"].shape[0]
    y = jnp.zeros((r128, k, LANES), vals.dtype).at[arrs["chunk_rb"]].add(contrib)
    return jnp.where(arrs["rb_mask"][:, None, None] > 0, y, 0.0)


def _pick_b_lp_spmm(k: int, kw: int) -> int:
    # per-step scratch is ~5 arrays of (b*8, K(pad 8), 128) f32 plus the
    # (b*8*kw, K, 128) window concat; the Mosaic scoped-vmem stack limit is
    # 16 MB (hit at b=64, kw=2, K=5 — experiments/tpu_tests_r2c.out)
    return max(4, min(64, 256 // max(1, k * kw)))


def spmm_lanepack_packed(plan, x3, *, device_arrays=None, nbuf: int = 2):
    """Y = A @ X on a :class:`~..formats.lanepack.LanePackPlan`, packed
    layout in AND out: ``x3`` is (c128+kw, K, 128) (see :func:`pack_rhs`
    with ``guard=plan.kw``), the result is (r128, K, 128)."""
    from .spmv import _VMEM_X_LIMIT, _interpret, lanepack_device_arrays

    k = int(x3.shape[1])
    r128 = -(-plan.rows // LANES)
    c128 = -(-plan.cols // LANES)
    if plan.num_slabs * 8 * 4 > 900_000:
        raise ValueError(
            f"LanePack plan has {plan.num_slabs} slabs; its scalar-prefetch "
            "arrays exceed the 1 MB SMEM budget — use spmm_ell_xla"
        )
    if (c128 + plan.kw + nbuf * r128) * k * LANES > _VMEM_X_LIMIT:
        raise ValueError(
            f"lanepack SpMM keeps X and Y VMEM-resident; (rows={plan.rows}, "
            f"cols={plan.cols}, K={k}) exceeds the budget — split K or use "
            "spmm_ell_xla"
        )
    arrs = device_arrays
    if arrs is None or arrs.get("b") != _pick_b_lp_spmm(k, plan.kw):
        arrs = lanepack_device_arrays(plan, b=_pick_b_lp_spmm(k, plan.kw))
    return _spmm_lanepack_jit(
        {kk: v for kk, v in arrs.items() if kk != "b"},
        x3,
        rows=plan.rows,
        kw=plan.kw,
        b=arrs["b"],
        k=k,
        nbuf=nbuf,
        interpret=_interpret(),
        pack=plan.pack,
    )


def lanepack_matvec_multi(plan, k: int, *, nbuf: int = 2):
    """Packed-layout multi-RHS matvec closure for a SQUARE lanepack plan
    (general path analog of :func:`aligned_matvec_multi`), ready for
    ``cg_solve_multi(..., rhs_axis=1)``."""
    from .spmv import lanepack_device_arrays

    if plan.rows != plan.cols:
        raise ValueError("packed multi-RHS matvec needs a square operator")
    arrs = lanepack_device_arrays(plan, b=_pick_b_lp_spmm(k, plan.kw))

    def mv(x3):
        y = spmm_lanepack_packed(plan, x3, device_arrays=arrs, nbuf=nbuf)
        guard = jnp.zeros((x3.shape[0] - y.shape[0], x3.shape[1], LANES), y.dtype)
        return jnp.concatenate([y, guard], axis=0)

    return mv


# Kernel-vs-loop dispatch (measured, experiments/spmm_lp_bsweep.out +
# spmm_lp_crossover.out): the packed kernel's per-slab cost at K < 8 is
# ~4-5x the single-SpMV slab cost (the (n, K, 128) <-> (n*K, 128)
# relayouts around the batched cumsum), but a per-column loop pays K
# kernel launches. So the loop only wins on LARGE plans at small K
# (Poisson 512^2, ~1k slabs: K=4 loop is 1.37x the kernel), while small
# plans (AMG level operators) and any K >= 8 (natural sublane tiling)
# belong to the kernel — the K-only rule inverted the block-AMG win.
_LP_SPMM_MIN_K = 8
_LP_SPMM_LOOP_MIN_SLABS = 512


def _lp_spmm_use_kernel(plan, k: int) -> bool:
    return k >= _LP_SPMM_MIN_K or plan.num_slabs < _LP_SPMM_LOOP_MIN_SLABS


def spmm_lanepack(plan, x, *, device_arrays=None, nbuf: int = 2):
    """Y = A @ X (X is (cols, K)) via the general LanePack path.

    Packed multi-RHS kernel when K >= 8 or the plan is small; per-column
    :func:`~.spmv.spmv_lanepack` loop for small K on large plans (see the
    measured dispatch note above)."""
    x = jnp.asarray(x, dtype=plan.dtype)
    if not _lp_spmm_use_kernel(plan, int(x.shape[1])):
        from .spmv import lanepack_device_arrays, spmv_lanepack

        arrs = lanepack_device_arrays(plan)  # SpMV-shaped step size, built once
        return jnp.stack(
            [
                spmv_lanepack(plan, x[:, k], device_arrays=arrs)
                for k in range(x.shape[1])
            ],
            axis=1,
        )
    k = int(x.shape[1])
    # pad K >= 8 to sublane multiples (natural (8, 128) reshape tiles);
    # small-K kernel calls on small plans keep their exact K — padding to
    # 8 would quadruple their compute for launch-bound work
    if k >= _LP_SPMM_MIN_K and k % 8:
        kpad = -(-k // 8) * 8
        x = jnp.concatenate([x, jnp.zeros((x.shape[0], kpad - k), x.dtype)], axis=1)
    x3 = pack_rhs(x, plan.cols, guard=plan.kw)
    y3 = spmm_lanepack_packed(plan, x3, device_arrays=device_arrays, nbuf=nbuf)
    return unpack_rhs(y3, plan.rows)[:, :k]


def spmm_ell_xla(ev, ec, x):
    """Y = A @ X for a padded-ELL operator (pure XLA, any backend/sharding;
    the matmat fallback that never loops per column). ``ev``/``ec`` as in
    :func:`~.spmv.spmv_ell_xla`; gathered X rows are reused across K."""
    ev = jnp.asarray(ev)
    ec = jnp.asarray(ec)
    x = jnp.asarray(x)
    return jnp.einsum("rw,rwk->rk", ev, x[ec])


def spmm_bcsr(m: BsrMatrix, x, *, precision=None):
    """Y = A @ X for a BCSR operator; X is (cols, F). F is padded to a
    multiple of 128 internally."""
    precision = precision if precision is not None else jax.lax.Precision.HIGHEST
    x = np.asarray(x, dtype=m.blocks.dtype)
    f = x.shape[1]
    fpad = max(128, -(-f // 128) * 128)
    cols_pad = m.bcols * m.bs
    x_full = np.zeros((cols_pad, fpad), dtype=x.dtype)
    x_full[: x.shape[0], :f] = x
    x3 = jnp.asarray(x_full.reshape(m.bcols, m.bs, fpad))
    brow = jnp.asarray(m.block_rows_expanded().astype(np.int32))
    bcol = jnp.asarray(m.block_cols.astype(np.int32))
    # block rows with no blocks produce unvisited output blocks -> mask
    has = np.zeros(m.brows, dtype=bool)
    has[np.asarray(m.block_rows_expanded())] = True
    y3 = _spmm_bcsr_jit(
        jnp.asarray(m.blocks),
        brow,
        bcol,
        x3,
        brows=m.brows,
        bs=m.bs,
        interpret=jax.default_backend() != "tpu",
        precision=precision,
    )
    y3 = jnp.where(jnp.asarray(has)[:, None, None], y3, 0.0)
    return y3.reshape(m.brows * m.bs, fpad)[: m.rows, :f]

# ---------------------------------------------------------------------------
# BELL SpMM: the streaming general-path family (formats/bell.py) with K
# right-hand sides. The slot planes (the HBM-dominant stream: 5 B/slot)
# are read ONCE for all K columns; x lives VMEM-resident in the packed
# (rows_tot, K, 128) layout and each (layer, half) costs one (BR, K, 128)
# dynamic slice + one batched (BR*K, 128) lane gather. This removes
# SpmvOperator.matmat's per-column loop on BELL operators (the dominant
# general format since the round-3 dispatch) for K in [2, 16].
# ---------------------------------------------------------------------------


def _make_bell_spmm_kernel(ds: tuple, modes: tuple, span: int, lo: int,
                           br: int, k: int):
    from jax.experimental import pallas as pl

    bias = LANES if span == 128 else 0

    def kernel(vals_ref, lane_ref, x_ref, y_ref):
        i = pl.program_id(0)
        base = i * br
        acc = jnp.zeros((br, k, LANES), x_ref.dtype)
        slices = {}  # absolute window-row offset -> (br, k, 128) slice
        for li, (d, mask) in enumerate(zip(ds, modes)):
            pos = lane_ref[li].astype(jnp.int32) + bias  # (br, 128)
            idx = jnp.bitwise_and(pos, 127)
            half = jax.lax.shift_right_logical(pos, 7)
            idx3 = jnp.broadcast_to(
                idx[:, None, :], (br, k, LANES)).reshape(br * k, LANES)
            xg = None
            for h in range(span // 128 + 1):
                if not (mask >> h) & 1:
                    continue
                off = d + h
                if off not in slices:
                    slices[off] = x_ref[pl.ds(base + lo + off, br), :, :]
                g = jnp.take_along_axis(
                    slices[off].reshape(br * k, LANES), idx3, axis=1
                ).reshape(br, k, LANES)
                if xg is None:
                    xg = g
                else:
                    # planner guarantees each slot's half bit is in mask,
                    # so the per-half masks partition: additive select
                    # (Mosaic cannot broadcast i1 in 3-D)
                    mh = jnp.where(half == h, 1.0, 0.0).astype(x_ref.dtype)
                    xg = xg * (1.0 - mh[:, None, :]) + g * mh[:, None, :]
            v = vals_ref[li]
            if v.dtype != acc.dtype:  # bf16 planes: widen, f32 accumulate
                v = v.astype(acc.dtype)
            acc = acc + v[:, None, :] * xg
        y_ref[...] = acc

    return kernel


def _bell_spmm_x3(x, *, cols: int, lo: int, hi: int):
    """(cols, K) -> VMEM-resident (lo + c128 + hi, K, 128) packed RHS."""
    c128 = -(-cols // LANES)
    k = x.shape[1]
    xpad = jnp.zeros((c128 * LANES, k), x.dtype).at[: x.shape[0]].set(x)
    x3 = xpad.reshape(c128, LANES, k).transpose(0, 2, 1)
    return jnp.concatenate(
        [
            jnp.zeros((lo, k, LANES), x.dtype),
            x3,
            jnp.zeros((hi, k, LANES), x.dtype),
        ],
        axis=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ds", "modes", "span", "rows", "cols", "br", "k",
                     "interpret"),
)
def _spmm_bell_jit(vals, lane, x, *, ds: tuple, modes: tuple, span: int,
                   rows: int, cols: int, br: int, k: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r128p = vals.shape[1]
    c128 = -(-cols // LANES)
    nh = span // 128 + 1
    dmin = min(ds) if ds else 0
    dmax = max(ds) if ds else 0
    lo = max(0, -dmin)
    win_rows = lo + br + max(dmax + nh - 1, 0)
    win_rows += (-win_rows) % 8
    total_rows = max((r128p // br - 1) * br + win_rows, lo + c128)
    hi = total_rows - lo - c128
    x3 = _bell_spmm_x3(x, cols=cols, lo=lo, hi=hi)

    bias = LANES if span == 128 else 0
    if interpret:
        # pure-XLA reference (CPU path + semantics oracle), same math
        y3 = jnp.zeros((r128p, k, LANES), x.dtype)
        for li, (d, mask) in enumerate(zip(ds, modes)):
            pos = lane[li].astype(jnp.int32) + bias
            idx = jnp.bitwise_and(pos, 127)
            half = jax.lax.shift_right_logical(pos, 7)
            idx3 = jnp.broadcast_to(
                idx[:, None, :], (r128p, k, LANES)).reshape(r128p * k, LANES)
            xg = None
            for h in range(nh):
                if not (mask >> h) & 1:
                    continue
                a = jax.lax.slice_in_dim(x3, lo + d + h, lo + d + h + r128p,
                                         axis=0)
                g = jnp.take_along_axis(
                    a.reshape(r128p * k, LANES), idx3, axis=1
                ).reshape(r128p, k, LANES)
                if xg is None:
                    xg = g
                else:
                    xg = jnp.where(half[:, None, :] == h, g, xg)
            y3 = y3 + vals[li].astype(x.dtype)[:, None, :] * xg
        return y3.transpose(0, 2, 1).reshape(-1, k)[:rows]

    L = len(ds)
    y3 = pl.pallas_call(
        _make_bell_spmm_kernel(ds, modes, span, lo, br, k),
        grid=(r128p // br,),
        in_specs=[
            pl.BlockSpec((L, br, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec((L, br, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x3 resident
        ],
        out_specs=pl.BlockSpec((br, k, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r128p, k, LANES), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(vals, lane, x3)
    return y3.transpose(0, 2, 1).reshape(-1, k)[:rows]


def bell_spmm_viable(plan, k: int) -> bool:
    """Kernel gate: 2 <= K <= 16 and the resident packed RHS + streamed
    planes stay inside the VMEM budget."""
    from ..formats.bell import _BELL_VMEM_BUDGET

    return 2 <= k <= 16 and _bell_spmm_pick_br(plan, k, 512) >= 32


def _bell_spmm_pick_br(plan, k: int, br0: int) -> int:
    """Largest BR whose kernel working set fits the VMEM budget, or 0.

    Working set = resident packed RHS + double-buffered slot planes +
    one live (BR, K, 128) x slice per DISTINCT window offset (the
    kernel's ``slices`` dict — forgetting these cost a measured 14 MB
    OOM at femlike K=16, experiments/bell_spmm_bench.out) + y block
    (double-buffered) + the accumulator. The per-offset term is DOUBLED:
    the register allocator spills gather/reshape temporaries of the same
    shape (measured 99 MB of spill slots at femlike L=9 K=16 BR=512,
    experiments/bell_spmm_k16_fix.out; the doubled model picks BR=256
    there while keeping BR=512 at poisson K=16 and femlike K=8, both of
    which compiled and ran)."""
    from ..formats.bell import _BELL_VMEM_BUDGET

    c128 = -(-plan.cols // LANES)
    x3_bytes = (c128 + 16) * k * LANES * 4
    sb = plan.vals.dtype.itemsize + plan.lane.dtype.itemsize
    nh = plan.span // 128 + 1
    n_off = len({
        d + h
        for d, mask in zip(plan.ds, plan.modes)
        for h in range(nh)
        if (mask >> h) & 1
    }) or 1
    per_br = (2 * max(plan.num_layers, 1) * LANES * sb
              + (2 * n_off + 6) * k * LANES * 4)
    br = br0
    while br >= 32 and x3_bytes + br * per_br > _BELL_VMEM_BUDGET:
        br //= 2
    return br if br >= 32 else 0


def spmm_bell(plan, x, *, device_arrays=None):
    """Y = A @ X (X is (cols, K)) on a :class:`~..formats.bell.BellPlan`:
    one streamed pass over the slot planes for all K columns (+ the
    lanepack SpMM on the spill sub-plan when the plan has one)."""
    from .spmv_bell import bell_device_arrays

    x = jnp.asarray(x, dtype=plan.dtype)
    k = int(x.shape[1])
    if not bell_spmm_viable(plan, k):
        raise ValueError(
            f"spmm_bell gate: K={k} (need 2..16) or packed RHS exceeds the "
            "VMEM budget; chunk K or fall back to per-column spmv_bell")
    arrs = (device_arrays if device_arrays is not None
            else bell_device_arrays(plan))
    interp = jax.default_backend() != "tpu"
    if plan.num_layers:
        # shrink BR until the K-scaled working set fits alongside x3
        br = _bell_spmm_pick_br(plan, k, int(arrs["br"]))
        r128p = arrs["vals"].shape[1]
        vals, lane = arrs["vals"], arrs["lane"]
        if r128p % br:
            pad = br - r128p % br
            vals = jnp.pad(vals, ((0, 0), (0, pad), (0, 0)))
            lane = jnp.pad(lane, ((0, 0), (0, pad), (0, 0)))
        y = _spmm_bell_jit(
            vals, lane, x,
            ds=plan.ds, modes=plan.modes, span=plan.span, rows=plan.rows,
            cols=plan.cols, br=br, k=k, interpret=interp,
        )
    else:
        y = jnp.zeros((plan.rows, k), dtype=plan.dtype)
    if plan.spill is not None:
        y = y + spmm_lanepack(plan.spill, x,
                              device_arrays=arrs.get("spill"))
    return y
