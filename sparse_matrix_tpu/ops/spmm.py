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

__all__ = ["spmm_dia", "spmm_bcsr"]


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