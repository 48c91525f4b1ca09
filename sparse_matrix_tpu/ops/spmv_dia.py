"""DIA SpMV: shifts + fused multiply-adds, no index data.

``y[i] = sum_b data[b, i] * x[i + off_b]`` — each band reads a contiguous,
statically-offset slice of x, so XLA fuses the whole thing into one
memory-bound elementwise pass. This is the speed-of-light SpMV for stencil
operators (2x ideal-CSR bytes saved: no column indices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..formats.dia import DiaMatrix

__all__ = ["spmv_dia", "dia_device_arrays"]


def dia_device_arrays(m: DiaMatrix, *, values_dtype=None):
    """``values_dtype=jnp.bfloat16`` stores the band planes half-width:
    the value stream is the ONLY HBM traffic of the DIA kernel beyond x,
    so bf16 storage halves bytes/nnz. The kernel widens each block to the
    x dtype before the fma (f32 accumulate) — relative error per product
    is bf16-eps (~4e-3), which the mixed-precision refinement solvers
    (solvers/cg.py cg_solve_ir) recover to working accuracy."""
    data = jnp.asarray(m.data)
    if values_dtype is not None:
        data = data.astype(values_dtype)
    return dict(data=data)


# above this band-data size the working set cannot stay VMEM-resident and
# the stacked single-reduction form measures 1.31x the slice-accumulate
# chain (Poisson 2048^2, 84 MB: 879 -> 672 us; experiments/dia_large.out —
# both remain far under the HBM roofline, the recorded wall of the XLA
# path in this regime)
_DIA_STACK_BYTES = 48 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("offsets", "rows", "cols"))
def _spmv_dia_jit(data, x, *, offsets: tuple, rows: int, cols: int):
    nb = len(offsets)
    lo = -min(0, min(offsets))
    hi = max(0, max(offsets)) + max(rows, cols)
    xpad = jnp.zeros(lo + hi, x.dtype).at[lo : lo + x.shape[0]].set(x)
    if data.dtype != x.dtype:  # bf16 value planes: widen, f32 accumulate
        data = data.astype(x.dtype)
    if nb * rows * x.dtype.itemsize > _DIA_STACK_BYTES:
        wins = jnp.stack(
            [jax.lax.dynamic_slice(xpad, (lo + off,), (rows,)) for off in offsets]
        )
        return jnp.sum(data * wins, axis=0)
    y = jnp.zeros(rows, x.dtype)
    for b, off in enumerate(offsets):
        y = y + data[b] * jax.lax.dynamic_slice(xpad, (lo + off,), (rows,))
    return y


# -- Pallas streaming kernel for band data beyond VMEM ----------------------
#
# The XLA path walls at ~175 GB/s effective once the working set spills
# VMEM (experiments/dia_large.out). This kernel keeps x VMEM-RESIDENT
# (x is rows*4 bytes — 16 MB even at 4M rows — while the band data is
# nb times that) and STREAMS the data in (nb, BR, 128) blocks; each band
# offset decomposes into a row shift (whole 128-lane rows of the 2-D x
# view) plus a lane shift r realized as a two-view lane concatenation —
# no gathers, no scatters, every access a contiguous slice.

_DIA_PALLAS_BR = 512  # rows of 128 lanes per grid step (256 KB/band/step)


def _make_dia_kernel(offsets, lo_rows: int, br: int, nb: int):
    from jax.experimental import pallas as pl

    def kernel(data_ref, x_ref, y_ref):
        # x_ref is this step's WINDOW (lo_rows + br + hi_rows, 128): rows
        # [i*br, ...) of the padded x2d, element-indexed by the BlockSpec —
        # x itself stays in HBM and only ~br*128 floats stream per step
        # (the whole-x-VMEM variant blew the 16 MB scoped-vmem stack once
        # embedded in larger programs like the AMG V-cycle)
        acc = jnp.zeros((br, 128), x_ref.dtype)
        for b, off in enumerate(offsets):
            q, r = off // 128, off % 128  # python divmod: r in [0, 128)
            a = x_ref[pl.ds(lo_rows + q, br), :]
            if r == 0:
                win = a
            else:
                bview = x_ref[pl.ds(lo_rows + q + 1, br), :]
                win = jnp.concatenate([a[:, r:], bview[:, :r]], axis=1)
            d = data_ref[b]
            if d.dtype != acc.dtype:  # bf16 planes: widen, f32 accumulate
                d = d.astype(acc.dtype)
            acc = acc + d * win
        y_ref[...] = acc

    return kernel


def _dia_pallas_blocked_data(data, *, rows: int, br: int = None):
    """One-time reformat of (nb, rows) band data to the kernel's
    (nb, rpad, 128) blocked layout — 2x the data bytes in pure copies, so
    it must NOT sit inside the per-apply jit (measured ~200 us of the
    356 us apply before it was hoisted)."""
    br = br if br is not None else _DIA_PALLAS_BR
    nb = data.shape[0]
    r128 = -(-rows // 128)
    rpad = -(-r128 // br) * br
    dpad = jnp.zeros((nb, rpad, 128), data.dtype)
    return dpad.at[:, :r128, :].set(
        jnp.pad(data, ((0, 0), (0, r128 * 128 - data.shape[1]))).reshape(nb, r128, 128)
    )


@functools.partial(jax.jit, static_argnames=("offsets", "rows", "interpret", "br"))
def _spmv_dia_pallas(dpad, x, *, offsets: tuple, rows: int, interpret: bool, br: int = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    br = br if br is not None else _DIA_PALLAS_BR
    nb = dpad.shape[0]
    r128 = -(-rows // 128)
    rpad = dpad.shape[1]
    lo_rows = -min(0, min(offsets)) // 128 + 1  # guard rows before x
    hi_rows = max(0, max(offsets)) // 128 + 2  # and after (lane concat peeks +1)
    # Mosaic needs the window's sublane dim divisible by 8: absorb the
    # round-up into extra (zero) tail guard rows
    hi_rows += (-(lo_rows + br + hi_rows)) % 8

    # padded 2-D x view: [lo_rows zero rows | x | hi_rows zero rows]
    xflat = jnp.zeros(rpad * 128, x.dtype).at[:rows].set(x)
    x2d = jnp.concatenate(
        [
            jnp.zeros((lo_rows, 128), x.dtype),
            xflat.reshape(rpad, 128),
            jnp.zeros((hi_rows, 128), x.dtype),
        ],
        axis=0,
    )

    win_rows = lo_rows + br + hi_rows
    y2d = pl.pallas_call(
        _make_dia_kernel(offsets, lo_rows, br, nb),
        grid=(rpad // br,),
        in_specs=[
            pl.BlockSpec((nb, br, 128), lambda i: (0, i, 0)),
            # overlapping x windows, element-indexed rows: step i reads
            # x2d rows [i*br, i*br + win_rows)
            pl.BlockSpec(
                (pl.Element(win_rows), pl.Element(128)), lambda i: (i * br, 0)
            ),
        ],
        out_specs=pl.BlockSpec((br, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rpad, 128), x.dtype),
        interpret=interpret,
    )(dpad, x2d)
    return y2d.reshape(rpad * 128)[:rows]


def spmv_dia(m: DiaMatrix, x, *, device_arrays=None):
    arrs = device_arrays if device_arrays is not None else dia_device_arrays(m)
    x = jnp.asarray(x)
    data = arrs["data"]
    # gate on the f32-EQUIVALENT size: the XLA path's wall is its f32
    # accumulation working set, which bf16 storage does not shrink — a
    # bf16 2048^2 operator (42 MB) must still stream through the kernel
    if (
        data.size * x.dtype.itemsize > _DIA_STACK_BYTES
        and m.rows == m.cols
        and _DIA_PALLAS_BR * 128 <= m.rows <= 24_000_000  # x VMEM-resident
    ):
        dpad = arrs.get("data_blocked")
        if dpad is None:
            if isinstance(data, jax.core.Tracer):
                # traced operand (operator passed as a jit argument): the
                # reformat joins the caller's program; pre-block outside
                # the jit to pay it once
                dpad = _dia_pallas_blocked_data(data, rows=m.rows)
            else:
                # first use may happen inside a trace: build the cached
                # constant eagerly or it would leak a tracer into later
                # traces (same pattern as SpmvOperator._spmm_cache)
                with jax.ensure_compile_time_eval():
                    dpad = _dia_pallas_blocked_data(data, rows=m.rows)
                arrs["data_blocked"] = dpad
        return _spmv_dia_pallas(
            dpad, x, offsets=m.offsets, rows=m.rows,
            interpret=jax.default_backend() != "tpu",
        )
    return _spmv_dia_jit(arrs["data"], x, offsets=m.offsets, rows=m.rows, cols=m.cols)
