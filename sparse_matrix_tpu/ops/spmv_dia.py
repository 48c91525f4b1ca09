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


def dia_device_arrays(m: DiaMatrix):
    return dict(data=jnp.asarray(m.data))


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
    if nb * rows * x.dtype.itemsize > _DIA_STACK_BYTES:
        wins = jnp.stack(
            [jax.lax.dynamic_slice(xpad, (lo + off,), (rows,)) for off in offsets]
        )
        return jnp.sum(data * wins, axis=0)
    y = jnp.zeros(rows, x.dtype)
    for b, off in enumerate(offsets):
        y = y + data[b] * jax.lax.dynamic_slice(xpad, (lo + off,), (rows,))
    return y


def spmv_dia(m: DiaMatrix, x, *, device_arrays=None):
    arrs = device_arrays if device_arrays is not None else dia_device_arrays(m)
    x = jnp.asarray(x)
    return _spmv_dia_jit(arrs["data"], x, offsets=m.offsets, rows=m.rows, cols=m.cols)
