"""Fused banded triangular Jacobi-sweep solve.

``x_{k+1} = dinv * (b - N x_k)``, ``x_0 = dinv * b`` with strictly-
triangular banded ``N`` (DIA form) — ALL sweeps inside ONE Pallas call,
``x`` held in a VMEM scratch between sweeps. The unfused path
(``TriangularJacobi.__call__``) issues ``1 + sweeps`` separate band
applies per solve; inside a PCG iteration that is ~10 kernel dispatches
and ~2 HBM round-trips of ``x`` per sweep. Here the band data, ``b`` and
``dinv`` are read from HBM once per solve and the sweep loop runs out of
VMEM — per-solve traffic is ``(nb + 2) * rows`` floats in + ``rows`` out,
independent of the sweep count.

Offsets decompose as in the streaming DIA kernel (``ops/spmv_dia.py``):
row shift ``q`` plus lane shift ``r`` realized as a two-view lane
concatenation — every access a contiguous slice, no gathers. The same
shift algebra runs as a pure-XLA reference on CPU (Pallas interpret mode
is per-grid-step Python; see CLAUDE.md).

Sweep semantics mirror ``solvers/ilu.py::TriangularJacobi`` (Chow-Patel
approximate trisolve; ``D^{-1}N`` nilpotent makes ``sweeps >= depth-1``
exact). Host factorization stance per the reference: the irregular part
(IC/ILU factorization) stays on the host (/root/reference/spam_csr/src/
mul_hash.rs — host does the irregular work), the regular sweeps run on
device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TrisweepPlan", "trisweep", "plan_trisweep"]

# VMEM working set: (nb bands + b + dinv + x-scratch + y) * rows * 4B.
# Cap the resident footprint well under the ~72 MB budget measured for
# this chip (docs/PERF.md round-3 VMEM notes).
_TRISWEEP_VMEM_BYTES = 56 * 1024 * 1024


class TrisweepPlan:
    """Static plan: DIA offsets of the strict part N + blocked band data."""

    def __init__(self, offsets: tuple, data: np.ndarray, rows: int):
        self.offsets = tuple(int(o) for o in offsets)
        self.rows = int(rows)
        # f32 Mosaic blocks need (8, 128) tiling: round the 2-D row count
        # up to a sublane multiple (CLAUDE.md Mosaic facts)
        r128 = -(-(-(-rows // 128)) // 8) * 8
        self.r128 = r128
        nb = data.shape[0]
        pad = np.zeros((nb, r128 * 128), data.dtype)
        pad[:, : data.shape[1]] = data
        self.data2d = jnp.asarray(pad.reshape(nb, r128, 128))

    def vmem_bytes(self) -> int:
        nb = self.data2d.shape[0]
        return (nb + 4) * self.r128 * 128 * self.data2d.dtype.itemsize


def plan_trisweep(dia, rows: int):
    """Build a :class:`TrisweepPlan` from a ``DiaMatrix`` of the STRICT
    part N, or return None when the fused kernel does not apply (working
    set past the VMEM cap, or degenerate shapes). The gate runs on SHAPES
    before any padding/device transfer — a rejected wide-band factor must
    not ship tens of MB to the device first."""
    data = np.asarray(dia.data)
    r128 = -(-(-(-rows // 128)) // 8) * 8
    vmem = (data.shape[0] + 4) * r128 * 128 * data.dtype.itemsize
    if vmem > _TRISWEEP_VMEM_BYTES or rows < 128:
        return None
    return TrisweepPlan(dia.offsets, data, rows)


def _guard_rows(offsets):
    lo = -min(0, min(offsets)) // 128 + 1
    hi = max(0, max(offsets)) // 128 + 2
    # 8-align BOTH guards so every scratch store (offset and size) sits on
    # a sublane-tile boundary (stores are pickier than the read-side
    # shifts the streaming DIA kernel does)
    lo += (-lo) % 8
    hi += (-hi) % 8
    return lo, hi


def _make_trisweep_kernel(offsets, lo_rows: int, r128: int, nb: int, sweeps: int):
    from jax.experimental import pallas as pl

    def kernel(data_ref, b_ref, dinv_ref, y_ref, x_scr):
        zeros_lo = jnp.zeros((lo_rows, 128), b_ref.dtype)
        hi_rows = x_scr.shape[0] - lo_rows - r128
        x_scr[pl.ds(0, lo_rows), :] = zeros_lo
        x_scr[pl.ds(lo_rows + r128, hi_rows), :] = jnp.zeros(
            (hi_rows, 128), b_ref.dtype
        )
        x_scr[pl.ds(lo_rows, r128), :] = dinv_ref[...] * b_ref[...]

        def body(_, carry):
            acc = jnp.zeros((r128, 128), b_ref.dtype)
            for bnd, off in enumerate(offsets):
                q, r = off // 128, off % 128  # python divmod: r in [0, 128)
                a = x_scr[pl.ds(lo_rows + q, r128), :]
                if r == 0:
                    win = a
                else:
                    bview = x_scr[pl.ds(lo_rows + q + 1, r128), :]
                    win = jnp.concatenate([a[:, r:], bview[:, :r]], axis=1)
                acc = acc + data_ref[bnd] * win
            x_scr[pl.ds(lo_rows, r128), :] = dinv_ref[...] * (b_ref[...] - acc)
            return carry

        jax.lax.fori_loop(0, sweeps, body, 0)
        y_ref[...] = x_scr[pl.ds(lo_rows, r128), :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("offsets", "rows", "r128", "sweeps", "interpret")
)
def _trisweep_call(data2d, b, dinv, *, offsets, rows, r128, sweeps, interpret):
    if interpret:
        return _trisweep_xla(data2d, b, dinv, offsets=offsets, rows=rows,
                             r128=r128, sweeps=sweeps)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = data2d.shape[0]
    lo_rows, hi_rows = _guard_rows(offsets)

    def to2d(v):
        return (
            jnp.zeros(r128 * 128, v.dtype).at[:rows].set(v).reshape(r128, 128)
        )

    b2d, dinv2d = to2d(b), to2d(dinv)
    y2d = pl.pallas_call(
        _make_trisweep_kernel(offsets, lo_rows, r128, nb, sweeps),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((nb, r128, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((r128, 128), lambda i: (0, 0)),
            pl.BlockSpec((r128, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r128, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((r128, 128), b.dtype),
        scratch_shapes=[
            pltpu.VMEM((lo_rows + r128 + hi_rows, 128), b.dtype)
        ],
        # default scoped-vmem limit is 16 MB; the whole working set is
        # resident here by design (bands + b + dinv + x scratch + y ~
        # 25 MB at 1024^2, capped at _TRISWEEP_VMEM_BYTES by the plan)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(data2d, b2d, dinv2d)
    return y2d.reshape(r128 * 128)[:rows]


def _trisweep_xla(data2d, b, dinv, *, offsets, rows, r128, sweeps):
    """Pure-XLA reference of the SAME shift algebra (CPU path + oracle)."""
    nb = data2d.shape[0]
    flat = data2d.reshape(nb, r128 * 128)[:, :rows]
    lo = -min(0, min(offsets))
    hi = max(0, max(offsets)) + rows

    def apply_n(x):
        xpad = jnp.zeros(lo + hi, x.dtype).at[lo : lo + rows].set(x)
        acc = jnp.zeros(rows, x.dtype)
        for bnd, off in enumerate(offsets):
            acc = acc + flat[bnd] * jax.lax.dynamic_slice(
                xpad, (lo + off,), (rows,)
            )
        return acc

    x = dinv * b

    def body(_, x):
        return dinv * (b - apply_n(x))

    return jax.lax.fori_loop(0, sweeps, body, x)


def trisweep(plan: TrisweepPlan, b, dinv, *, sweeps: int, data2d=None):
    """Run the fused solve; ``data2d`` overrides the plan's blocked band
    data (operator-as-jit-argument path)."""
    dd = data2d if data2d is not None else plan.data2d
    return _trisweep_call(
        dd, b, dinv,
        offsets=plan.offsets, rows=plan.rows, r128=plan.r128,
        sweeps=int(sweeps), interpret=jax.default_backend() != "tpu",
    )
