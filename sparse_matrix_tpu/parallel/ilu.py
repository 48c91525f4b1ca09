"""Distributed IC(0)-preconditioned CG over a device mesh.

The triangular-solve design transfers unchanged to the mesh because it
was already built as SpMV sweeps (:class:`~..solvers.ilu.TriangularJacobi`
— the nilpotent-Jacobi recurrence): the factor's strict part lives
row-sharded in padded-ELL, ``dinv`` is row-sharded, and every sweep is
one GSPMD-gathered operand read plus purely local arithmetic. Equal sweep
counts on ``L`` and ``L^T`` keep ``M^{-1} = S^T S`` symmetric PSD exactly
as in the single-chip design, so the distributed PCG recurrence is sound.

Factorization (sequential, native C++) runs once on the host — the same
"host does the irregular part" split as the AMG setup.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.csr import CsrMatrix
from .spmv import shard_ell

__all__ = ["DistIcFactor", "dist_ic_setup", "dist_ic_pcg_solve"]


class DistIcFactor(NamedTuple):
    n_ev: object  # strict-lower part of L, row-sharded ELL
    n_ec: object
    nt_ev: object  # strict-lower part of L^T (i.e. strict upper), row-sharded
    nt_ec: object
    dinv: object  # (rows_pad,) row-sharded 1/diag(L)
    a_ev: object  # the operator itself, row-sharded ELL
    a_ec: object
    n: int
    rows_pad: int
    sweeps: int


def _strict_part(t: CsrMatrix, cols_pad: int) -> CsrMatrix:
    rid = t.row_ids()
    cid = t.indices.astype(np.int64)
    off = cid != rid
    return CsrMatrix.from_coo(t.rows, cols_pad, rid[off], cid[off], t.vals[off])


def dist_ic_setup(
    a: CsrMatrix, mesh: Mesh, *, axis: str = "rows", dtype=np.float32,
    sweeps: int = 4,
) -> DistIcFactor:
    """Host IC(0) factorization + row-sharded factor/operator views."""
    from ..solvers.ilu import _diag_positions, ic0

    lc = ic0(a)
    ndev = mesh.devices.size
    rows_pad = -(-a.rows // ndev) * ndev
    diag_pos = _diag_positions(lc)
    d = lc.vals[diag_pos].astype(np.float64)
    dpad = np.zeros(rows_pad, dtype)
    dpad[: a.rows] = (1.0 / d).astype(dtype)

    n_ev, n_ec, _ = shard_ell(_strict_part(lc, rows_pad), mesh, dtype=dtype, axis=axis)
    nt_ev, nt_ec, _ = shard_ell(
        _strict_part(lc.transpose(), rows_pad), mesh, dtype=dtype, axis=axis
    )
    a_ev, a_ec, _ = shard_ell(
        CsrMatrix(a.rows, rows_pad, a.vals, a.indices, a.offsets, is_sorted=a.is_sorted),
        mesh, dtype=dtype, axis=axis,
    )
    vec = NamedSharding(mesh, P(axis))
    return DistIcFactor(
        n_ev, n_ec, nt_ev, nt_ec,
        jax.device_put(jnp.asarray(dpad), vec),
        a_ev, a_ec, a.rows, rows_pad, sweeps,
    )


def _sweep_solve(ev, ec, dinv, b, sweeps: int):
    """Jacobi-sweep triangular solve on a row-sharded factor (GSPMD)."""
    x = dinv * b
    for _ in range(sweeps):
        x = dinv * (b - jnp.sum(ev * x[ec], axis=1))
    return x


def dist_ic_pcg_solve(f: DistIcFactor, b, *, tol: float = 1e-6, maxiter: int = 500):
    """PCG with the distributed IC(0) preconditioner; ``b`` is the
    (rows_pad,) row-sharded padded rhs. One jit; GSPMD inserts the
    operand gathers and psums."""
    from ..solvers.cg import pcg_solve

    def matvec(v):
        return jnp.sum(f.a_ev * v[f.a_ec], axis=1)

    def m_inv(r):
        y = _sweep_solve(f.n_ev, f.n_ec, f.dinv, r, f.sweeps)
        return _sweep_solve(f.nt_ev, f.nt_ec, f.dinv, y, f.sweeps)

    return jax.jit(
        lambda bb: pcg_solve(matvec, bb, m_inv, tol=tol, maxiter=maxiter)
    )(b)
