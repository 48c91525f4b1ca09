"""Device-side AMG hierarchy refresh for same-pattern operator updates.

The expensive pieces of smoothed-aggregation setup — strength graph,
aggregation, prolongator smoothing, and the Galerkin triple products —
depend on A's *values* only through products whose sparsity STRUCTURE is
fixed once the pattern is fixed. In the lagged-prolongator regime
(Newton/quasi-Newton steps, implicit time stepping, parameter continuation:
A's values drift on a frozen pattern), standard practice freezes the
aggregates and prolongators and refreshes only the coarse operators
``A_{l+1} = P_l^T A_l P_l``.

With P frozen, each Galerkin product is a *fixed-side* same-pattern
SpGEMM, i.e. exactly ONE planned SpMV (:class:`~..ops.spgemm_spmv.
FixedSideSpgemm`): re-Galerkin of the whole hierarchy is a chain of
``2 x levels`` SpMVs that runs device-resident under one jit — no sorts,
no hashes, no host SpGEMM. The reference re-runs its full two-phase hash
engine per product on every re-setup (``/root/reference/spam_csr/src/
mul_hash.rs:106-201``); here the hash phase's routing decision is plan
data computed once.

Semantics: the refreshed hierarchy is EXACT for the frozen-P Galerkin
``P^T A_new P`` (values match a from-scratch product with the same frozen
P to f32 round-off); it differs from a full re-setup only in that P is
not re-smoothed against the new values — the standard lagged-AMG
trade-off. Smoother data is refreshed exactly: per-level ``dinv`` from
the new diagonals and the Gershgorin bound ``lam`` from the new row sums.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..formats.csr import CsrMatrix
from ..ops.spgemm_spmv import FixedSideSpgemm
from .amg import AmgHierarchy, amg_coarsen, amg_setup

__all__ = ["AmgRefresh"]


def _pattern_csr(out_row, out_col, rows: int, cols: int) -> CsrMatrix:
    """Sorted CSR skeleton from a plan's static output pattern (row-major
    out_row/out_col), with placeholder unit values — exactly what
    :func:`~..ops.device_sorted.padded_to_host` would build from a
    multiply, minus the multiply."""
    from ..formats.csr import INDEX_DTYPE, OFFSET_DTYPE

    row = np.asarray(out_row, np.int64)
    col = np.asarray(out_col)
    offsets = np.zeros(rows + 1, dtype=OFFSET_DTYPE)
    np.add.at(offsets, row + 1, 1)
    np.cumsum(offsets, out=offsets)
    return CsrMatrix(rows, cols, np.ones(len(row), np.float32),
                     col.astype(INDEX_DTYPE), offsets, is_sorted=True)


def _pattern_meta(m: CsrMatrix):
    """Precompute the value-independent pieces of dinv/lam for a pattern:
    positions of explicit diagonal entries and the row-segment offsets
    (refresh recomputes dinv exactly and lam as the Gershgorin bound —
    the same bound ``amg_coarsen`` uses on its native path)."""
    rids = m.row_ids().astype(np.int64)
    on_diag = np.flatnonzero(m.indices.astype(np.int64) == rids)
    return on_diag, rids[on_diag], m.offsets.astype(np.int64)


def _dinv_lam(vals: np.ndarray, rows: int, meta) -> Tuple[np.ndarray, float]:
    diag_pos, diag_row, offsets = meta
    dvec = np.zeros(rows, dtype=np.float64)
    dvec[diag_row] = vals[diag_pos].astype(np.float64)
    dinv = np.where(dvec != 0.0, 1.0 / np.where(dvec == 0.0, 1.0, dvec), 1.0)
    if len(vals):
        c = np.zeros(len(vals) + 1, dtype=np.float64)
        np.cumsum(np.abs(vals, dtype=np.float64), out=c[1:])
        abssum = c[offsets[1:]] - c[offsets[:-1]]
        lam = float(np.max(abssum * np.abs(dinv)))
    else:
        lam = 1.0
    return dinv, lam


class AmgRefresh:
    """Plan once, re-Galerkin on device as A's values drift.

    ``AmgRefresh(a, **coarsen_kw)`` runs the host coarsening once (or
    reuses a precomputed ``coarsening=`` from :func:`amg_coarsen` /
    :func:`load_amg_coarsening`), freezes every prolongator, and plans
    the fixed-pattern product chain. Afterwards:

    * :meth:`refresh_values` — jitted device chain: new finest values
      (CSR order) -> tuple of every coarse level's values (CSR order).
    * :meth:`refresh_coarsening` — host ``(levels, coarse)`` tuple with
      refreshed values, dinv, and Gershgorin lam per level; feeds
      ``amg_setup(coarsening=...)``.
    * :meth:`refresh` — one call to a new :class:`AmgHierarchy`.

    ``force=`` pins the SpMV format of the selection operators (they are
    cost-model dispatched by default, like any framework SpMV).
    """

    def __init__(self, a: CsrMatrix, *, theta: float = 0.08,
                 smooth_prolongator: bool = True, max_levels: int = 12,
                 coarse_size: int = 400, force: Optional[str] = None,
                 coarsening=None):
        if not a.is_sorted:
            raise ValueError("AmgRefresh requires a sorted CSR pattern")
        if coarsening is None:
            coarsening = amg_coarsen(
                a, theta=theta, smooth_prolongator=smooth_prolongator,
                max_levels=max_levels, coarse_size=coarse_size)
        host_levels, _ = coarsening
        self._prolongators: List[CsrMatrix] = [p for (_, p, _, _) in host_levels]
        self._plans: List[Tuple[FixedSideSpgemm, FixedSideSpgemm]] = []
        self._patterns: List[CsrMatrix] = [a]
        self._meta = [_pattern_meta(a)]
        cur = a
        for p in self._prolongators:
            # self-consistent chain: level l+1's pattern is the STRUCTURAL
            # P^T A P product of the chain's own level-l pattern (a
            # superset of a value-compacted host product, never smaller).
            # Only PATTERNS thread through the plan — the varying side's
            # values never enter FixedSideSpgemm's plan data, so the
            # intermediate/coarse matrices are built from the plan's
            # out_row/out_col constants with placeholder values (skipping
            # two device multiplies + jit compiles per level at plan time)
            ap = FixedSideSpgemm(cur, p, fixed="rhs", force=force)
            ap_pat = _pattern_csr(ap.out_row, ap.out_col, ap.rows, ap.cols)
            rap = FixedSideSpgemm(p.transpose(), ap_pat, fixed="lhs",
                                  force=force)
            cur = _pattern_csr(rap.out_row, rap.out_col, rap.rows, rap.cols)
            self._plans.append((ap, rap))
            self._patterns.append(cur)
            self._meta.append(_pattern_meta(cur))
        self._chain_jit = None

    @property
    def num_levels(self) -> int:
        return len(self._plans)

    # -- device path --------------------------------------------------------

    def device_fn(self):
        """``(fn, params)`` with ``fn(params, vals0) -> tuple of coarse
        vals`` — the selection operators ride as jit ARGUMENTS (pytrees),
        so the compiled payload stays small at scale (same rationale as
        ``bench_device_loop(params=)``: >24 MB constants blow the remote
        compile payload)."""
        plans = self._plans

        params = tuple(
            (ap.op.as_pytree(), rap.op.as_pytree()) for ap, rap in plans)

        def fn(prm, v):
            outs = []
            for (ap, rap), (pa, pr) in zip(plans, prm):
                v = rap.op.apply(pr, ap.op.apply(pa, v))
                outs.append(v)
            return tuple(outs)

        return fn, params

    def refresh_values(self, new_vals):
        """New finest-level values (CSR order, length ``a.nnz()``) ->
        tuple of refreshed values for levels ``1..L`` (CSR order each),
        computed on device under one jit."""
        import jax

        if self._chain_jit is None:
            fn, params = self.device_fn()
            self._params = params
            self._chain_jit = jax.jit(fn)
        import jax.numpy as jnp

        return self._chain_jit(self._params, jnp.asarray(new_vals, jnp.float32))

    # -- host assembly -------------------------------------------------------

    def refresh_coarsening(self, new_vals):
        """``(levels, coarse)`` for :func:`amg_setup(coarsening=...)`:
        refreshed level matrices (values pulled from the device chain),
        frozen prolongators, exact new ``dinv`` and Gershgorin ``lam``."""
        new_vals = np.asarray(new_vals)
        if new_vals.shape != self._patterns[0].vals.shape:
            raise ValueError(
                f"value vector length {new_vals.shape} does not match the "
                f"planned pattern nnz {self._patterns[0].vals.shape}")
        chain = [np.asarray(v) for v in self.refresh_values(new_vals)]
        level_vals = [new_vals] + chain
        levels = []
        for l, p in enumerate(self._prolongators):
            pat = self._patterns[l]
            vals = level_vals[l].astype(pat.vals.dtype)
            a_l = CsrMatrix(pat.rows, pat.cols, vals, pat.indices,
                            pat.offsets, is_sorted=True)
            dinv, lam = _dinv_lam(vals, pat.rows, self._meta[l])
            levels.append((a_l, p, dinv, lam))
        pat = self._patterns[-1]
        coarse = CsrMatrix(pat.rows, pat.cols,
                           level_vals[-1].astype(pat.vals.dtype),
                           pat.indices, pat.offsets, is_sorted=True)
        if not levels:
            coarse = CsrMatrix(pat.rows, pat.cols,
                               new_vals.astype(pat.vals.dtype),
                               pat.indices, pat.offsets, is_sorted=True)
        return levels, coarse

    def refresh(self, new_vals, **setup_kw) -> AmgHierarchy:
        """New values -> new :class:`AmgHierarchy` (device Galerkin chain
        + operator re-planning on the fixed patterns; smoother/V-cycle
        options pass through to :func:`amg_setup`)."""
        levels, coarse = self.refresh_coarsening(new_vals)
        return amg_setup(self._patterns[0], coarsening=(levels, coarse),
                         **setup_kw)
