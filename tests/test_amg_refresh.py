"""AmgRefresh: device-side re-Galerkin of a frozen-P hierarchy.

Frozen-P semantics are checked against direct host recomputation of
``P^T A_new P`` with the SAME frozen prolongators (spgemm_auto), so the
chain of FixedSideSpgemm SpMVs must reproduce the host SpGEMM values to
f32 round-off on every level."""

import numpy as np
import pytest

from sparse_matrix_tpu.ops.spgemm_block import spgemm_auto
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.solvers import (
    AmgRefresh,
    amg_coarsen,
    amg_setup,
    cg_solve,
    pcg_solve,
    poisson_2d_csr,
)
from sparse_matrix_tpu.solvers.amg import _diag_of, _lambda_max_dinv_a


def _perturb(a: CsrMatrix, rng, scale=0.1) -> np.ndarray:
    """Same-pattern SPD-ish perturbation: scale off-diagonals, then bump
    diagonals to keep rows diagonally dominant."""
    rids = a.row_ids().astype(np.int64)
    on_diag = a.indices.astype(np.int64) == rids
    vals = a.vals.astype(np.float64).copy()
    vals[~on_diag] *= 1.0 + scale * rng.uniform(-1, 1, int((~on_diag).sum()))
    offsum = np.bincount(rids[~on_diag], weights=np.abs(vals[~on_diag]),
                         minlength=a.rows)
    vals[on_diag] = offsum[rids[on_diag]] * (1.0 + scale)
    return vals.astype(a.vals.dtype)


def test_refresh_matches_frozen_p_host_galerkin():
    a = poisson_2d_csr(24, dtype=np.float32)
    rng = np.random.default_rng(0)
    ref = AmgRefresh(a, coarse_size=40)
    assert ref.num_levels >= 2
    new_vals = _perturb(a, rng)
    levels, coarse = ref.refresh_coarsening(new_vals)
    # recompute every level on host with the same frozen prolongators
    cur = CsrMatrix(a.rows, a.cols, new_vals, a.indices, a.offsets,
                    is_sorted=True)
    for (a_l, p, dinv, lam) in levels:
        np.testing.assert_allclose(a_l.to_dense(), cur.to_dense(),
                                   atol=1e-4, rtol=1e-4)
        # dinv/lam refreshed from the NEW values
        d = _diag_of(a_l)
        np.testing.assert_allclose(dinv, np.where(d != 0, 1.0 / np.where(
            d == 0, 1.0, d), 1.0), rtol=1e-6)
        assert lam >= _lambda_max_dinv_a(a_l, dinv) - 1e-6  # Gershgorin
        ap = spgemm_auto(cur, p, output_sorted=False)
        cur = spgemm_auto(p.transpose(), ap, output_sorted=True)
    np.testing.assert_allclose(coarse.to_dense(), cur.to_dense(),
                               atol=1e-4, rtol=1e-4)


def test_refresh_identity_reproduces_plan_values():
    a = poisson_2d_csr(16, dtype=np.float32)
    ref = AmgRefresh(a, coarse_size=30)
    levels, coarse = ref.refresh_coarsening(a.vals)
    coarsening = amg_coarsen(a, coarse_size=30)
    for (a_l, p, _, _), (b_l, q, _, _) in zip(levels, coarsening[0]):
        np.testing.assert_allclose(a_l.to_dense(), b_l.to_dense(),
                                   atol=1e-4, rtol=1e-4)
        assert p is q or np.allclose(p.to_dense(), q.to_dense())


def test_refreshed_hierarchy_preconditions_pcg():
    a = poisson_2d_csr(32, dtype=np.float32)
    rng = np.random.default_rng(1)
    ref = AmgRefresh(a, coarse_size=60)
    # symmetric diagonal scaling S A S: same pattern, SPD, and keeps the
    # Poisson conditioning (a dominance bump would make plain CG trivial)
    s = np.exp(0.3 * rng.standard_normal(a.rows))
    rids = a.row_ids().astype(np.int64)
    new_vals = (a.vals.astype(np.float64) * s[rids]
                * s[a.indices.astype(np.int64)]).astype(np.float32)
    hier = ref.refresh(new_vals, coarse_size=60)
    a_new = CsrMatrix(a.rows, a.cols, new_vals, a.indices, a.offsets,
                      is_sorted=True)
    import jax.numpy as jnp

    from sparse_matrix_tpu.ops.operator import SpmvOperator

    op = SpmvOperator(a_new)
    b = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))
    res_plain = cg_solve(op, b, tol=1e-6, maxiter=2000)
    res_amg = pcg_solve(op, b, hier.preconditioner(), tol=1e-6, maxiter=200)
    x = np.asarray(res_amg.x)
    r = np.asarray(op(res_amg.x)) - np.asarray(b)
    assert np.linalg.norm(r) <= 1e-4 * np.linalg.norm(np.asarray(b))
    # the refreshed (lagged-P) V-cycle must still slash the iteration count
    # and be no worse than a full from-scratch re-setup (+small slack for
    # the un-resmoothed prolongators)
    res_fresh = pcg_solve(op, b, amg_setup(a_new, coarse_size=60)
                          .preconditioner(), tol=1e-6, maxiter=200)
    assert int(res_amg.iterations) < int(res_plain.iterations) // 3
    # measured on this seed: plain 190, fresh 18, refreshed 22 — the
    # lagged prolongators cost a few extra iterations, bounded at 1.5x
    assert int(res_amg.iterations) <= int(res_fresh.iterations * 3) // 2 + 1
    np.testing.assert_allclose(x, np.asarray(res_plain.x), atol=1e-2)


def test_refresh_rejects_wrong_length():
    a = poisson_2d_csr(8, dtype=np.float32)
    ref = AmgRefresh(a, coarse_size=10)
    with pytest.raises(ValueError):
        ref.refresh_coarsening(np.ones(3, np.float32))


def test_refresh_reuses_precomputed_coarsening():
    a = poisson_2d_csr(16, dtype=np.float32)
    coarsening = amg_coarsen(a, coarse_size=30)
    ref = AmgRefresh(a, coarsening=coarsening)
    levels, _ = ref.refresh_coarsening(a.vals)
    assert len(levels) == len(coarsening[0])


def test_refresh_device_matches_host_refresh():
    """Round-5 device-resident refresh: value planes re-gathered in place
    via probe-decoded slot maps — level applies, dinv, lam, and the
    coarse inverse must match the host refresh path."""
    import jax.numpy as jnp

    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.solvers import poisson_2d_csr
    from sparse_matrix_tpu.solvers.amg_refresh import AmgRefresh

    a = poisson_2d_csr(24, dtype=np.float32)
    rng = np.random.default_rng(5)
    s = np.exp(0.25 * rng.standard_normal(a.rows)).astype(np.float64)
    rid = a.row_ids().astype(np.int64)
    nv = (a.vals.astype(np.float64) * s[rid]
          * s[a.indices.astype(np.int64)]).astype(np.float32)

    ref = AmgRefresh(a, coarse_size=40)
    host_h = ref.refresh(nv)
    dev_h = ref.refresh_device(nv)
    assert len(dev_h.levels) == len(host_h.levels)
    for lh, ld in zip(host_h.levels, dev_h.levels):
        x = rng.standard_normal(lh.n).astype(np.float32)
        ya = np.asarray(lh.a_op(jnp.asarray(x)))
        yb = np.asarray(ld.a_op(jnp.asarray(x)))
        sc = max(1.0, np.abs(ya).max())
        np.testing.assert_allclose(yb / sc, ya / sc, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ld.dinv), np.asarray(lh.dinv),
                                   rtol=1e-5, atol=1e-6)
        assert abs(ld.lam - lh.lam) <= 2e-3 * max(1.0, abs(lh.lam))
    np.testing.assert_allclose(np.asarray(dev_h.coarse_inv),
                               np.asarray(host_h.coarse_inv),
                               rtol=1e-4, atol=1e-5)
    # end to end: the refreshed-device hierarchy preconditions PCG on the
    # new operator comparably to the host-refresh hierarchy
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import pcg_solve

    a_new = CsrMatrix(a.rows, a.cols, nv, a.indices, a.offsets,
                      is_sorted=True)
    op = SpmvOperator(a_new)
    b = jnp.ones(a.rows, jnp.float32)
    r_host = pcg_solve(op, b, host_h.preconditioner(), tol=1e-6,
                       maxiter=200)
    r_dev = pcg_solve(op, b, dev_h.preconditioner(), tol=1e-6, maxiter=200)
    assert int(r_dev.iterations) <= int(r_host.iterations) + 3


def test_hbm_budget_guard(monkeypatch):
    """4096²-class plans exceed one v5e's HBM mid-push
    (amg_refresh_bench_r5b.out RESOURCE_EXHAUSTED); the pre-flight
    estimate (59 B per finest-AP product, calibrated on the 1024²/2048²
    push telemetry) must fail BEFORE planning with the documented
    alternatives."""
    import pytest

    from sparse_matrix_tpu.solvers import poisson_2d_csr
    from sparse_matrix_tpu.solvers.amg_refresh import AmgRefresh

    a = poisson_2d_csr(64, dtype=np.float32)
    # tiny budget forces the trigger deterministically
    monkeypatch.setenv("SPMX_HBM_BYTES", str(int(4e9 + 1000)))
    with pytest.raises(ValueError, match="HBM budget"):
        AmgRefresh(a)
    monkeypatch.setenv("SPMX_HBM_BYTES", "0")
    AmgRefresh(a)  # disabled -> plans fine
