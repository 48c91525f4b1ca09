"""Smoothed-aggregation AMG: setup pieces, V-cycle symmetry, PCG end-to-end.

The V-cycle composes the framework's own SpGEMM (Galerkin products),
planned SpMV operators, and PCG — so these are also integration tests of
that whole stack on rectangular operators."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse_matrix_tpu.solvers import (
    amg_pcg_solve,
    amg_setup,
    cg_solve,
    pcg_solve,
    poisson_2d_csr,
)
from sparse_matrix_tpu.solvers.amg import (
    aggregate_strong,
    strength_graph,
    tentative_prolongator,
)


def test_strength_and_aggregation_poisson():
    a = poisson_2d_csr(16)  # 256 nodes, 5-point stencil
    so, si = strength_graph(a, theta=0.08)
    # every off-diagonal of the Poisson stencil is strong at theta=0.08
    assert so[-1] == a.nnz() - a.rows
    agg, n_agg = aggregate_strong(a.rows, so, si)
    assert agg.min() >= 0 and agg.max() == n_agg - 1
    # star aggregates: coarsening factor should be meaningful
    assert n_agg < a.rows // 2
    # every aggregate non-empty
    assert np.all(np.bincount(agg, minlength=n_agg) > 0)


def test_tentative_prolongator_orthonormal_columns():
    rng = np.random.default_rng(0)
    agg = rng.integers(0, 7, size=40)
    agg[:7] = np.arange(7)  # ensure all aggregates non-empty
    p = tentative_prolongator(agg, 7)
    assert p.invariants()
    ptp = (p.transpose() @ p).to_dense()
    np.testing.assert_allclose(ptp, np.eye(7), atol=1e-12)


def test_setup_hierarchy_shapes_and_galerkin_symmetry():
    a = poisson_2d_csr(24, dtype=np.float32)  # 576 rows
    hier = amg_setup(a, coarse_size=60, dtype=np.float32)
    assert len(hier.levels) >= 1
    sizes = [lv.n for lv in hier.levels] + [hier.coarse_inv.shape[0]]
    assert all(sizes[i] > sizes[i + 1] for i in range(len(sizes) - 1))
    # coarse inverse is of an SPD Galerkin product -> symmetric
    ci = np.asarray(hier.coarse_inv, dtype=np.float64)
    np.testing.assert_allclose(ci, ci.T, atol=1e-5 * np.abs(ci).max())


def _dense_m_inv(hier, n, dtype=np.float32):
    """Materialize M^{-1} by applying the V-cycle to the identity."""
    cols = []
    vc = jax.jit(hier.vcycle)
    for i in range(n):
        e = np.zeros(n, dtype=dtype)
        e[i] = 1.0
        cols.append(np.asarray(vc(jnp.asarray(e))))
    return np.stack(cols, axis=1)


@pytest.mark.parametrize("smoother", ["jacobi", "chebyshev"])
def test_vcycle_is_symmetric_preconditioner(smoother):
    # PCG requires M^{-1} symmetric: same smoother pre/post + P^T restriction
    a = poisson_2d_csr(8, dtype=np.float32)  # 64 rows, 2 levels
    hier = amg_setup(a, coarse_size=12, smoother=smoother, dtype=np.float32)
    assert len(hier.levels) >= 1
    m = _dense_m_inv(hier, a.rows)
    np.testing.assert_allclose(m, m.T, atol=2e-5 * np.abs(m).max())
    # and positive definite (eigenvalues of the symmetrized part > 0)
    w = np.linalg.eigvalsh(0.5 * (m + m.T).astype(np.float64))
    assert w.min() > 0


@pytest.mark.parametrize("smoother", ["jacobi", "chebyshev"])
def test_amg_pcg_poisson_converges_fast(smoother):
    n = 32  # 1024 unknowns
    a = poisson_2d_csr(n, dtype=np.float32)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(a.rows).astype(np.float32)

    hier = amg_setup(a, coarse_size=100, smoother=smoother, dtype=np.float32)
    res = jax.jit(
        lambda bb: amg_pcg_solve(a, bb, tol=1e-6, maxiter=60, hierarchy=hier)
    )(b)
    it_amg = int(res.iterations)
    x = np.asarray(res.x, dtype=np.float64)

    # converged to the right answer
    dense = a.to_dense().astype(np.float64)
    np.testing.assert_allclose(dense @ x, b, atol=5e-4)

    # and meaningfully faster than plain CG (mesh-size-independent-ish)
    res_cg = jax.jit(
        lambda bb: cg_solve(hier.levels[0].a_op, bb, tol=1e-6, maxiter=500)
    )(b)
    it_cg = int(res_cg.iterations)
    assert it_amg <= 25
    assert it_amg * 3 < it_cg, (it_amg, it_cg)


def test_amg_reused_hierarchy_multiple_rhs():
    a = poisson_2d_csr(16, dtype=np.float32)
    hier = amg_setup(a, coarse_size=40, dtype=np.float32)
    solve = jax.jit(
        lambda bb: pcg_solve(
            hier.levels[0].a_op, bb, hier.preconditioner(), tol=1e-6, maxiter=60
        )
    )
    dense = a.to_dense().astype(np.float64)
    rng = np.random.default_rng(5)
    for _ in range(2):
        b = rng.standard_normal(a.rows).astype(np.float32)
        x = np.asarray(solve(b).x, dtype=np.float64)
        np.testing.assert_allclose(dense @ x, b, atol=5e-4)


@pytest.mark.parametrize("smoother", ["jacobi", "chebyshev"])
def test_amg_block_pcg_multi_rhs(smoother):
    """(n, K) right-hand sides through ONE block V-cycle + SpMM per
    iteration (amg_pcg_solve auto-routes 2-D b to pcg_solve_multi)."""
    n, K = 24, 4
    a = poisson_2d_csr(n, dtype=np.float32)
    rng = np.random.default_rng(9)
    B = rng.standard_normal((n * n, K)).astype(np.float32)

    hier = amg_setup(a, coarse_size=80, smoother=smoother, dtype=np.float32)
    res = jax.jit(
        lambda bb: amg_pcg_solve(a, bb, tol=1e-6, maxiter=60, hierarchy=hier)
    )(B)
    assert res.x.shape == (n * n, K)
    assert res.residual_norm.shape == (K,)
    assert int(res.iterations) <= 25

    dense = a.to_dense().astype(np.float64)
    X = np.asarray(res.x, dtype=np.float64)
    for k in range(K):
        np.testing.assert_allclose(dense @ X[:, k], B[:, k], atol=5e-4)


def test_amg_block_vcycle_matches_per_column():
    """The block V-cycle is exactly K independent V-cycles (linearity +
    column independence of every stage)."""
    a = poisson_2d_csr(12, dtype=np.float32)
    hier = amg_setup(a, coarse_size=30, dtype=np.float32)
    rng = np.random.default_rng(13)
    R = rng.standard_normal((a.rows, 3)).astype(np.float32)
    blk = np.asarray(jax.jit(hier.vcycle)(jnp.asarray(R)))
    for k in range(3):
        one = np.asarray(jax.jit(hier.vcycle)(jnp.asarray(R[:, k])))
        np.testing.assert_allclose(blk[:, k], one, rtol=2e-4, atol=2e-5)


def test_amg_anisotropic_poisson_beats_jacobi_pcg():
    """Anisotropic 2-D Laplacian (eps=0.01 in y): the problem class where
    plain/Jacobi CG degrades; semicoarsening-by-strength keeps AMG fast."""
    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.solvers.cg import jacobi_preconditioner

    n, eps = 24, 0.01
    idx = lambda i, j: i * n + j
    r, c, v = [], [], []
    for i in range(n):
        for j in range(n):
            r.append(idx(i, j)); c.append(idx(i, j)); v.append(2 + 2 * eps)
            if i > 0: r.append(idx(i, j)); c.append(idx(i - 1, j)); v.append(-eps)
            if i < n - 1: r.append(idx(i, j)); c.append(idx(i + 1, j)); v.append(-eps)
            if j > 0: r.append(idx(i, j)); c.append(idx(i, j - 1)); v.append(-1.0)
            if j < n - 1: r.append(idx(i, j)); c.append(idx(i, j + 1)); v.append(-1.0)
    a = CsrMatrix.from_coo(n * n, n * n, np.array(r), np.array(c),
                           np.array(v, dtype=np.float32))
    rng = np.random.default_rng(7)
    b = rng.standard_normal(n * n).astype(np.float32)

    # strength threshold separates the strong (-1) from the weak (-eps) axis
    hier = amg_setup(a, theta=0.08, coarse_size=80, dtype=np.float32)
    res = jax.jit(
        lambda bb: amg_pcg_solve(a, bb, tol=1e-6, maxiter=80, hierarchy=hier)
    )(b)
    it_amg = int(res.iterations)
    np.testing.assert_allclose(
        a.to_dense().astype(np.float64) @ np.asarray(res.x, np.float64), b,
        atol=5e-4,
    )
    res_j = jax.jit(
        lambda bb: pcg_solve(
            hier.levels[0].a_op, bb, jacobi_preconditioner(a),
            tol=1e-6, maxiter=2000,
        )
    )(b)
    assert it_amg < 40
    assert it_amg * 4 < int(res_j.iterations), (it_amg, int(res_j.iterations))


def test_amg_diagonal_matrix_degenerates_gracefully():
    from sparse_matrix_tpu.formats.csr import CsrMatrix

    n = 600  # above coarse_size, but no strong connections -> no coarsening
    vals = np.linspace(1.0, 3.0, n).astype(np.float32)
    a = CsrMatrix.from_coo(n, n, np.arange(n), np.arange(n), vals)
    hier = amg_setup(a, coarse_size=400, dtype=np.float32)
    assert len(hier.levels) == 0  # aggregation found nothing to merge
    b = np.ones(n, dtype=np.float32)
    res = amg_pcg_solve(a, b, tol=1e-6, maxiter=20, hierarchy=hier)
    np.testing.assert_allclose(
        np.asarray(res.x) * vals, b, atol=1e-4
    )


def test_native_aggregation_matches_python_loop():
    """The native greedy passes must be bit-equal to the sequential Python
    loops they replaced (exact lex-first-MIS semantics, natural order)."""
    from sparse_matrix_tpu.native import aggregate_pass_native
    from sparse_matrix_tpu.solvers.amg import aggregate_strong, strength_graph
    from sparse_matrix_tpu.solvers import poisson_2d_csr
    from sparse_matrix_tpu.core import DokMatrix
    from sparse_matrix_tpu.formats import CsrMatrix

    if aggregate_pass_native(1, np.zeros(1, np.int64), np.zeros(0, np.int64),
                             np.full(0, -1, np.int64)) is None:
        import pytest
        pytest.skip("native runtime unavailable")

    def python_reference(n, so, si):
        agg = np.full(n, -1, dtype=np.int64)
        na = 0
        for i in range(n):
            if agg[i] >= 0:
                continue
            nb = si[so[i]:so[i + 1]]
            if nb.size and (agg[nb] >= 0).any():
                continue
            agg[nb] = na
            agg[i] = na
            na += 1
        un = agg < 0
        if un.any():
            deg = np.diff(so)
            edge_src = np.repeat(np.arange(n, dtype=np.int64), deg)
            emask = un[edge_src] & (agg[si] >= 0)
            if emask.any():
                src, tgt = edge_src[emask], agg[si[emask]]
                choice = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(choice, src, tgt)
                attach = choice < np.iinfo(np.int64).max
                agg[attach] = choice[attach]
        for i in np.flatnonzero(agg < 0):
            if agg[i] >= 0:
                continue
            nb = si[so[i]:so[i + 1]]
            grp = nb[agg[nb] < 0] if nb.size else nb
            agg[i] = na
            if grp.size:
                agg[grp] = na
            na += 1
        return agg, na

    rng = np.random.default_rng(5)
    cases = [poisson_2d_csr(24, dtype=np.float32)]
    for n, dens in ((97, 0.06), (200, 0.02), (64, 0.0)):
        d = (rng.random((n, n)) < dens) * rng.standard_normal((n, n))
        d = d + d.T + np.eye(n) * 4.0  # symmetric w/ diagonal
        cases.append(CsrMatrix.from_dok(DokMatrix.from_dense(d.astype(np.float64))))
    for m in cases:
        so, si = strength_graph(m)
        agg, na = aggregate_strong(m.rows, so, si)
        ref_agg, ref_na = python_reference(m.rows, so, si)
        assert na == ref_na
        np.testing.assert_array_equal(agg, ref_agg)
        assert (agg >= 0).all() and agg.max() == na - 1


def test_poisson_3d_and_amg():
    """7-point 3D Laplacian (built via the framework's kron): AMG-PCG
    converges in O(10) iterations where plain CG needs many more."""
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import amg_setup, poisson_3d_csr
    from sparse_matrix_tpu.solvers.cg import cg_solve, pcg_solve

    a = poisson_3d_csr(12, dtype=np.float32)  # 1728 unknowns
    assert a.rows == 12**3
    # spot-check the stencil: interior row has 7 entries, diag 6
    interior = 12 * 12 * 6 + 12 * 6 + 6
    lo, hi = int(a.offsets[interior]), int(a.offsets[interior + 1])
    assert hi - lo == 7
    d_pos = np.flatnonzero(a.indices[lo:hi].astype(np.int64) == interior)
    assert a.vals[lo:hi][d_pos[0]] == 6.0

    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.rows).astype(np.float32)
    op = SpmvOperator(a, dtype=np.float32)
    plain = cg_solve(op, b, tol=1e-5, maxiter=2000)
    hier = amg_setup(a, coarse_size=100, dtype=np.float32)
    res = pcg_solve(op, b, hier.preconditioner(), tol=1e-5, maxiter=200)
    assert int(res.iterations) <= 25
    assert int(res.iterations) * 2 < int(plain.iterations)
    x = np.asarray(res.x, dtype=np.float64)
    rid = a.row_ids()
    ax = np.zeros(a.rows)
    np.add.at(ax, rid, a.vals.astype(np.float64) * x[a.indices.astype(np.int64)])
    assert np.linalg.norm(ax - b) < 1e-4 * np.linalg.norm(b)


def test_amg_coarsening_save_load_roundtrip(tmp_path):
    """Hierarchy rebuilt from a saved coarsening solves identically and
    skips the coarsening work."""
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import (
        amg_coarsen,
        amg_setup,
        load_amg_coarsening,
        poisson_2d_csr,
        save_amg_coarsening,
    )
    from sparse_matrix_tpu.solvers.cg import pcg_solve

    a = poisson_2d_csr(24, dtype=np.float32)
    levels, coarse = amg_coarsen(a, coarse_size=60)
    p = tmp_path / "coarsening.npz"
    save_amg_coarsening(p, levels, coarse)
    l2, c2 = load_amg_coarsening(p)
    assert len(l2) == len(levels)
    for (a1, p1, d1, lam1), (a2, p2, d2, lam2) in zip(levels, l2):
        np.testing.assert_array_equal(a1.vals, a2.vals)
        np.testing.assert_array_equal(p1.indices, p2.indices)
        np.testing.assert_array_equal(d1, d2)
        assert lam1 == lam2

    h_fresh = amg_setup(a, coarse_size=60, dtype=np.float32)
    h_loaded = amg_setup(a, coarse_size=60, dtype=np.float32, coarsening=(l2, c2))
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.rows).astype(np.float32)
    op = SpmvOperator(a, dtype=np.float32)
    r1 = pcg_solve(op, b, h_fresh.preconditioner(), tol=1e-6, maxiter=100)
    r2 = pcg_solve(op, b, h_loaded.preconditioner(), tol=1e-6, maxiter=100)
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), rtol=1e-5, atol=1e-6)


def test_vcycle_params_matches_closure_form():
    """hier.vcycle_p(hier.as_pytree(), r) under jit-with-params == the
    closure vcycle; full PCG composition with params as arguments."""
    import jax

    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import amg_setup, poisson_2d_csr
    from sparse_matrix_tpu.solvers.cg import pcg_solve

    a = poisson_2d_csr(24, dtype=np.float32)
    hier = amg_setup(a, coarse_size=60, dtype=np.float32)
    params = hier.as_pytree()
    rng = np.random.default_rng(0)
    r = rng.standard_normal(a.rows).astype(np.float32)
    ref = np.asarray(hier.vcycle(r))
    y = np.asarray(jax.jit(lambda pp, rr: hier.vcycle_p(pp, rr))(params, r))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)

    op = hier.levels[0].a_op
    b = rng.standard_normal(a.rows).astype(np.float32)
    res = jax.jit(
        lambda pp, bb: pcg_solve(
            lambda v: op.apply(pp["levels"][0]["a"], v),
            bb,
            lambda rr: hier.vcycle_p(pp, rr),
            tol=1e-6, maxiter=100,
        )
    )(params, b)
    x = np.asarray(res.x, dtype=np.float64)
    assert np.linalg.norm(a.to_dense().astype(np.float64) @ x - b) < 1e-4 * np.linalg.norm(b)
    assert int(res.iterations) < 30


def test_native_strength_scale_transpose_parity():
    """The round-3 fused native analysis (spmx_amg_diag_abssum/strength_*,
    scale_rows, csr_transpose) against the numpy oracles."""
    from sparse_matrix_tpu.core import DokMatrix
    from sparse_matrix_tpu.formats import CsrMatrix
    from sparse_matrix_tpu.native import (
        amg_strength_native,
        csr_transpose_native,
        native_available,
        scale_rows_native,
    )
    from sparse_matrix_tpu.solvers.amg import (
        _diag_of,
        _lambda_max_dinv_a,
        _scale_rows,
        strength_graph,
    )

    if not native_available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    for dtype in (np.float64, np.float32):
        a = (rng.random((90, 90)) < 0.08) * rng.standard_normal((90, 90))
        a = a + a.T + 8.0 * np.eye(90)  # SPD-ish with signed off-diagonals
        a[5, 5] = 0.0  # exercise the missing-diagonal fallback
        m = CsrMatrix.from_dok(DokMatrix.from_dense(a.astype(dtype)), dtype=dtype)

        res = amg_strength_native(m.rows, m.offsets, m.indices, m.vals, 0.08)
        assert res is not None
        diag, abssum, so, si = res
        # numpy strength oracle (the pre-native vectorized implementation)
        n = m.rows
        rids = m.row_ids().astype(np.int64)
        cids = m.indices.astype(np.int64)
        vals = np.abs(m.vals.astype(np.float64))
        dref = np.zeros(n)
        on_diag = cids == rids
        dref[rids[on_diag]] = vals[on_diag]
        missing = dref == 0.0
        rowmax = np.zeros(n)
        np.maximum.at(rowmax, rids, vals)
        dref[missing] = np.where(rowmax[missing] > 0, rowmax[missing], 1.0)
        keep = (~on_diag) & (vals >= 0.08 * np.sqrt(dref[rids] * dref[cids]))
        offs_ref = np.zeros(n + 1, np.int64)
        offs_ref[1:] = np.bincount(rids[keep], minlength=n)
        np.cumsum(offs_ref, out=offs_ref)
        np.testing.assert_array_equal(so, offs_ref)
        np.testing.assert_array_equal(si, cids[keep])
        np.testing.assert_allclose(diag, _diag_of(m), rtol=1e-12)
        dinv = np.where(diag != 0, 1.0 / np.where(diag == 0, 1.0, diag), 1.0)
        np.testing.assert_allclose(
            float(np.max(abssum * np.abs(dinv))), _lambda_max_dinv_a(m, dinv),
            rtol=1e-6,
        )

        s = rng.random(m.rows) + 0.5
        sv = scale_rows_native(m.rows, m.offsets, m.vals, s)
        np.testing.assert_allclose(sv, _scale_rows(m, s).vals, rtol=1e-6)

        t = csr_transpose_native(m.rows, m.cols, m.offsets, m.indices, m.vals)
        assert t is not None
        mt = m.transpose()
        np.testing.assert_array_equal(t[0], mt.offsets)
        np.testing.assert_array_equal(t[1], mt.indices)
        np.testing.assert_array_equal(t[2], mt.vals)
        # the transpose route itself must equal the lexsort oracle
        ro = np.repeat(np.arange(m.rows, dtype=np.int64), np.diff(m.offsets))
        order = np.lexsort((ro, cids))
        np.testing.assert_array_equal(mt.indices.astype(np.int64), ro[order])
        np.testing.assert_allclose(mt.vals, m.vals[order])


def test_fused_prolongator_smoothing_parity(monkeypatch):
    """P = (I - w D^-1 A) P0 as one SpGEMM (the round-3 setup fusion) must
    match the union-merge subtraction path to fp-reassociation accuracy
    (same products, different summation order)."""
    import sparse_matrix_tpu.solvers.amg as amg_mod
    from sparse_matrix_tpu.solvers import poisson_2d_csr

    a = poisson_2d_csr(24, dtype=np.float64)
    lv_fused, c_fused = amg_mod.amg_coarsen(a)
    monkeypatch.setattr(amg_mod, "_jacobi_smoother_matrix", lambda *a, **k: None)
    lv_merge, c_merge = amg_mod.amg_coarsen(a)
    assert len(lv_fused) == len(lv_merge)
    for (af, pf, df, lf), (am, pm, dm, lm) in zip(lv_fused, lv_merge):
        assert pf.rows == pm.rows and pf.cols == pm.cols
        dense_f = pf.to_dense()
        dense_m = pm.to_dense()
        scale = max(1.0, np.abs(dense_m).max())
        np.testing.assert_allclose(dense_f / scale, dense_m / scale, atol=1e-12)
        np.testing.assert_allclose(df, dm)
        assert lf == pytest.approx(lm)
    np.testing.assert_allclose(c_fused.to_dense(), c_merge.to_dense(), atol=1e-10)


def test_sample_row_bands_preserves_offset_structure():
    """The dispatch sampler must keep element offsets c - r intact (a
    renumbering that drops them exploded a femlike BELL estimate's layer
    count 9 -> 36 and misrouted it to aligned)."""
    from sparse_matrix_tpu.formats.csr import sample_row_bands
    from sparse_matrix_tpu.solvers import poisson_2d_csr

    m = poisson_2d_csr(64, dtype=np.float32)  # 4096 rows, ~20k nnz
    sub, scale = sample_row_bands(m, target_nnz=4000)
    assert scale > 1.0
    full_o = set(
        (m.indices.astype(np.int64) - m.row_ids().astype(np.int64)).tolist()
    )
    sub_o = np.unique(
        sub.indices.astype(np.int64) - sub.row_ids().astype(np.int64)
    )
    # all sampled offsets are full offsets shifted by ONE global constant
    cands = set()
    for o in sub_o.tolist():
        cands = cands or {o - fo for fo in full_o}
        cands &= {o - fo for fo in full_o}
    assert cands, "sampled offsets are not a uniform shift of the originals"


def test_colmap_smoothed_fused_parity():
    """The fused (I - diag(ws) A) @ T native pass must be byte-identical
    to materializing the smoother matrix and running the plain colmap
    product (same per-term rounding), and correct (vs dense) on rows
    lacking an explicit diagonal."""
    from sparse_matrix_tpu.core import DokMatrix
    from sparse_matrix_tpu.formats import CsrMatrix
    from sparse_matrix_tpu.native import colmap_smoothed_native, colmap_spgemm_native
    from sparse_matrix_tpu.solvers import poisson_2d_csr
    from sparse_matrix_tpu.solvers.amg import (
        _jacobi_smoother_matrix,
        aggregate_strong,
        strength_graph,
        tentative_prolongator,
    )

    if colmap_smoothed_native(
        poisson_2d_csr(2, dtype=np.float32),
        np.ones(4),
        tentative_prolongator(np.zeros(4, np.int64), 1, dtype=np.float32),
    ) is None:
        import pytest
        pytest.skip("native runtime unavailable")

    for dtype in (np.float32, np.float64):
        a = poisson_2d_csr(20, dtype=dtype)
        so, si = strength_graph(a)
        agg, na = aggregate_strong(a.rows, so, si)
        t = tentative_prolongator(agg, na, dtype=dtype)
        ws = 0.7 / np.abs(a.vals).max() * (1.0 + 0.01 * np.arange(a.rows))
        s_mat = _jacobi_smoother_matrix(a, ws)
        want = colmap_spgemm_native(s_mat, t)
        got = colmap_smoothed_native(a, ws, t)
        assert got.rows == want.rows and got.cols == want.cols
        np.testing.assert_array_equal(got.offsets, want.offsets)
        np.testing.assert_array_equal(got.indices, want.indices)
        np.testing.assert_array_equal(got.vals, want.vals)  # byte-identical

    # no explicit diagonal in some rows: check against the dense oracle
    rng = np.random.default_rng(3)
    n = 24
    dense = (rng.random((n, n)) < 0.2) * rng.standard_normal((n, n))
    dense[np.arange(0, n, 3), np.arange(0, n, 3)] = 0.0  # kill some diagonals
    a = CsrMatrix.from_dok(DokMatrix.from_dense(dense))
    agg = rng.integers(0, 5, n)
    t = tentative_prolongator(agg.astype(np.int64), 5, dtype=np.float64)
    ws = rng.random(n)
    got = colmap_smoothed_native(a, ws, t)
    td = np.zeros((n, 5))
    rl = np.diff(t.offsets)
    td[np.flatnonzero(rl == 1), t.indices] = t.vals
    want = (np.eye(n) - np.diag(ws) @ np.where(dense != 0, dense, 0.0)) @ td
    np.testing.assert_allclose(got.to_dok().to_dense(), want, rtol=1e-12, atol=1e-13)
