"""Exact sparse Cholesky (up-looking simplicial, native + Python parity)."""

import numpy as np
import pytest

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.solvers import chol, chol_solve, poisson_2d_csr, spsolve_chol
from sparse_matrix_tpu.solvers.cholesky import _chol_python


def _spd_csr(rng, n, dens=0.12):
    d = (rng.random((n, n)) < dens) * rng.standard_normal((n, n))
    d = (d + d.T) / 2
    np.fill_diagonal(d, np.abs(d).sum(axis=1) + 1.0)
    return CsrMatrix.from_dok(DokMatrix.from_dense(d)), d


def test_chol_reconstructs_exactly():
    """Unlike IC(0), the filled factor reproduces A to rounding."""
    rng = np.random.default_rng(0)
    for n in (5, 37, 120):
        a, d = _spd_csr(rng, n)
        for reorder in ("natural", "rcm"):
            f = chol(a, reorder=reorder)
            ld = f.l.to_dense()
            dp = d if f.perm is None else d[np.ix_(f.perm, f.perm)]
            np.testing.assert_allclose(ld @ ld.T, dp, rtol=1e-12, atol=1e-12)
            np.testing.assert_allclose(f.u.to_dense(), ld.T, rtol=0, atol=0)


def test_chol_solve_exact():
    rng = np.random.default_rng(1)
    a, d = _spd_csr(rng, 90)
    b = rng.standard_normal(90)
    x = chol_solve(chol(a), b)
    np.testing.assert_allclose(d @ x, b, rtol=1e-11, atol=1e-11)
    # block RHS
    B = rng.standard_normal((90, 3))
    X = chol_solve(chol(a), B)
    np.testing.assert_allclose(d @ X, B, rtol=1e-11, atol=1e-11)


def test_chol_python_fallback_bit_parity():
    """The Python fallback runs the SAME algorithm as the native kernel."""
    from sparse_matrix_tpu.native import chol_native

    rng = np.random.default_rng(2)
    a, _ = _spd_csr(rng, 60)
    vals = a.vals.astype(np.float64)
    got = _chol_python(a.rows, a.offsets, a.indices.astype(np.int64), vals)
    want = chol_native(a.rows, a.offsets, a.indices, vals)
    if want is None:
        pytest.skip("native runtime unavailable")
    np.testing.assert_array_equal(got[0], want[0])  # identical pattern
    np.testing.assert_array_equal(got[1], want[1])
    # values: same algorithm, but -O3 -march=native contracts the
    # d -= lki*lki updates into FMAs — equal to a few ulps, not bits
    np.testing.assert_allclose(got[2], want[2], rtol=1e-13, atol=1e-15)


def test_chol_not_spd_raises():
    d = np.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    with pytest.raises(ValueError, match="non-positive pivot"):
        chol(a, reorder="natural")
    with pytest.raises(ValueError, match="square"):
        chol(CsrMatrix.from_dok(DokMatrix.from_dense(np.ones((2, 3)))))


def test_chol_poisson_rcm_fill_and_solve():
    """RCM confines fill to the band; solve is exact at 64^2."""
    p = poisson_2d_csr(64, dtype=np.float64)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(p.rows)
    f = chol(p)
    assert f.l.nnz() < 15 * p.nnz()  # banded fill, not dense blowup
    x = chol_solve(f, b)
    rid = p.row_ids()
    ax = np.zeros(p.rows)
    np.add.at(ax, rid, p.vals * x[p.indices.astype(np.int64)])
    np.testing.assert_allclose(ax, b, rtol=1e-12, atol=1e-12)


def test_solve_method_direct():
    from sparse_matrix_tpu.solvers import solve

    rng = np.random.default_rng(4)
    a, d = _spd_csr(rng, 70)
    b = rng.standard_normal(70)
    res = solve(a, b, method="direct")
    assert float(res.residual_norm) < 1e-10 * np.linalg.norm(b) + 1e-12
    np.testing.assert_allclose(d @ np.asarray(res.x), b, rtol=1e-10, atol=1e-10)
    with pytest.raises(ValueError, match="unknown method"):
        solve(a, b, method="qr")


def test_spsolve_chol_matches_dense():
    rng = np.random.default_rng(5)
    a, d = _spd_csr(rng, 50)
    b = rng.standard_normal(50)
    np.testing.assert_allclose(
        spsolve_chol(a, b), np.linalg.solve(d, b), rtol=1e-9, atol=1e-11
    )


def test_ldl_indefinite_exact():
    """LDL^T factors a genuinely indefinite shifted operator exactly
    (the shift-invert use case Cholesky cannot touch)."""
    from sparse_matrix_tpu.solvers import ldl, ldl_solve
    from sparse_matrix_tpu.formats.construct import eye as speye

    rng = np.random.default_rng(7)
    p = poisson_2d_csr(16, dtype=np.float64)  # eigs in (0, 8)
    sigma = 3.7  # mid-spectrum (not 4.0: that zeroes the stencil diagonal)
    shift = speye(p.rows, dtype=np.float64)
    shift.vals[:] = -sigma
    sh = p + shift
    dense = sh.to_dense()
    ev = np.linalg.eigvalsh(dense)
    assert ev.min() < 0 < ev.max()  # really indefinite
    with pytest.raises(ValueError, match="non-positive pivot"):
        chol(sh)
    f = ldl(sh)
    ld = f.l.to_dense()
    dp = dense[np.ix_(f.perm, f.perm)]
    np.testing.assert_allclose(ld @ np.diag(f.d) @ ld.T, dp, rtol=1e-9, atol=1e-9)
    assert (f.d < 0).any() and (f.d > 0).any()  # inertia shows
    b = rng.standard_normal(p.rows)
    x = ldl_solve(f, b)
    np.testing.assert_allclose(dense @ x, b, rtol=1e-8, atol=1e-8)


def test_ldl_python_fallback_parity():
    from sparse_matrix_tpu.native import ldl_native
    from sparse_matrix_tpu.solvers.cholesky import _ldl_python

    rng = np.random.default_rng(8)
    a, _ = _spd_csr(rng, 50)
    vals = a.vals.astype(np.float64)
    want = ldl_native(a.rows, a.offsets, a.indices, vals)
    if want is None:
        pytest.skip("native runtime unavailable")
    got = _ldl_python(a.rows, a.offsets, a.indices.astype(np.int64), vals)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_allclose(got[2], want[2], rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(got[3], want[3], rtol=1e-13, atol=1e-15)


def test_ldl_matches_chol_on_spd():
    """On SPD input, L_chol = L_ldl sqrt(D)."""
    from sparse_matrix_tpu.solvers import ldl

    rng = np.random.default_rng(9)
    a, _ = _spd_csr(rng, 40)
    fc = chol(a, reorder="natural")
    fl = ldl(a, reorder="natural")
    assert (fl.d > 0).all()
    np.testing.assert_allclose(
        fl.l.to_dense() @ np.diag(np.sqrt(fl.d)), fc.l.to_dense(),
        rtol=1e-10, atol=1e-12,
    )


def test_lu_unsymmetric_exact():
    """Partial-pivoted LU solves unsymmetric systems exactly — incl. a
    weak/zero diagonal where the no-pivot factorizations break."""
    from sparse_matrix_tpu.solvers import lu, lu_solve

    rng = np.random.default_rng(11)
    for n in (7, 50, 130):
        d = (rng.random((n, n)) < 0.15) * rng.standard_normal((n, n))
        d += np.diag(rng.standard_normal(n) * 0.05)
        d[0, 0] = 0.0  # force a pivot swap at the first column
        while abs(np.linalg.det(d)) < 1e-8:
            d += np.eye(n) * 0.3
        a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
        b = rng.standard_normal(n)
        for reorder in ("natural", "rcm"):
            x = lu_solve(lu(a, reorder=reorder), b)
            np.testing.assert_allclose(d @ x, b, rtol=1e-9, atol=1e-9)


def test_lu_python_fallback_parity():
    from sparse_matrix_tpu.native import lu_native
    from sparse_matrix_tpu.solvers.cholesky import _csc_of_columns, _lu_python

    rng = np.random.default_rng(12)
    n = 40
    d = (rng.random((n, n)) < 0.2) * rng.standard_normal((n, n))
    d += np.diag(np.sign(rng.standard_normal(n)) * 0.2)
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    bp, bi, bx = _csc_of_columns(a, None)
    want = lu_native(n, bp, bi, bx.astype(np.float64))
    if want is None:
        pytest.skip("native runtime unavailable")
    got = _lu_python(n, bp, bi, bx.astype(np.float64))
    for g, w in zip(got, want):
        if g.dtype.kind == "i":
            np.testing.assert_array_equal(g, w)  # pattern + pivots exact
        else:
            # -O3 FMA contraction compounds through elimination chains
            np.testing.assert_allclose(g, w, rtol=1e-9, atol=1e-12)


def test_lu_singular_raises():
    from sparse_matrix_tpu.solvers import lu

    d = np.array([[1.0, 2.0, 0.0], [2.0, 4.0, 0.0], [0.0, 0.0, 3.0]])  # rank 2
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    with pytest.raises(ValueError, match="singular"):
        lu(a, reorder="natural")


def test_solve_method_direct_unsymmetric():
    from sparse_matrix_tpu.solvers import solve

    rng = np.random.default_rng(13)
    n = 80
    d = (rng.random((n, n)) < 0.1) * rng.standard_normal((n, n))
    d += np.diag(rng.standard_normal(n) * 0.1)
    while abs(np.linalg.det(d)) < 1e-8:
        d += np.eye(n) * 0.3
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    b = rng.standard_normal(n)
    res = solve(a, b, method="direct")
    np.testing.assert_allclose(d @ np.asarray(res.x), b, rtol=1e-9, atol=1e-9)


def test_lstsq_method_direct():
    """Normal equations via SpGEMM + exact Cholesky match dense lstsq on
    a well-conditioned tall system."""
    from sparse_matrix_tpu.solvers import lstsq

    rng = np.random.default_rng(14)
    m, n = 120, 40
    d = (rng.random((m, n)) < 0.3) * rng.standard_normal((m, n))
    d[:n] += np.eye(n)  # full column rank
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    b = rng.standard_normal(m)
    res = lstsq(a, b, method="direct")
    want, *_ = np.linalg.lstsq(d, b, rcond=None)
    np.testing.assert_allclose(res.x, want, rtol=1e-8, atol=1e-9)
    # result shape matches the LSQR path (same attributes)
    assert float(res.atr_norm) < 1e-8


def test_solve_method_direct_block_rhs():
    """Review finding: solve(method='direct') must accept (n, K) blocks
    like every other path (the residual is Frobenius over the block)."""
    from sparse_matrix_tpu.solvers import solve

    rng = np.random.default_rng(15)
    a, d = _spd_csr(rng, 30)
    B = rng.standard_normal((30, 3))
    res = solve(a, B, method="direct")
    np.testing.assert_allclose(d @ np.asarray(res.x), B, rtol=1e-9, atol=1e-9)
    assert float(res.residual_norm) < 1e-9


def test_factorizations_of_diagonal_matrix():
    # round-4 regression: a pure-diagonal input has an EMPTY strict
    # factor, but the native/python factor buffers are min-1 allocated;
    # the consumers must trim to lp[-1] or downstream from_coo dies with
    # mismatched key shapes.
    import numpy as np

    from sparse_matrix_tpu.formats.construct import diags
    from sparse_matrix_tpu.solvers.cholesky import (
        chol, chol_solve, ldl, ldl_solve, lu, lu_solve,
    )

    d = np.array([2.0, 1.0, 3.0, 5.0, 4.0, 7.0, 6.0, 9.0])
    A = diags([d], [0], shape=(8, 8), dtype=np.float64)
    b = np.arange(1.0, 9.0)
    for fac, solve in ((chol, chol_solve), (ldl, ldl_solve), (lu, lu_solve)):
        f = fac(A)
        np.testing.assert_allclose(solve(f, b), b / d, rtol=1e-12)
