"""Hypothesis property tests for the round-3 surfaces: ILU(0)/trisolve,
all-format operator matmat, and construction utilities — the same
commuting-diagram discipline as the core suite (SURVEY §4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix, diags, eye, kron


@st.composite
def spd_csr(draw, max_n=24):
    """Small strictly-diagonally-dominant symmetric matrix (SPD)."""
    n = draw(st.integers(2, max_n))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    dens = draw(st.floats(0.05, 0.5))
    d = (rng.random((n, n)) < dens) * rng.standard_normal((n, n))
    d = (d + d.T) / 2
    np.fill_diagonal(d, np.abs(d).sum(axis=1) + 1.0)
    return CsrMatrix.from_dok(DokMatrix.from_dense(d)), d


@settings(max_examples=40, deadline=None)
@given(spd_csr())
def test_ilu0_reconstruction_property(case):
    """ILU(0) on a dominant SPD matrix: L@U matches A ON THE PATTERN
    (the defining IC/ILU(0) property) and trisolves invert the factors."""
    from sparse_matrix_tpu.solvers.ilu import ilu0, trisolve_host

    a, d = case
    f = ilu0(a)
    ld, ud = f.l.to_dense(), f.u.to_dense()
    prod = ld @ ud
    mask = d != 0
    np.testing.assert_allclose(prod[mask], d[mask], rtol=1e-8, atol=1e-10)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.rows)
    y = trisolve_host(f.l, b, lower=True, unit=True)
    np.testing.assert_allclose(ld @ y, b, rtol=1e-8, atol=1e-9)
    x = trisolve_host(f.u, y, lower=False)
    np.testing.assert_allclose(ud @ x, y, rtol=1e-7, atol=1e-8)


@settings(max_examples=25, deadline=None)
@given(spd_csr(max_n=20), st.integers(1, 4))
def test_operator_matmat_commutes_all_formats(case, k):
    """matmat through every forceable format == dense @ X."""
    from sparse_matrix_tpu.ops.operator import SpmvOperator

    a, d = case
    rng = np.random.default_rng(1)
    X = rng.standard_normal((a.cols, k)).astype(np.float32)
    ref = d.astype(np.float32) @ X
    scale = max(1.0, np.abs(ref).max())
    for force in (None, "ell", "lanepack"):
        op = SpmvOperator(a, dtype=np.float32, force=force)
        Y = np.asarray(op.matmat(X))
        np.testing.assert_allclose(Y / scale, ref / scale, atol=5e-5, err_msg=str(force))


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 6), st.integers(1, 6), st.integers(0, 2**31 - 1))
def test_kron_mixed_product_property(na, nb, seed):
    """(A (x) B) @ (C (x) D) == (A@C) (x) (B@D) — the defining identity,
    checked through the framework's own SpGEMM."""
    rng = np.random.default_rng(seed)

    def rnd(n, m):
        d = (rng.random((n, m)) < 0.6) * rng.standard_normal((n, m))
        return CsrMatrix.from_dok(DokMatrix.from_dense(d))

    a, c = rnd(na, nb), rnd(nb, na)
    b, d = rnd(2, 3), rnd(3, 2)
    lhs = kron(a, b) @ kron(c, d)
    rhs = kron(a @ c, b @ d)
    np.testing.assert_allclose(lhs.to_dense(), rhs.to_dense(), atol=1e-10)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 8), st.integers(-8, 8))
def test_eye_diags_agree(n, k):
    np.testing.assert_array_equal(
        eye(n, k=k).to_dense(), diags([1.0], [k], shape=(n, n)).to_dense()
    )
