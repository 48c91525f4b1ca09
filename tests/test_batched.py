"""Batched same-pattern small-system tests (ops/batched.py)."""

import numpy as np
import pytest

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops import BatchedEllOperator, batched_cg_solve
from sparse_matrix_tpu.solvers import poisson_2d_csr


def _pattern_and_vals(rng, n=60, dens=0.06, batch=5, spd=False):
    d = (rng.random((n, n)) < dens) * rng.standard_normal((n, n))
    if spd:
        d = (d + d.T) / 2
        np.fill_diagonal(d, np.abs(d).sum(axis=1) + 1.0)
    else:
        np.fill_diagonal(d, 1.0)  # keep a full diagonal in the pattern
    pat = CsrMatrix.from_dok(DokMatrix.from_dense(d.astype(np.float64)))
    base = pat.vals.astype(np.float64)
    vals = np.stack([base * (1.0 + 0.3 * rng.standard_normal(pat.nnz())) for _ in range(batch)])
    if spd:
        # keep each system SPD: symmetric scaling of the base SPD matrix
        vals = np.stack([base * s for s in (0.5 + rng.random(batch))])
    return pat, vals


@pytest.mark.parametrize("force_gather", [False, True])
def test_batched_apply_matches_per_system(force_gather):
    rng = np.random.default_rng(0)
    pat, vals = _pattern_and_vals(rng, n=60, batch=4)
    op = BatchedEllOperator(pat, vals, dtype=np.float32, force_gather=force_gather)
    assert op.use_onehot == (not force_gather)
    X = rng.standard_normal((4, pat.cols)).astype(np.float32)
    Y = np.asarray(op(X))
    for b in range(4):
        dense = CsrMatrix(
            pat.rows, pat.cols, vals[b], pat.indices, pat.offsets, is_sorted=True
        ).to_dense()
        np.testing.assert_allclose(Y[b], dense @ X[b], rtol=1e-5, atol=1e-5)


def test_batched_apply_block_rhs():
    rng = np.random.default_rng(1)
    pat, vals = _pattern_and_vals(rng, n=40, batch=3)
    op = BatchedEllOperator(pat, vals, dtype=np.float32)
    X = rng.standard_normal((3, pat.cols, 2)).astype(np.float32)
    Y = np.asarray(op(X))
    for b in range(3):
        dense = CsrMatrix(
            pat.rows, pat.cols, vals[b], pat.indices, pat.offsets, is_sorted=True
        ).to_dense()
        np.testing.assert_allclose(Y[b], dense @ X[b], rtol=1e-5, atol=1e-5)


def test_batched_rejects_wrong_vals_shape():
    rng = np.random.default_rng(2)
    pat, vals = _pattern_and_vals(rng)
    with pytest.raises(ValueError, match="vals must be"):
        BatchedEllOperator(pat, vals[:, :-1])


def test_batched_rectangular_pattern():
    rng = np.random.default_rng(3)
    d = (rng.random((30, 50)) < 0.1) * rng.standard_normal((30, 50))
    pat = CsrMatrix.from_dok(DokMatrix.from_dense(d.astype(np.float64)))
    vals = np.stack([pat.vals, pat.vals * 2.0])
    op = BatchedEllOperator(pat, vals, dtype=np.float32)
    X = np.broadcast_to(
        rng.standard_normal(50).astype(np.float32), (2, 50)
    ).copy()  # same x in both lanes: scaling of A must scale y
    Y = np.asarray(op(X))
    np.testing.assert_allclose(Y[1], 2 * Y[0], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(Y[0], d.astype(np.float32) @ X[0], rtol=1e-5, atol=1e-5)


def test_batched_cg_solves_every_lane():
    rng = np.random.default_rng(4)
    pat, vals = _pattern_and_vals(rng, n=80, batch=6, spd=True)
    op = BatchedEllOperator(pat, vals, dtype=np.float32)
    B = rng.standard_normal((6, pat.rows)).astype(np.float32)
    res = batched_cg_solve(op, B, tol=1e-6, maxiter=500)
    X = np.asarray(res.x)
    its = np.asarray(res.iterations)
    for b in range(6):
        dense = CsrMatrix(
            pat.rows, pat.cols, vals[b], pat.indices, pat.offsets, is_sorted=True
        ).to_dense()
        r = np.linalg.norm(dense @ X[b] - B[b])
        assert r < 1e-4 * np.linalg.norm(B[b]), (b, r)
    # lanes scale the same base operator: iteration counts must differ only
    # mildly, and every lane must have actually iterated
    assert (its > 0).all()


def test_batched_cg_zero_rhs_lane():
    """A zero-rhs lane converges instantly (0 iterations) without
    disturbing the others."""
    rng = np.random.default_rng(5)
    pat, vals = _pattern_and_vals(rng, n=40, batch=3, spd=True)
    op = BatchedEllOperator(pat, vals, dtype=np.float32)
    B = rng.standard_normal((3, pat.rows)).astype(np.float32)
    B[1] = 0.0
    res = batched_cg_solve(op, B, tol=1e-6, maxiter=300)
    assert int(np.asarray(res.iterations)[1]) == 0
    assert np.abs(np.asarray(res.x)[1]).max() == 0.0
    dense0 = CsrMatrix(pat.rows, pat.cols, vals[0], pat.indices, pat.offsets, is_sorted=True).to_dense()
    assert np.linalg.norm(dense0 @ np.asarray(res.x)[0] - B[0]) < 1e-4 * np.linalg.norm(B[0])


def test_batched_poisson_parity_with_operator():
    """Batched apply on B identical Poisson value sets == single operator."""
    from sparse_matrix_tpu.ops.operator import SpmvOperator

    p = poisson_2d_csr(12, dtype=np.float32)
    vals = np.stack([p.vals] * 3)
    op = BatchedEllOperator(p, vals, dtype=np.float32)
    rng = np.random.default_rng(6)
    X = rng.standard_normal((3, p.cols)).astype(np.float32)
    Y = np.asarray(op(X))
    single = SpmvOperator(p, dtype=np.float32)
    for b in range(3):
        np.testing.assert_allclose(Y[b], np.asarray(single(X[b])), rtol=1e-5, atol=1e-5)
