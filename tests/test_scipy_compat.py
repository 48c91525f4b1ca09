"""The scipy-shaped alias namespace (sparse_matrix_tpu.sparse).

Differential tests against scipy itself wherever scipy implements the same
call; structure/oracle tests elsewhere. The point of the namespace is
switching cost: each test writes the call the way a scipy user would.
"""

import numpy as np
import pytest

import sparse_matrix_tpu.sparse as sp
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.verify.differential import scipy_available

needs_scipy = pytest.mark.skipif(not scipy_available(), reason="scipy missing")


def _rand(m, n, density=0.08, seed=0):
    return sp.random(m, n, density=density, random_state=seed)


# ---------------------------------------------------------------- formats --

def test_csr_matrix_from_dense_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.standard_normal((7, 5)) * (rng.random((7, 5)) < 0.4)
    a = sp.csr_matrix(d)
    np.testing.assert_array_equal(a.toarray(), d)
    assert a.getnnz() == np.count_nonzero(d)


def test_csr_matrix_from_coo_sums_duplicates():
    data = [1.0, 2.0, 3.0]
    row = [0, 0, 1]
    col = [1, 1, 0]
    a = sp.csr_matrix((data, (row, col)), shape=(2, 2))
    np.testing.assert_array_equal(a.toarray(), [[0.0, 3.0], [3.0, 0.0]])


def test_csr_matrix_from_csr_arrays():
    indptr = np.array([0, 2, 3])
    indices = np.array([0, 2, 1])
    data = np.array([1.0, 2.0, 3.0])
    a = sp.csr_matrix((data, indices, indptr), shape=(2, 3))
    np.testing.assert_array_equal(
        a.toarray(), [[1.0, 0.0, 2.0], [0.0, 3.0, 0.0]])
    assert a.is_sorted


def test_csr_matrix_empty_shape_form():
    a = sp.csr_matrix((3, 4))
    assert a.shape == (3, 4) and a.nnz() == 0


@needs_scipy
def test_csr_matrix_from_scipy():
    import scipy.sparse as ss

    s = ss.random(9, 6, density=0.3, random_state=1, format="csc")
    a = sp.csr_matrix(s)
    np.testing.assert_allclose(a.toarray(), s.toarray())


def test_random_requires_random_state():
    with pytest.raises(ValueError, match="random_state"):
        sp.random(4, 4, density=0.5)


@needs_scipy
def test_spdiags_matches_scipy():
    import scipy.sparse as ss

    data = np.arange(12, dtype=np.float64).reshape(3, 4) + 1
    offs = [-1, 0, 2]
    ours = sp.spdiags(data, offs, 4, 4)
    theirs = ss.spdiags(data, offs, 4, 4)
    np.testing.assert_array_equal(ours.toarray(), theirs.toarray())


@needs_scipy
def test_kronsum_matches_scipy():
    import scipy.sparse as ss

    a = _rand(4, 4, 0.5, seed=2)
    b = _rand(3, 3, 0.5, seed=3)
    theirs = ss.kronsum(a.to_scipy(), b.to_scipy())
    np.testing.assert_allclose(sp.kronsum(a, b).toarray(), theirs.toarray())


def test_diags_array_scalar_offset():
    a = sp.diags_array([1.0, 2.0, 3.0], offsets=1, shape=(4, 4))
    assert a.shape == (4, 4)
    np.testing.assert_array_equal(a.diagonal(1), [1.0, 2.0, 3.0])


def test_issparse_predicates():
    a = sp.eye(3)
    assert sp.issparse(a) and sp.isspmatrix_csr(a)
    assert not sp.issparse(np.eye(3))


# -------------------------------------------- CsrMatrix scipy-alias surface

def test_alias_methods_match_dense():
    rng = np.random.default_rng(4)
    d = rng.standard_normal((6, 6)) * (rng.random((6, 6)) < 0.5)
    a = sp.csr_matrix(d)
    np.testing.assert_array_equal(a.T.toarray(), d.T)
    np.testing.assert_allclose(a.diagonal(), np.diag(d))
    np.testing.assert_allclose(a.diagonal(-2), np.diag(d, -2))
    np.testing.assert_allclose(a.sum(), d.sum())
    np.testing.assert_allclose(a.sum(axis=0), d.sum(axis=0))
    np.testing.assert_allclose(a.sum(axis=1), d.sum(axis=1))
    x = rng.standard_normal(6)
    np.testing.assert_allclose(a.dot(x), d @ x, rtol=1e-12)
    blk = rng.standard_normal((6, 3))
    np.testing.assert_allclose(a.dot(blk), d @ blk, rtol=1e-12)
    assert a.astype(np.float32).vals.dtype == np.float32
    assert a.copy() == a and a.copy() is not a


def test_multiply_intersection_semantics():
    a = sp.csr_matrix(np.array([[1.0, 2.0], [0.0, 3.0]]))
    b = sp.csr_matrix(np.array([[5.0, 0.0], [7.0, 11.0]]))
    c = a.multiply(b)
    np.testing.assert_array_equal(c.toarray(), [[5.0, 0.0], [0.0, 33.0]])
    # intersection pattern only: no explicit zeros from one-sided entries
    assert c.nnz() == 2


# ----------------------------------------------------------------- linalg --

def _spd(n=64, seed=5):
    # strictly diagonally dominant => SPD
    a = _rand(n, n, 0.05, seed=seed)
    at = a.transpose()
    s = a + at
    dense_rowsum = np.abs(s.toarray()).sum(axis=1)
    return s + sp.diags([dense_rowsum + 1.0], [0], shape=(n, n))


def test_cg_tuple_and_convergence():
    from sparse_matrix_tpu.sparse.linalg import cg

    a = _spd()
    b = np.ones(a.rows, np.float32)
    x, info = cg(a, b, rtol=1e-6)
    assert info == 0
    r = a.toarray() @ x - b
    assert np.linalg.norm(r) <= 1e-5 * np.linalg.norm(b) * 10


def test_cg_with_M_preconditioner():
    from sparse_matrix_tpu.sparse.linalg import cg

    a = _spd()
    d = a.diagonal()
    m = sp.diags([1.0 / d], [0], shape=a.shape)
    b = np.ones(a.rows, np.float32)
    x, info = cg(a, b, rtol=1e-6, M=m)
    assert info == 0
    assert np.linalg.norm(a.toarray() @ x - b) <= 1e-4


def test_bicgstab_gmres_on_unsymmetric():
    from sparse_matrix_tpu.sparse.linalg import bicgstab, gmres

    n = 48
    a = _spd(n, seed=6) + sp.random(n, n, 0.03, random_state=7)
    b = np.ones(n, np.float32)
    for solver in (bicgstab, gmres):
        x, info = solver(a, b, rtol=1e-6)
        assert info == 0, solver.__name__
        assert np.linalg.norm(a.toarray() @ x - b) <= 1e-3, solver.__name__


def test_minres_indefinite():
    from sparse_matrix_tpu.sparse.linalg import minres

    n = 32
    a = _spd(n, seed=8)
    a = a + sp.diags([-3.0 * np.ones(n)], [0], shape=(n, n))  # shift: indefinite
    b = np.ones(n, np.float32)
    x, info = minres(a, b, rtol=1e-6)
    assert np.linalg.norm(a.toarray() @ x - b) <= 1e-3


def test_lsqr_lsmr_tuples():
    from sparse_matrix_tpu.sparse.linalg import lsmr, lsqr

    a = _rand(40, 24, 0.2, seed=9)
    b = np.ones(40, np.float32)
    out = lsqr(a, b)
    assert len(out) == 10
    x = out[0]
    # normal equations residual small
    d = a.toarray()
    assert np.linalg.norm(d.T @ (d @ x - b)) <= 1e-2
    out2 = lsmr(a, b)
    assert len(out2) == 8
    assert np.linalg.norm(d.T @ (d @ out2[0] - b)) <= 1e-2


def test_eigsh_smallest_matches_dense():
    from sparse_matrix_tpu.sparse.linalg import eigsh

    a = _spd(48, seed=10)
    vals, vecs = eigsh(a, k=3, which="SA", maxiter=800, tol=1e-6)
    dense_vals = np.linalg.eigvalsh(a.toarray())
    np.testing.assert_allclose(vals, dense_vals[:3], rtol=2e-3)
    assert vals[0] <= vals[1] <= vals[2]
    assert vecs.shape == (48, 3)


def test_eigs_modulus_matches_dense():
    from sparse_matrix_tpu.sparse.linalg import eigs

    n = 40
    a = _spd(n, seed=11) + sp.random(n, n, 0.02, random_state=12)
    vals, vecs = eigs(a, k=2)
    dense = np.linalg.eigvals(a.toarray())
    top = dense[np.argsort(-np.abs(dense))][:2]
    np.testing.assert_allclose(
        np.sort(np.abs(vals)), np.sort(np.abs(top)), rtol=1e-2)


def test_svds_ascending_scipy_order():
    from sparse_matrix_tpu.sparse.linalg import svds

    a = _rand(36, 20, 0.25, seed=13)
    u, s, vt = svds(a, k=3)
    assert s[0] <= s[1] <= s[2]
    dense_s = np.linalg.svd(a.toarray(), compute_uv=False)
    np.testing.assert_allclose(s, dense_s[:3][::-1], rtol=2e-3)
    np.testing.assert_allclose(
        u * s @ vt,
        (u * s) @ vt, rtol=1e-5)  # shape sanity (m,k)@(k,n)
    recon3 = (u * s) @ vt
    # best rank-3 approximation error matches dense truth
    err = np.linalg.norm(a.toarray() - recon3)
    base = np.linalg.norm(np.sort(dense_s)[:-3])
    assert err <= base * 1.05 + 1e-5


@needs_scipy
def test_spsolve_matches_scipy():
    import scipy.sparse.linalg as sla

    from sparse_matrix_tpu.sparse.linalg import spsolve

    a = _spd(32, seed=14)
    b = np.arange(32, dtype=np.float64)
    ours = spsolve(a, b, method="direct")
    theirs = sla.spsolve(a.to_scipy().tocsc(), b)
    np.testing.assert_allclose(np.asarray(ours.x if hasattr(ours, "x") else ours),
                               theirs, rtol=1e-6, atol=1e-8)


def test_splu_and_inv():
    from sparse_matrix_tpu.sparse.linalg import inv, splu

    a = _spd(24, seed=15)
    f = splu(a)
    b = np.ones(24)
    x = f.solve(b)
    np.testing.assert_allclose(a.toarray() @ x, b, atol=1e-8)
    ainv = inv(a)
    np.testing.assert_allclose(ainv.toarray() @ a.toarray(), np.eye(24),
                               atol=1e-8)


@needs_scipy
def test_expm_matches_scipy_dense():
    import scipy.linalg as sl

    from sparse_matrix_tpu.sparse.linalg import expm

    a = _rand(12, 12, 0.3, seed=16)
    ours = expm(a).toarray()
    theirs = sl.expm(a.toarray())
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_expm_cap():
    from sparse_matrix_tpu.sparse.linalg import expm

    with pytest.raises(ValueError, match="capped"):
        expm(sp.eye(4096))


def test_expm_multiply_action():
    from sparse_matrix_tpu.sparse.linalg import expm_multiply

    a = _rand(20, 20, 0.2, seed=17)
    b = np.ones(20, np.float32)
    y = expm_multiply(a, b)
    if scipy_available():
        import scipy.linalg as sl

        np.testing.assert_allclose(y, sl.expm(a.toarray()) @ b, rtol=1e-3,
                                   atol=1e-4)


def test_onenormest_exactish():
    from sparse_matrix_tpu.sparse.linalg import onenormest

    a = _spd(30, seed=18)
    est = onenormest(a)
    true = np.abs(a.toarray()).sum(axis=0).max()
    assert 0.3 * true <= est <= true * 1.0001


def test_facade_dtype_policy_accepts_float64():
    # Regression (VERDICT r4 weak #1b): the planned operators refuse silent
    # f64->f32 downcasts, but scipy-compat entry points must cast to the
    # plan dtype THEMSELVES — scipy's default dtype is float64, so every
    # facade that builds an operator from user input has to survive f64
    # vectors. onenormest was the one that regressed; aslinearoperator and
    # the krylov facades share the same _f32call policy now.
    from sparse_matrix_tpu.sparse.linalg import aslinearoperator, cg, gmres, lsqr

    a = _spd(24, seed=3)
    b64 = np.ones(24, np.float64)
    x, info = cg(a, b64)
    assert info == 0
    x, info = gmres(a, b64)
    assert info == 0
    out = lsqr(a, b64)
    np.testing.assert_allclose(
        np.asarray(a.toarray(), np.float64) @ np.asarray(out[0], np.float64),
        b64, rtol=1e-3, atol=1e-3)
    lo = aslinearoperator(a)
    y = np.asarray(lo.matvec(b64))
    np.testing.assert_allclose(y, a.toarray() @ np.ones(24, np.float32),
                               rtol=1e-5, atol=1e-5)
    yr = np.asarray(lo.rmatvec(b64))
    np.testing.assert_allclose(yr, a.toarray().T @ np.ones(24, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_linear_operator_cg():
    from sparse_matrix_tpu.sparse.linalg import LinearOperator, cg

    n = 32
    d = np.linspace(1.0, 4.0, n).astype(np.float32)
    op = LinearOperator((n, n), lambda x: d * x)
    b = np.ones(n, np.float32)
    x, info = cg(op, b, rtol=1e-6)
    assert info == 0
    np.testing.assert_allclose(np.asarray(x), 1.0 / d, rtol=1e-4)


def test_aslinearoperator_shapes():
    from sparse_matrix_tpu.sparse.linalg import aslinearoperator

    a = _rand(10, 6, 0.4, seed=19)
    op = aslinearoperator(a)
    assert op.shape == (10, 6)
    x = np.ones(6, np.float32)
    np.testing.assert_allclose(np.asarray(op.matvec(x)),
                               a.toarray() @ x, rtol=1e-5)
    y = np.ones(10, np.float32)
    np.testing.assert_allclose(np.asarray(op.rmatvec(y)),
                               a.toarray().T @ y, rtol=1e-5)
    assert op.T.shape == (6, 10)


def test_norm_and_matrix_power_exports():
    from sparse_matrix_tpu.sparse.linalg import matrix_power, norm

    a = sp.eye(5) + sp.eye(5, k=1)
    assert norm(a, 1) == 2.0
    p = matrix_power(a, 2)
    np.testing.assert_array_equal(
        p.toarray(), np.linalg.matrix_power(a.toarray(), 2))


# ---------------------------------------------------------------- csgraph --

@needs_scipy
def test_csgraph_accepts_scipy_and_dense():
    import scipy.sparse as ss
    import scipy.sparse.csgraph as scg

    from sparse_matrix_tpu.sparse import csgraph as cs

    g = ss.random(25, 25, density=0.15, random_state=20)
    g = ss.triu(g, 1) + ss.triu(g, 1).T
    ncomp_ours, labels_ours = cs.connected_components(g, directed=False)
    ncomp_sp, labels_sp = scg.connected_components(g, directed=False)
    assert ncomp_ours == ncomp_sp

    dense = g.toarray()
    dist_ours = cs.dijkstra(dense, directed=False, indices=0)
    dist_sp = scg.dijkstra(g, directed=False, indices=0)
    np.testing.assert_allclose(dist_ours, dist_sp, rtol=1e-6)


def test_sparse_namespace_solves_poisson_end_to_end():
    """The switching-cost demo: a scipy-style script, start to finish."""
    from sparse_matrix_tpu.sparse.linalg import cg

    a = poisson_2d_csr(16)  # 256-dof 2-D Poisson
    b = np.ones(a.rows, np.float32)
    x, info = cg(a, b, rtol=1e-6, maxiter=2000)
    assert info == 0
    assert np.linalg.norm(a.toarray() @ x - b) <= 1e-3


def test_bcoo_interop_roundtrip():
    from sparse_matrix_tpu.formats.csr import CsrMatrix as C

    a = _rand(12, 9, 0.3, seed=21)
    b = a.to_bcoo()
    np.testing.assert_allclose(np.asarray(b.todense()), a.toarray(),
                               rtol=1e-6)
    back = C.from_bcoo(b)
    assert back == a.astype(back.vals.dtype) or np.allclose(
        back.toarray(), a.toarray())

    # duplicate BCOO coordinates sum on conversion
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse

    dup = jsparse.BCOO(
        (jnp.asarray([1.0, 2.0]), jnp.asarray([[0, 1], [0, 1]])),
        shape=(2, 2))
    np.testing.assert_allclose(C.from_bcoo(dup).toarray(),
                               [[0.0, 3.0], [0.0, 0.0]])


def test_eigsh_sigma_shift_invert_matches_dense():
    from sparse_matrix_tpu.sparse.linalg import eigsh

    a = _spd(60, seed=22)
    dense = np.linalg.eigvalsh(a.toarray())
    sigma = float((dense[4] + dense[5]) / 2.0)  # interior target
    vals, vecs = eigsh(a, k=4, sigma=sigma)
    nearest = dense[np.argsort(np.abs(dense - sigma))[:4]]
    np.testing.assert_allclose(np.sort(vals), np.sort(nearest), rtol=1e-8)
    # residual check: A v ~ lam v for each returned pair
    d = a.toarray()
    order = np.argsort(vals)
    vv = vecs[:, order]
    for j, lam in enumerate(np.sort(vals)):
        assert np.linalg.norm(d @ vv[:, j] - lam * vv[:, j]) <= 1e-6 * max(
            1.0, abs(lam))


@needs_scipy
def test_eigsh_sigma_matches_scipy():
    import scipy.sparse.linalg as sla

    from sparse_matrix_tpu.sparse.linalg import eigsh

    a = _spd(50, seed=23)
    sigma = float(np.median(np.linalg.eigvalsh(a.toarray())))
    ours, _ = eigsh(a, k=3, sigma=sigma)
    theirs = sla.eigsh(a.to_scipy().tocsc(), k=3, sigma=sigma,
                       return_eigenvectors=False)
    np.testing.assert_allclose(np.sort(ours), np.sort(theirs), rtol=1e-7)


def test_eigs_sigma_shift_invert_unsymmetric():
    from sparse_matrix_tpu.sparse.linalg import eigs

    n = 40
    a = _spd(n, seed=24) + sp.random(n, n, 0.04, random_state=25)
    dense = np.linalg.eigvals(a.toarray())
    sigma = float(np.real(np.median(np.real(dense))))
    vals, vecs = eigs(a, k=3, sigma=sigma)
    nearest = dense[np.argsort(np.abs(dense - sigma))[:3]]
    np.testing.assert_allclose(np.sort(np.abs(vals - sigma)),
                               np.sort(np.abs(nearest - sigma)), rtol=1e-6)
    d = a.toarray().astype(np.complex128)
    for j in range(3):
        r = np.linalg.norm(d @ vecs[:, j] - vals[j] * vecs[:, j])
        assert r <= 1e-6 * max(1.0, abs(vals[j]))
