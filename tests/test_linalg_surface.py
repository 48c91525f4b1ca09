"""scipy.sparse.linalg surface completion: funm_multiply_krylov,
LaplacianNd, is_sptriangular/spbandwidth, facade direct-solver input
conversion, and the small parity shims."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as sla

import sparse_matrix_tpu.sparse.linalg as L


# --------------------------------------------------------------- funm

def _sparse_general(rng, n, scale=0.3):
    d = (rng.random((n, n)) < 0.04) * rng.standard_normal((n, n)) * scale
    np.fill_diagonal(d, -1.0)
    return d


def test_funm_krylov_expm_matches_exact_and_scipy():
    from scipy.linalg import expm

    rng = np.random.default_rng(0)
    d = _sparse_general(rng, 250)
    b = rng.standard_normal(250)
    exact = expm(0.7 * d) @ b
    ours = L.funm_multiply_krylov(expm, sp.csr_matrix(d), b, t=0.7,
                                  restart_every_m=12, rtol=1e-10)
    assert np.linalg.norm(ours - exact) <= 1e-8 * np.linalg.norm(exact)
    theirs = sla.funm_multiply_krylov(expm, sp.csr_matrix(d), b, t=0.7,
                                      restart_every_m=12, rtol=1e-10)
    np.testing.assert_allclose(ours, theirs, rtol=1e-7, atol=1e-10)


def test_funm_krylov_symmetric_lanczos_and_restarts():
    from scipy.linalg import cosm

    rng = np.random.default_rng(1)
    d = _sparse_general(rng, 200)
    d = (d + d.T) / 2
    b = rng.standard_normal(200)
    exact = cosm(0.5 * d) @ b
    # tiny restart size forces several Eiermann-Ernst cycles
    ours = L.funm_multiply_krylov(cosm, d, b, assume_a="her", t=0.5,
                                  restart_every_m=6, rtol=1e-11,
                                  max_restarts=40)
    assert np.linalg.norm(ours - exact) <= 1e-8 * np.linalg.norm(exact)


def test_funm_krylov_small_space_exhaustion_and_zero_b():
    from scipy.linalg import expm

    rng = np.random.default_rng(2)
    d = rng.standard_normal((5, 5))
    b = rng.standard_normal(5)
    ours = L.funm_multiply_krylov(expm, d, b, restart_every_m=30)
    np.testing.assert_allclose(ours, expm(d) @ b, rtol=1e-10)
    np.testing.assert_array_equal(
        L.funm_multiply_krylov(expm, d, np.zeros(5)), 0.0)


# --------------------------------------------------------- LaplacianNd

@pytest.mark.parametrize("bc", ["neumann", "dirichlet", "periodic"])
@pytest.mark.parametrize("shape", [(7,), (4, 5), (3, 4, 2)])
def test_laplaciannd_matches_scipy(bc, shape):
    ours = L.LaplacianNd(shape, boundary_conditions=bc)
    theirs = sla.LaplacianNd(shape, boundary_conditions=bc)
    a = theirs.toarray().astype(float)
    np.testing.assert_allclose(ours.toarray().astype(float), a)
    np.testing.assert_allclose(ours.tosparse().to_dense(), a)
    x = np.random.default_rng(0).standard_normal(ours.shape[0])
    np.testing.assert_allclose(ours.matvec(x), a @ x, atol=1e-12)
    np.testing.assert_allclose(ours.eigenvalues(), theirs.eigenvalues(),
                               atol=1e-10)
    np.testing.assert_allclose(ours.eigenvalues(3), theirs.eigenvalues(3),
                               atol=1e-10)
    m = min(4, ours.shape[0])
    vecs = ours.eigenvectors(m)
    lam = ours.eigenvalues(m)
    np.testing.assert_allclose(a @ vecs, vecs * lam, atol=1e-9)
    np.testing.assert_allclose(vecs.T @ vecs, np.eye(m), atol=1e-10)


def test_laplaciannd_size1_axis_self_consistent():
    """Documented delta: scipy's toarray for a size-1 axis contradicts
    its own eigenvalues; ours is internally consistent."""
    for bc in ("neumann", "periodic"):
        ours = L.LaplacianNd((1, 3), boundary_conditions=bc)
        a = ours.toarray().astype(float)
        np.testing.assert_allclose(np.sort(np.linalg.eigvalsh(a)),
                                   ours.eigenvalues(), atol=1e-10)


def test_laplaciannd_rejects_bad_bc():
    with pytest.raises(ValueError):
        L.LaplacianNd((4,), boundary_conditions="robin")


# ------------------------------------------------- structure probes

def test_is_sptriangular_and_spbandwidth_match_scipy():
    rng = np.random.default_rng(3)
    t = sp.random(40, 40, density=0.08, random_state=rng).tocsr()
    for m in (t, sp.tril(t).tocsr(), sp.triu(t).tocsr(), sp.eye(7).tocsr()):
        assert L.is_sptriangular(m) == tuple(sla.is_sptriangular(m))
        assert L.spbandwidth(m) == tuple(sla.spbandwidth(m))
    assert L.spbandwidth(sp.csr_matrix((5, 5))) == (0, 0)


# --------------------------------------------------------- shims

def test_facade_direct_solvers_accept_scipy_and_dense():
    rng = np.random.default_rng(4)
    d = np.diag(rng.uniform(1, 2, 8))
    d[0, 3] = 0.5
    b = rng.standard_normal(8)
    s = sp.csr_matrix(d)
    lu = L.splu(s)
    assert isinstance(lu, L.SuperLU)
    np.testing.assert_allclose(d @ lu.solve(b), b, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(d @ L.spsolve(s, b), b, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(d @ L.factorized(d)(b), b, rtol=1e-6,
                               atol=1e-6)
    assert L.use_solver(useUmfpack=False) is None
    assert issubclass(L.ArpackNoConvergence, L.ArpackError)
    assert issubclass(L.MatrixRankWarning, Warning)


# ------------------------------------------ LinearOperator algebra

def test_linearoperator_algebra():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((5, 4))
    b = rng.standard_normal((4, 6))
    c = rng.standard_normal((5, 4))
    la, lb, lc = (L.aslinearoperator(m) for m in (a, b, c))
    x6, x4, y5 = (rng.standard_normal(k) for k in (6, 4, 5))
    np.testing.assert_allclose((la @ lb).matvec(x6), a @ (b @ x6),
                               rtol=1e-6)
    np.testing.assert_allclose((la * lb).rmatvec(y5), b.T @ (a.T @ y5),
                               rtol=1e-6)
    np.testing.assert_allclose((la + lc)(x4), (a + c) @ x4, rtol=1e-6)
    np.testing.assert_allclose((la - lc)(x4), (a - c) @ x4, rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose((2.5 * la)(x4), 2.5 * (a @ x4), rtol=1e-6)
    np.testing.assert_allclose((la / 2)(x4), (a @ x4) / 2, rtol=1e-6)
    np.testing.assert_allclose((-la)(x4), -(a @ x4), rtol=1e-6)
    np.testing.assert_allclose(la.H.matvec(y5), a.T @ y5, rtol=1e-6)
    np.testing.assert_allclose(la.dot(x4), a @ x4, rtol=1e-6)
    s = a[:4]
    np.testing.assert_allclose((L.aslinearoperator(s) ** 3)(x4),
                               s @ s @ s @ x4, rtol=1e-5)
    with pytest.raises(ValueError):
        lb @ la  # (4,6) @ (5,4)
    with pytest.raises(ValueError):
        la + lb
    with pytest.raises(ValueError):
        lb ** 2  # not square


def test_linearoperator_algebra_feeds_solvers():
    """Composed operators drop straight into the iterative solvers."""
    rng = np.random.default_rng(6)
    d = np.diag(rng.uniform(1.0, 2.0, 30))
    spd = d + 0.05 * np.eye(30)
    shifted = L.aslinearoperator(spd) + 0.5 * L.aslinearoperator(np.eye(30))
    b = rng.standard_normal(30)
    x, info = L.cg(shifted, b, rtol=1e-8)
    assert info == 0
    np.testing.assert_allclose((spd + 0.5 * np.eye(30)) @ x, b, rtol=1e-4,
                               atol=1e-5)


def test_svds_smallest_vs_scipy():
    import scipy.sparse.linalg as sla

    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.sparse.linalg import svds

    rng = np.random.default_rng(9)
    import scipy.sparse as sp

    A_s = sp.random(40, 30, density=0.3, random_state=rng,
                    data_rvs=lambda k: rng.uniform(0.5, 2.0, k)).tocsr()
    A_s = A_s + sp.diags(np.full(30, 3.0), 0, shape=(40, 30))  # full rank
    A_s.sort_indices()
    A = CsrMatrix.from_scipy(A_s)
    u, s, vt = svds(A, 3, which="SM")
    ref = np.sort(np.linalg.svd(A_s.toarray(), compute_uv=False))[:3]
    np.testing.assert_allclose(s, ref, rtol=1e-8)
    # triplets reconstruct: A v = s u
    np.testing.assert_allclose(A_s.toarray() @ vt.T, u * s[None, :],
                               atol=1e-7)


def test_eigsh_both_ends():
    import scipy.sparse.linalg as sla

    from sparse_matrix_tpu.sparse.linalg import eigsh
    from sparse_matrix_tpu.solvers.poisson import poisson_2d_csr

    A = poisson_2d_csr(8, dtype=np.float64)
    vals, vecs = eigsh(A, 4, which="BE", tol=1e-8, maxiter=2000)
    ref = np.sort(sla.eigsh(A.to_scipy().tocsc(), 4, which="BE")[0])
    np.testing.assert_allclose(vals, ref, rtol=1e-4)
    assert vecs.shape == (64, 4)
    # generalized BE through the M-Lanczos path
    from sparse_matrix_tpu.formats.construct import diags

    M = diags([0.25, 1.0, 0.25], [-1, 0, 1], shape=(64, 64), dtype=np.float64)
    gv, _ = eigsh(A, 4, which="BE", M=M)
    gref = np.sort(sla.eigsh(A.to_scipy().tocsc(), 4, which="BE",
                             M=M.to_scipy().tocsc())[0])
    np.testing.assert_allclose(gv, gref, rtol=1e-6)


def test_eigsh_lm_sm_are_magnitude_not_algebraic():
    import scipy.sparse as sp
    import scipy.sparse.linalg as sla

    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.sparse.linalg import eigsh
    from sparse_matrix_tpu.solvers.poisson import poisson_2d_csr

    # indefinite: spectrum of Poisson(8) - 6I spans about (-6, 2), so
    # largest-|lambda| pairs are NEGATIVE — LM must not return LA's
    A_s = (poisson_2d_csr(8, dtype=np.float64).to_scipy()
           - 6.0 * sp.identity(64)).tocsr()
    A = CsrMatrix.from_scipy(A_s)
    vals, vecs = eigsh(A, 3, which="LM", tol=1e-9, maxiter=3000)
    ref = np.sort(sla.eigsh(A_s, 3, which="LM")[0])
    np.testing.assert_allclose(vals, ref, rtol=1e-5)
    assert np.all(vals < 0)  # the magnitude winners are the negative end
    sm_vals, _ = eigsh(A, 3, which="SM")
    sm_ref = np.sort(sla.eigsh(A_s, 3, which="SM")[0])
    # atol: the spectrum contains an exact zero — two numerical zeros
    # never match under rtol alone
    np.testing.assert_allclose(sm_vals, sm_ref, rtol=1e-6, atol=1e-12)


def test_eigs_smallest_magnitude_vs_scipy():
    import scipy.sparse as sp
    import scipy.sparse.linalg as sla

    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.sparse.linalg import eigs
    from sparse_matrix_tpu.solvers.poisson import poisson_2d_csr

    # nonsymmetric, nonsingular: Poisson + skew + shift
    d = poisson_2d_csr(7, dtype=np.float64).to_dense()
    i = np.arange(48)
    d[i, i + 1] += 0.3
    d[i + 1, i] -= 0.3
    d += 0.7 * np.eye(49)
    A_s = sp.csr_matrix(d)
    A = CsrMatrix.from_scipy(A_s)
    vals, _ = eigs(A, 3, which="SM")
    ref = sla.eigs(A_s, 3, which="SM")[0]
    np.testing.assert_allclose(np.sort(np.abs(vals)), np.sort(np.abs(ref)),
                               rtol=1e-7)


# ------------------------------------------------- round-4 ADVICE fixes

def test_svds_smallest_wide_matrix():
    # ADVICE r3: svds(which='SM') on a WIDE matrix used to form the
    # cols x cols Gram (rank-deficient by construction) and zero-pivot;
    # it must Gram the smaller side and recover V = A^T U / s.
    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.sparse.linalg import svds

    rng = np.random.default_rng(11)
    A_s = sp.random(30, 40, density=0.3, random_state=rng,
                    data_rvs=lambda k: rng.uniform(0.5, 2.0, k)).tocsr()
    A_s = A_s + sp.diags(np.full(30, 3.0), 0, shape=(30, 40))  # full row rank
    A_s.sort_indices()
    u, s, vt = svds(CsrMatrix.from_scipy(A_s), 3, which="SM")
    ref = np.sort(np.linalg.svd(A_s.toarray(), compute_uv=False))[:3]
    np.testing.assert_allclose(s, ref, rtol=1e-8)
    np.testing.assert_allclose(A_s.toarray() @ vt.T, u * s[None, :],
                               atol=1e-7)
    np.testing.assert_allclose(u.T @ u, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(vt @ vt.T, np.eye(3), atol=1e-8)


def test_eigsh_sm_singular_operator():
    # ADVICE r3: SM shift-invert at 0 needs A nonsingular; a singular A
    # (here an exactly-singular diagonal) must retry at a tiny shift
    # instead of dying on the LDL zero pivot.
    from sparse_matrix_tpu.formats.construct import diags
    from sparse_matrix_tpu.sparse.linalg import eigsh

    d = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0])
    A = diags([d], [0], shape=(10, 10), dtype=np.float64)
    vals, vecs = eigsh(A, 2, which="SM")
    np.testing.assert_allclose(vals, [0.0, 1.0], atol=1e-6)
    r = A.to_dense() @ vecs - vecs * vals[None, :]
    assert np.linalg.norm(r) < 1e-6


def test_eigs_sm_singular_operator():
    # unsymmetric counterpart: LU 'singular at column' must also retry
    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.sparse.linalg import eigs

    d = np.diag([0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    d[0, 1] = 0.0  # keep exactly singular, nonsymmetric via off-diag below
    d[2, 5] = 0.3
    A = CsrMatrix.from_scipy(sp.csr_matrix(d))
    vals, _ = eigs(A, 2, which="SM")
    np.testing.assert_allclose(np.sort(np.abs(vals)), [0.0, 1.0], atol=1e-5)


def test_eigsh_lm_generalized_dedup_is_m_aware():
    # ADVICE r3: with M given the end-run vectors are M-orthonormal
    # (||v||_2 != 1); the overlap dedup must 2-normalize or a duplicated
    # pair evades it and the true k-th pair is silently dropped.
    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.formats.construct import diags
    from sparse_matrix_tpu.sparse.linalg import eigsh

    # ends overlap: 2k > n so SA- and LA-runs share interior pairs; M
    # entries > 1 shrink Euclidean overlaps of M-normalized duplicates
    a_d = np.array([-2.0, -1.0, 0.5, 2.0, 4.0])
    m_d = np.array([4.0, 9.0, 16.0, 4.0, 9.0])
    A = diags([a_d], [0], shape=(5, 5), dtype=np.float64)
    M = diags([m_d], [0], shape=(5, 5), dtype=np.float64)
    vals, vecs = eigsh(A, 3, which="LM", M=M)
    ref = np.sort(sla.eigsh(A.to_scipy().tocsc(), 3, which="LM",
                            M=M.to_scipy().tocsc())[0])
    np.testing.assert_allclose(vals, ref, rtol=1e-8)
    # no duplicated eigenvectors among the returned pairs
    nv = vecs / np.linalg.norm(vecs, axis=0, keepdims=True)
    g = np.abs(nv.T @ nv) - np.eye(3)
    assert g.max() < 0.9


def test_lobpcg_generalized_adaptive_default():
    # ADVICE r3: the facade pinned the Lanczos subspace to maxiter=200,
    # disabling adaptive growth for n > 200 pencils; default must adapt.
    from sparse_matrix_tpu.formats.construct import diags
    from sparse_matrix_tpu.sparse.linalg import lobpcg

    n = 300
    rng = np.random.default_rng(3)
    main = 2.0 + rng.random(n)
    off = 0.3 * rng.random(n - 1)
    A = sp.diags([off, main, off], [-1, 0, 1]).tocsr()
    B = sp.diags([1.0 + rng.random(n)], [0]).tocsr()
    from sparse_matrix_tpu.formats.csr import CsrMatrix

    X = rng.standard_normal((n, 2))
    vals, vecs = lobpcg(CsrMatrix.from_scipy(A), X,
                        B=CsrMatrix.from_scipy(B))
    dense_vals = np.sort(
        np.real(np.linalg.eigvals(np.linalg.solve(B.toarray(), A.toarray()))))
    np.testing.assert_allclose(np.sort(vals), dense_vals[-2:], rtol=1e-7)
