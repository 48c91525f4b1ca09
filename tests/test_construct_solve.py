"""Construction utilities (eye/diags/random/kron/block_diag) and the
one-call solve()/lstsq() dispatch."""

import numpy as np
import pytest

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import (
    CsrMatrix,
    block_diag,
    diags,
    eye,
    kron,
    random_csr,
)
from sparse_matrix_tpu.solvers import lstsq, poisson_2d_csr, solve


def test_eye_variants():
    np.testing.assert_array_equal(eye(4).to_dense(), np.eye(4))
    np.testing.assert_array_equal(eye(3, 5, 1).to_dense(), np.eye(3, 5, 1))
    np.testing.assert_array_equal(eye(5, 3, -2).to_dense(), np.eye(5, 3, -2))
    assert eye(4, k=10).nnz() == 0  # off the matrix entirely


def test_diags_matches_scipy_semantics():
    d = diags([[1.0, 2.0, 3.0], [4.0, 5.0]], [0, -1])
    ref = np.diag([1.0, 2.0, 3.0]) + np.diag([4.0, 5.0], -1)
    np.testing.assert_array_equal(d.to_dense(), ref)
    # scalar broadcast with explicit shape
    t = diags([2.0, -1.0, -1.0], [0, -1, 1], shape=(5, 5))
    ref = 2 * np.eye(5) - np.eye(5, k=1) - np.eye(5, k=-1)
    np.testing.assert_array_equal(t.to_dense(), ref)
    with pytest.raises(ValueError, match="explicit shape"):
        diags([2.0], [0])
    with pytest.raises(ValueError, match="same length"):
        diags([[1.0]], [0, 1])


def test_random_csr_properties():
    rng = np.random.default_rng(0)
    m = random_csr(50, 70, 0.1, rng, dtype=np.float32)
    assert m.shape == (50, 70)
    assert abs(m.nnz() - 350) <= 1
    assert m.invariants()
    with pytest.raises(ValueError, match="density"):
        random_csr(5, 5, 1.5, rng)


def test_kron_builds_poisson_2d():
    """kron(L1, I) + kron(I, L1) == the framework's own 2D Poisson."""
    n = 12
    l1 = diags([2.0, -1.0, -1.0], [0, -1, 1], shape=(n, n))
    i = eye(n)
    p2 = kron(l1, i) + kron(i, l1)
    ref = poisson_2d_csr(n, dtype=np.float64)
    np.testing.assert_allclose(p2.to_dense(), ref.to_dense(), atol=1e-12)


def test_kron_rectangular_matches_numpy():
    rng = np.random.default_rng(1)
    a = random_csr(4, 6, 0.4, rng)
    b = random_csr(3, 2, 0.5, rng)
    np.testing.assert_allclose(
        kron(a, b).to_dense(), np.kron(a.to_dense(), b.to_dense()), atol=1e-12
    )


def test_block_diag():
    rng = np.random.default_rng(2)
    blocks = [random_csr(3, 4, 0.5, rng), random_csr(2, 2, 0.9, rng)]
    d = block_diag(blocks).to_dense()
    assert d.shape == (5, 6)
    np.testing.assert_allclose(d[:3, :4], blocks[0].to_dense(), atol=1e-12)
    np.testing.assert_allclose(d[3:, 4:], blocks[1].to_dense(), atol=1e-12)
    assert np.all(d[:3, 4:] == 0) and np.all(d[3:, :4] == 0)


def test_solve_small_dense_path():
    rng = np.random.default_rng(3)
    d = rng.standard_normal((40, 40)) + np.eye(40) * 10
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    b = rng.standard_normal(40)
    res = solve(a, b)
    assert int(res.iterations) == 0  # dense path
    x = np.asarray(res.x, dtype=np.float64)
    assert np.linalg.norm(d @ x - b) < 1e-3 * np.linalg.norm(b)


def test_solve_spd_large_uses_ic_pcg():
    p = poisson_2d_csr(64, dtype=np.float32)  # 4096 > dense threshold
    rng = np.random.default_rng(4)
    b = rng.standard_normal(p.rows).astype(np.float32)
    res = solve(p, b, tol=1e-5)
    assert int(res.iterations) > 0
    x = np.asarray(res.x, dtype=np.float64)
    rid = p.row_ids()
    ax = np.zeros(p.rows)
    np.add.at(ax, rid, p.vals.astype(np.float64) * x[p.indices.astype(np.int64)])
    assert np.linalg.norm(ax - b) < 1e-4 * np.linalg.norm(b)


def test_solve_unsymmetric_dispatch():
    rng = np.random.default_rng(5)
    n = 3000  # above the dense threshold
    m = random_csr(n, n, 0.002, rng, dtype=np.float64)
    d_add = np.abs(np.asarray(m.to_scipy().sum(axis=1))).ravel() + 2.0
    a = m + CsrMatrix.from_coo(n, n, np.arange(n), np.arange(n), d_add)
    b = rng.standard_normal(n)
    res = solve(a, b, tol=1e-6)
    x = np.asarray(res.x, dtype=np.float64)
    rid = a.row_ids()
    ax = np.zeros(n)
    np.add.at(ax, rid, a.vals.astype(np.float64) * x[a.indices.astype(np.int64)])
    assert np.linalg.norm(ax - b) < 1e-4 * np.linalg.norm(b)


def test_solve_rejects_rectangular():
    rng = np.random.default_rng(6)
    a = random_csr(4, 6, 0.5, rng)
    with pytest.raises(ValueError, match="square"):
        solve(a, np.ones(4))


def test_lstsq_rectangular():
    rng = np.random.default_rng(7)
    tall = random_csr(150, 60, 0.1, rng, dtype=np.float64)
    tall = tall + CsrMatrix.from_coo(
        150, 60, np.arange(60), np.arange(60), np.full(60, 3.0)
    )
    b = rng.standard_normal(150)
    res = lstsq(tall, b, tol=1e-8, maxiter=800)
    x = np.asarray(res.x, dtype=np.float64)
    ref, *_ = np.linalg.lstsq(tall.to_dense(), b, rcond=None)
    np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-3)


def test_stack_tril_triu_submatrix_match_dense():
    """scipy.sparse-style constructors: vstack/hstack/tril/triu/submatrix
    against dense oracles, through both sorted and shuffled inputs."""
    import numpy as np

    from sparse_matrix_tpu.core import DokMatrix
    from sparse_matrix_tpu.formats import (
        CsrMatrix, hstack, submatrix, tril, triu, vstack,
    )

    rng = np.random.default_rng(21)
    da = (rng.random((13, 9)) < 0.4) * rng.standard_normal((13, 9))
    db = (rng.random((13, 5)) < 0.4) * rng.standard_normal((13, 5))
    dc = (rng.random((6, 9)) < 0.4) * rng.standard_normal((6, 9))
    a = CsrMatrix.from_dok(DokMatrix.from_dense(da))
    b = CsrMatrix.from_dok(DokMatrix.from_dense(db))
    c = CsrMatrix.from_dok(DokMatrix.from_dense(dc))

    np.testing.assert_array_equal(
        hstack([a, b]).to_dense(), np.hstack([da, db])
    )
    np.testing.assert_array_equal(
        vstack([a, c]).to_dense(), np.vstack([da, dc])
    )
    for k in (-3, 0, 2):
        np.testing.assert_array_equal(tril(a, k).to_dense(), np.tril(da, k))
        np.testing.assert_array_equal(triu(a, k).to_dense(), np.triu(da, k))
        assert tril(a, k).invariants() and triu(a, k).invariants()
    sub = submatrix(a, (2, 11), (3, 8))
    np.testing.assert_array_equal(sub.to_dense(), da[2:11, 3:8])
    assert sub.invariants()
    # errors
    import pytest

    with pytest.raises(ValueError, match="share col count"):
        vstack([a, b])
    with pytest.raises(ValueError, match="share row count"):
        hstack([a, c])
    with pytest.raises(ValueError, match="out of bounds"):
        submatrix(a, (0, 99), (0, 1))


def test_spsolve_alias():
    import numpy as np

    from sparse_matrix_tpu.core import DokMatrix
    from sparse_matrix_tpu.formats import CsrMatrix
    from sparse_matrix_tpu.solvers import spsolve

    rng = np.random.default_rng(31)
    n = 30
    d = (rng.random((n, n)) < 0.3) * rng.standard_normal((n, n))
    d += np.eye(n) * 4.0
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    b = rng.standard_normal(n)
    x = spsolve(a, b, method="direct")
    np.testing.assert_allclose(d @ x, b, rtol=1e-9, atol=1e-9)


# --- round-3 session-3 additions: bmat/find/norm/matrix_power/npz/trisolve


def test_bmat_grid_with_none_blocks():
    from sparse_matrix_tpu.formats import bmat

    rng = np.random.default_rng(3)
    a = random_csr(3, 4, 0.5, rng)
    b = random_csr(3, 2, 0.5, rng)
    c = random_csr(5, 4, 0.3, rng)
    m = bmat([[a, b], [c, None]])
    ref = np.zeros((8, 6))
    ref[:3, :4] = a.to_dense()
    ref[:3, 4:] = b.to_dense()
    ref[3:, :4] = c.to_dense()
    np.testing.assert_array_equal(m.to_dense(), ref)
    assert m.invariants()
    # saddle-point assembly: [[A, B^T], [B, 0]] — the workhorse use
    sp = bmat([[a @ a.transpose(), b], [b.transpose(), None]])
    assert sp.shape == (5, 5)
    with pytest.raises(ValueError, match="fully-None"):
        bmat([[None, a], [None, c]])
    with pytest.raises(ValueError, match="heights"):
        bmat([[a, random_csr(4, 2, 0.5, rng)]])


def test_find_row_major_triplets():
    from sparse_matrix_tpu.formats import find

    rng = np.random.default_rng(4)
    a = random_csr(6, 7, 0.3, rng)
    r, c, v = find(a)
    dense = np.zeros((6, 7))
    dense[r, c] = v
    np.testing.assert_array_equal(dense, a.to_dense())
    # row-major order
    keys = r * 7 + c
    assert (np.diff(keys) > 0).all()


def test_norm_matches_numpy():
    from sparse_matrix_tpu.formats import norm

    rng = np.random.default_rng(5)
    a = random_csr(9, 6, 0.4, rng)
    d = a.to_dense()
    assert norm(a) == pytest.approx(np.linalg.norm(d))
    assert norm(a, 1) == pytest.approx(np.linalg.norm(d, 1))
    assert norm(a, np.inf) == pytest.approx(np.linalg.norm(d, np.inf))
    assert norm(a, "max") == pytest.approx(np.abs(d).max())
    z = CsrMatrix.new(3, 3)
    assert norm(z) == 0.0 and norm(z, 1) == 0.0 and norm(z, np.inf) == 0.0
    with pytest.raises(ValueError, match="unsupported"):
        norm(a, 2)
    # complex: |.| before any cast (a + ai has |.| = a*sqrt(2))
    cm = CsrMatrix.from_coo(2, 2, [0], [0], np.array([3 + 4j]))
    assert norm(cm) == pytest.approx(5.0)


def test_matrix_power_repeated_squaring():
    from sparse_matrix_tpu.formats import matrix_power

    rng = np.random.default_rng(6)
    a = random_csr(8, 8, 0.3, rng)
    d = a.to_dense()
    np.testing.assert_array_equal(
        matrix_power(a, 0).to_dense(), np.eye(8)
    )
    np.testing.assert_allclose(
        matrix_power(a, 3).to_dense(), d @ d @ d, rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        matrix_power(a, 5).to_dense(),
        np.linalg.matrix_power(d, 5), rtol=1e-11, atol=1e-11
    )
    with pytest.raises(ValueError, match="square"):
        matrix_power(random_csr(3, 4, 0.5, rng), 2)
    with pytest.raises(ValueError, match="negative"):
        matrix_power(a, -1)


def test_npz_round_trip(tmp_path):
    from sparse_matrix_tpu.formats import load_npz, save_npz

    rng = np.random.default_rng(7)
    a = random_csr(12, 9, 0.25, rng, dtype=np.float32)
    p = tmp_path / "m.npz"
    save_npz(p, a)
    b = load_npz(p)
    assert b.shape == a.shape and b.invariants()
    np.testing.assert_array_equal(b.to_dense(), a.to_dense())
    assert b.vals.dtype == a.vals.dtype


def test_spsolve_triangular_matches_dense():
    from sparse_matrix_tpu.formats import tril, triu
    from sparse_matrix_tpu.solvers import spsolve_triangular

    rng = np.random.default_rng(8)
    n = 20
    d = rng.standard_normal((n, n))
    np.fill_diagonal(d, np.abs(np.diag(d)) + 1.0)
    # sparsify off-diagonal, keep a usable diagonal
    dd = d * (np.abs(d) > 0.8)
    np.fill_diagonal(dd, np.diag(d))
    a = CsrMatrix.from_coo(*_coo_of(dd))
    low = tril(a)
    b = rng.standard_normal(n)
    x = spsolve_triangular(low, b, lower=True)
    np.testing.assert_allclose(np.tril(dd) @ x, b, atol=1e-10)
    up = triu(a)
    x = spsolve_triangular(up, b, lower=False)
    np.testing.assert_allclose(np.triu(dd) @ x, b, atol=1e-10)
    # full matrix in: wrong-side entries ignored (scipy semantics)
    x2 = spsolve_triangular(a, b, lower=True)
    np.testing.assert_allclose(np.tril(dd) @ x2, b, atol=1e-10)
    # unit diagonal: stored diagonal ignored
    xu = spsolve_triangular(low, b, lower=True, unit_diagonal=True)
    lu = np.tril(dd, -1) + np.eye(n)
    np.testing.assert_allclose(lu @ xu, b, atol=1e-10)
    # block RHS
    bb = rng.standard_normal((n, 3))
    xb = spsolve_triangular(low, bb, lower=True)
    np.testing.assert_allclose(np.tril(dd) @ xb, bb, atol=1e-10)
    # zero pivot raises
    sing = CsrMatrix.from_coo(2, 2, [1], [0], [1.0])
    with pytest.raises(ValueError, match="pivot"):
        spsolve_triangular(sing, np.ones(2))
    with pytest.raises(ValueError, match="square"):
        spsolve_triangular(random_csr(3, 4, 0.5, rng), np.ones(3))


def _coo_of(dense):
    r, c = np.nonzero(dense)
    return dense.shape[0], dense.shape[1], r, c, dense[r, c]
