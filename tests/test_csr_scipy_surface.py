"""CsrMatrix method-surface parity with scipy.sparse.csr_matrix.

Two layers: a dir()-diff coverage test pinning the surface to scipy's
public method list (zero exclusions), and differential tests checking each
method group against scipy/numpy dense semantics on random matrices.
"""

import numpy as np
import pytest

import scipy.sparse as sp

from sparse_matrix_tpu.formats.csr import CsrMatrix


def _rand(rows=7, cols=9, density=0.3, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    d = np.where(rng.random((rows, cols)) < density, rng.standard_normal((rows, cols)), 0.0)
    return d.astype(dtype)


def _pair(rows=7, cols=9, density=0.3, seed=0, dtype=np.float64):
    d = _rand(rows, cols, density, seed, dtype)
    return CsrMatrix._from_dense(d), sp.csr_matrix(d), d


# -- coverage ---------------------------------------------------------------


def test_method_surface_covers_scipy():
    ref = {a for a in dir(sp.csr_matrix(np.eye(2))) if not a.startswith("_")}
    ours = set(dir(CsrMatrix.identity(2)))
    missing = sorted(ref - ours)
    assert not missing, f"csr_matrix methods missing from CsrMatrix: {missing}"


# -- attributes / trivia ------------------------------------------------------


def test_attribute_aliases():
    a, s, d = _pair()
    assert a.dtype == s.dtype
    assert a.ndim == 2 and a.size == s.nnz
    assert a.format == "csr" == a.getformat()
    assert a.get_shape() == s.get_shape()
    assert a.getmaxprint() == s.getmaxprint()
    np.testing.assert_array_equal(a.data, s.data)
    np.testing.assert_array_equal(a.indptr, s.indptr)
    assert a.has_sorted_indices and a.has_canonical_format
    assert a.asfptype() is a
    ai = CsrMatrix._from_dense(np.eye(3, dtype=np.int64))
    assert ai.asfptype().dtype == np.float64
    a.check_format()
    np.testing.assert_array_equal(a.getnnz(axis=0), s.getnnz(axis=0))
    np.testing.assert_array_equal(a.getnnz(axis=1), s.getnnz(axis=1))


def test_real_imag_conjugate_getH():
    d = _rand() + 1j * _rand(seed=1)
    a = CsrMatrix._from_dense(d)
    np.testing.assert_allclose(a.real.to_dense(), d.real)
    np.testing.assert_allclose(a.imag.to_dense(), d.imag)
    np.testing.assert_allclose(a.conjugate().to_dense(), np.conj(d))
    np.testing.assert_allclose(a.getH().to_dense(), np.conj(d).T)


def test_nonzero_matches_scipy():
    a, s, _ = _pair(seed=3)
    r0, c0 = a.nonzero()
    r1, c1 = s.nonzero()
    np.testing.assert_array_equal(r0, r1)
    np.testing.assert_array_equal(c0, c1)


# -- canonical-format ops -----------------------------------------------------


def test_sort_and_canonicalize():
    d = _rand(seed=5)
    dok = CsrMatrix._from_dense(d).to_dok()
    rng = np.random.default_rng(0)
    a = CsrMatrix.from_dok_shuffled(dok, rng)
    assert not a.has_sorted_indices
    b = a.sorted_indices()
    assert b.has_sorted_indices and not a.has_sorted_indices
    a.sort_indices()
    assert a.has_sorted_indices
    np.testing.assert_allclose(a.to_dense(), d)
    a.sum_duplicates()  # defensive no-op on canonical input
    np.testing.assert_allclose(a.to_dense(), d)


def test_eliminate_zeros_and_prune():
    d = _rand(seed=6)
    a = CsrMatrix._from_dense(d)
    a.set_element((0, 0), 0.0)  # cancellation zero stays explicit
    n0 = a.nnz()
    assert a.count_nonzero() == n0 - 1 or d[0, 0] == 0
    a.eliminate_zeros()
    assert a.count_nonzero() == a.nnz()
    a.prune()
    np.testing.assert_allclose(a.to_dense(), np.where(np.arange(9) == 0, d, d)[...])


# -- shape changes -------------------------------------------------------------


@pytest.mark.parametrize("order", ["C", "F"])
def test_reshape(order):
    a, s, d = _pair(6, 10, seed=7)
    got = a.reshape((20, 3), order=order).to_dense()
    np.testing.assert_allclose(got, d.reshape((20, 3), order=order))
    got2 = a.reshape(4, 15).to_dense()
    np.testing.assert_allclose(got2, d.reshape(4, 15))
    with pytest.raises(ValueError):
        a.reshape((7, 7))


def test_set_shape_and_resize():
    a, _, d = _pair(6, 10, seed=8)
    a.set_shape((30, 2))
    np.testing.assert_allclose(a.to_dense(), d.reshape(30, 2))
    b = CsrMatrix._from_dense(d)
    b.resize(4, 5)
    np.testing.assert_allclose(b.to_dense(), d[:4, :5])
    b.resize((6, 12))  # grow back: new area is zero
    np.testing.assert_allclose(b.to_dense()[:4, :5], d[:4, :5])
    assert b.to_dense()[5:].sum() == 0


# -- indexing -------------------------------------------------------------------


def test_getitem_variants_match_dense():
    a, s, d = _pair(8, 11, seed=9)
    assert a[2, 3] == d[2, 3]
    assert a[-1, -2] == d[-1, -2]
    np.testing.assert_allclose(a[3].to_dense(), d[[3]])
    np.testing.assert_allclose(a[1:5].to_dense(), d[1:5])
    np.testing.assert_allclose(a[::2].to_dense(), d[::2])
    np.testing.assert_allclose(a[[4, 1, 1, 6]].to_dense(), d[[4, 1, 1, 6]])
    mask = np.zeros(8, bool)
    mask[[0, 5]] = True
    np.testing.assert_allclose(a[mask].to_dense(), d[mask])
    np.testing.assert_allclose(a[:, 4].to_dense(), d[:, [4]])
    np.testing.assert_allclose(a[:, 2:7].to_dense(), d[:, 2:7])
    np.testing.assert_allclose(a[:, [8, 0, 0, 3]].to_dense(), d[:, [8, 0, 0, 3]])
    np.testing.assert_allclose(a[1:5, 2:7].to_dense(), d[1:5, 2:7])
    np.testing.assert_allclose(a[[1, 3], 2:5].to_dense(), d[[1, 3], 2:5])
    np.testing.assert_allclose(a[2, [1, 4, 7]].to_dense(), d[[2]][:, [1, 4, 7]])
    # inner pair indexing, scipy-style
    got = a[[1, 2, 5], [3, 0, 10]].to_dense().ravel()
    np.testing.assert_allclose(got, d[[1, 2, 5], [3, 0, 10]])
    with pytest.raises(IndexError):
        a[99]


def test_setitem_and_getrow_getcol():
    a, _, d = _pair(seed=10)
    a[2, 3] = 42.5
    assert a[2, 3] == 42.5
    np.testing.assert_allclose(a.getrow(4).to_dense(), d[[4]])
    np.testing.assert_allclose(a.getcol(-1).to_dense(), d[:, [-1]])
    with pytest.raises(NotImplementedError):
        a[1:3] = 0


# -- scalar arithmetic ----------------------------------------------------------


def test_scalar_arithmetic():
    a, _, d = _pair(seed=11)
    np.testing.assert_allclose((a * 2.5).to_dense(), d * 2.5)
    np.testing.assert_allclose((3 * a).to_dense(), 3 * d)
    np.testing.assert_allclose((a / 4).to_dense(), d / 4)
    np.testing.assert_allclose((-a).to_dense(), -d)
    np.testing.assert_allclose(abs(a).to_dense(), np.abs(d))
    x = np.arange(9, dtype=float)
    np.testing.assert_allclose(a * x, d @ x)  # spmatrix * = matmul


def test_matrix_and_elementwise_power():
    d = _rand(6, 6, seed=12)
    a = CsrMatrix._from_dense(d)
    np.testing.assert_allclose((a ** 3).to_dense(), np.linalg.matrix_power(d, 3), atol=1e-12)
    np.testing.assert_allclose(a.power(2).to_dense(), d ** 2)
    with pytest.raises(ValueError):
        a.power(-1)


# -- elementwise maximum/minimum -------------------------------------------------


def test_maximum_minimum_matches_scipy():
    a, s, d = _pair(seed=13)
    b, t, e = _pair(seed=14)
    np.testing.assert_allclose(a.maximum(b).to_dense(), np.asarray(s.maximum(t).todense()))
    np.testing.assert_allclose(a.minimum(b).to_dense(), np.asarray(s.minimum(t).todense()))
    np.testing.assert_allclose(a.maximum(0).to_dense(), np.maximum(d, 0))
    np.testing.assert_allclose(a.maximum(0.5).to_dense(), np.maximum(d, 0.5))
    np.testing.assert_allclose(a.minimum(-0.5).to_dense(), np.minimum(d, -0.5))
    np.testing.assert_allclose(a.maximum(e).to_dense(), np.maximum(d, e))


# -- reductions -------------------------------------------------------------------


@pytest.mark.parametrize("axis", [None, 0, 1])
def test_minmax_reductions(axis):
    a, s, d = _pair(seed=15)
    for ours, ref in ((a.max, d.max), (a.min, d.min)):
        got = ours(axis=axis)
        want = ref(axis=axis)
        np.testing.assert_allclose(np.ravel(got), np.ravel(want))
    np.testing.assert_allclose(np.ravel(a.mean(axis=axis)), np.ravel(d.mean(axis=axis)))


def test_minmax_implicit_zero_and_allneg():
    d = np.zeros((3, 4))
    d[0, 1] = -2.0
    d[2, 3] = -1.0
    a = CsrMatrix._from_dense(d)
    assert a.max() == 0.0 and a.min() == -2.0
    np.testing.assert_array_equal(a.max(axis=1), d.max(axis=1))
    np.testing.assert_array_equal(a.min(axis=0), d.min(axis=0))


def test_nan_reductions():
    d = _rand(seed=16)
    d[1, 2] = np.nan
    a = CsrMatrix._from_dense(np.nan_to_num(d, nan=0.0))
    a.set_element((1, 2), np.nan)
    assert np.isnan(a.max())
    e = d.copy()
    e[1, 2] = 0.0
    assert a.nanmax() == np.nanmax(np.where(np.isnan(d), 0, e))
    assert not np.isnan(a.nanmin())


@pytest.mark.parametrize("axis", [None, 0, 1])
def test_argminmax(axis):
    rng = np.random.default_rng(17)
    for seed in range(6):
        d = _rand(5, 7, density=0.4, seed=100 + seed)
        a = CsrMatrix._from_dense(d)
        np.testing.assert_array_equal(
            np.ravel(a.argmax(axis=axis)), np.ravel(d.argmax(axis=axis))
        )
        np.testing.assert_array_equal(
            np.ravel(a.argmin(axis=axis)), np.ravel(d.argmin(axis=axis))
        )


def test_argminmax_allnegative_rows():
    d = np.zeros((3, 5))
    d[0] = [-3, -1, -2, -5, -4]
    d[1, 2] = 4.0
    a = CsrMatrix._from_dense(d)
    np.testing.assert_array_equal(a.argmax(axis=1), d.argmax(axis=1))
    np.testing.assert_array_equal(a.argmin(axis=1), d.argmin(axis=1))
    assert a.argmax() == d.argmax()
    assert a.argmin() == d.argmin()


# -- diagonal ---------------------------------------------------------------------


@pytest.mark.parametrize("k", [-2, 0, 3])
def test_setdiag_and_trace(k):
    a, s, d = _pair(seed=18)
    vals = np.arange(1.0, 20.0)
    a.setdiag(vals, k=k)
    s = s.tolil()
    s.setdiag(vals, k=k)
    np.testing.assert_allclose(a.to_dense(), np.asarray(s.todense()))
    assert np.isclose(a.trace(), np.trace(a.to_dense()))
    assert np.isclose(a.trace(1), np.trace(a.to_dense(), offset=1))
    b = CsrMatrix._from_dense(d)
    b.setdiag(7.0, k=k)  # scalar broadcast
    e = d.copy()
    np.fill_diagonal(e[max(0, -k):, max(0, k):], 7.0)
    np.testing.assert_allclose(b.to_dense(), e)


def test_setdiag_short_array_sets_prefix_only():
    d = _rand(6, 6, seed=19)
    a = CsrMatrix._from_dense(d)
    a.setdiag([9.0, 8.0])
    e = d.copy()
    e[0, 0], e[1, 1] = 9.0, 8.0
    np.testing.assert_allclose(a.to_dense(), e)


# -- conversions ------------------------------------------------------------------


def test_format_conversions():
    a, _, d = _pair(seed=20)
    assert a.tocoo() is a and a.tocsc(copy=True) is not a
    np.testing.assert_allclose(a.tolil(copy=True).to_dense(), d)
    np.testing.assert_allclose(a.tobsr().to_dense(), d)
    np.testing.assert_allclose(a.todok().to_csr_like_dense(), d) if hasattr(
        a.todok(), "to_csr_like_dense"
    ) else None
    dia = a.todia()
    np.testing.assert_allclose(dia.to_csr().to_dense(), d)
    np.testing.assert_allclose(a.asformat("dense"), d)
    np.testing.assert_allclose(a.asformat("coo", copy=True).to_dense(), d)
    with pytest.raises(ValueError):
        a.asformat("nope")


def test_todia_guards_scatter():
    rng = np.random.default_rng(21)
    n = 1 << 14
    r = rng.integers(0, n, 5000)
    c = rng.integers(0, n, 5000)
    a = CsrMatrix.from_coo(n, n, r, c, np.ones(5000))
    with pytest.raises(ValueError):
        a.todia()


# -- elementwise unary ufuncs --------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["sin", "tan", "arcsin", "arctan", "sinh", "tanh", "arcsinh", "arctanh",
     "ceil", "floor", "rint", "trunc", "sign", "expm1", "log1p", "deg2rad",
     "rad2deg", "sqrt"],
)
def test_unary_ufuncs_match_scipy(name):
    d = _rand(seed=22) * 0.9  # keep arcsin/arctanh in-domain
    if name in ("sqrt", "log1p"):
        d = np.abs(d)
    a = CsrMatrix._from_dense(d)
    s = sp.csr_matrix(d)
    np.testing.assert_allclose(
        getattr(a, name)().to_dense(), np.asarray(getattr(s, name)().todense()),
        atol=1e-15,
    )
