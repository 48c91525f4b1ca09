"""Same-pattern SpGEMM as SpMV (ops/spgemm_spmv.py, round 4).

The reduction of an amortized SpGEMM is a fixed-pattern selection-matrix
SpMV; with one side's values frozen the whole SpGEMM is ONE SpMV. Both
engines must commute with the dense/host oracle (the reference's
commuting-diagram discipline, spam_csr/src/tests.rs:93-103).
"""

import numpy as np
import pytest

from sparse_matrix_tpu.core.dok import DokMatrix
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.ops.device_sorted import EscSpgemm, padded_to_host
from sparse_matrix_tpu.ops.spgemm_spmv import FixedSideSpgemm, ReduceSpmv


def _rand_csr(rng, r, c, density=0.15):
    a = (rng.random((r, c)) < density) * rng.standard_normal((r, c))
    return CsrMatrix.from_dok(DokMatrix.from_dense(a.astype(np.float32)))


def test_esc_reduce_engines_agree():
    rng = np.random.default_rng(11)
    a = _rand_csr(rng, 90, 70)
    b = _rand_csr(rng, 70, 85)
    ref = a.to_dense() @ b.to_dense()
    e_sort = EscSpgemm(a, b, reduce="sort")
    e_spmv = EscSpgemm(a, b, reduce="spmv")
    assert e_sort._rspmv is None and e_spmv._rspmv is not None
    np.testing.assert_allclose(e_sort.multiply().to_dense(), ref, atol=1e-4)
    np.testing.assert_allclose(e_spmv.multiply().to_dense(), ref, atol=1e-4)
    # identical structure either way (row-sorted exact output)
    cs, cv = e_sort.multiply(), e_spmv.multiply()
    assert cs.nnz() == cv.nnz()
    np.testing.assert_array_equal(cs.indices, cv.indices)
    np.testing.assert_array_equal(cs.offsets, cv.offsets)


def test_esc_reduce_spmv_value_reuse():
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    a = _rand_csr(rng, 60, 60, 0.1)
    b = _rand_csr(rng, 60, 60, 0.1)
    e = EscSpgemm(a, b, reduce="spmv")
    nv = rng.standard_normal(a.nnz()).astype(np.float32)
    a2 = CsrMatrix(a.rows, a.cols, nv, a.indices, a.offsets, is_sorted=True)
    got = padded_to_host(e.multiply_device(lhs_vals=jnp.asarray(nv)))
    np.testing.assert_allclose(
        got.to_dense(), a2.to_dense() @ b.to_dense(), atol=1e-4)


@pytest.mark.parametrize("fixed", ["lhs", "rhs"])
def test_fixed_side_spgemm(fixed):
    rng = np.random.default_rng(13)
    a = _rand_csr(rng, 50, 40)
    b = _rand_csr(rng, 40, 45)
    f = FixedSideSpgemm(a, b, fixed=fixed)
    assert f.num_products > 0
    ref = a.to_dense() @ b.to_dense()
    got = f.multiply()
    assert got.invariants()
    np.testing.assert_allclose(got.to_dense(), ref, atol=1e-4)
    # varying-side update: one SpMV, no re-plan
    var = a if fixed == "rhs" else b
    nv = rng.standard_normal(var.nnz()).astype(np.float32)
    v2 = CsrMatrix(var.rows, var.cols, nv, var.indices, var.offsets,
                   is_sorted=True)
    ref2 = (v2.to_dense() @ b.to_dense() if fixed == "rhs"
            else a.to_dense() @ v2.to_dense())
    np.testing.assert_allclose(f.multiply(nv).to_dense(), ref2, atol=1e-4)


def test_fixed_side_galerkin_triple_product():
    """R @ A @ P with frozen R/P: two FixedSide multiplies track A."""
    rng = np.random.default_rng(14)
    r_ = _rand_csr(rng, 20, 60, 0.2)
    a = _rand_csr(rng, 60, 60, 0.1)
    p_ = _rand_csr(rng, 60, 20, 0.2)
    ra = FixedSideSpgemm(r_, a, fixed="lhs")  # x = A.vals
    ra_m = ra.multiply()
    rap = FixedSideSpgemm(ra_m, p_, fixed="rhs")  # x = (R A).vals
    ref = r_.to_dense() @ a.to_dense() @ p_.to_dense()
    np.testing.assert_allclose(rap.multiply().to_dense(), ref, atol=1e-3)
    # A's values drift, patterns frozen: chain the two SpMVs
    nv = rng.standard_normal(a.nnz()).astype(np.float32)
    a2 = CsrMatrix(a.rows, a.cols, nv, a.indices, a.offsets, is_sorted=True)
    ra2 = ra.multiply(nv)
    got = rap.multiply(np.asarray(ra2.vals))
    ref2 = r_.to_dense() @ a2.to_dense() @ p_.to_dense()
    np.testing.assert_allclose(got.to_dense(), ref2, atol=1e-3)


def test_fixed_side_empty_product():
    # disjoint patterns: A's columns never meet a nonempty B row
    a = CsrMatrix.from_coo(3, 4, [0, 2], [3, 3], [1.0, 2.0])
    b = CsrMatrix.from_coo(4, 3, [0, 1], [0, 1], [1.0, 1.0])
    f = FixedSideSpgemm(a, b)
    assert f.num_products == 0 and f.nnz_out == 0
    out = f.multiply()
    assert out.nnz() == 0 and (out.rows, out.cols) == (3, 3)


def test_fixed_side_dim_mismatch_and_bad_fixed():
    a = CsrMatrix.new(2, 3, dtype=np.float32)
    with pytest.raises(ValueError, match="LHS cols != RHS rows"):
        FixedSideSpgemm(a, a)
    b = CsrMatrix.new(3, 2, dtype=np.float32)
    with pytest.raises(ValueError, match="fixed"):
        FixedSideSpgemm(a, b, fixed="both")


def test_fixed_side_random_sweep_vs_dok_oracle():
    rng = np.random.default_rng(15)
    for _ in range(12):
        r, k, c = rng.integers(1, 24, 3)
        a = _rand_csr(rng, r, k, 0.3)
        b = _rand_csr(rng, k, c, 0.3)
        ref = (a.to_dok() * b.to_dok()).to_dense()  # naive DOK oracle
        for fixed in ("lhs", "rhs"):
            got = FixedSideSpgemm(a, b, fixed=fixed).multiply()
            assert got.invariants()
            np.testing.assert_allclose(got.to_dense(), ref, atol=1e-3)


def test_reduce_spmv_direct_padding_dropped():
    """ReduceSpmv never references sentinel-keyed padding slots."""
    import jax.numpy as jnp

    key = np.array([7, 3, 3, 12, 7], np.int32)
    pad = np.concatenate([key, np.full(3, 99, np.int32)])
    r = ReduceSpmv(pad, 5, rows=4, cols=4)
    assert r.nnz_out == 3
    p = jnp.asarray(np.array([1, 2, 3, 4, 5, 100, 100, 100], np.float32))
    out = r.reduce(p)
    np.testing.assert_array_equal(np.asarray(out.row), [0, 1, 3])
    np.testing.assert_array_equal(np.asarray(out.col), [3, 3, 0])
    np.testing.assert_allclose(np.asarray(out.val), [5.0, 6.0, 4.0])


def test_nonfinite_contract_and_pad_mask():
    """case167 regression (amortized fuzz): garbage non-finite pad slots
    must not leak through zero-weight window slots, and reduce='auto'
    must keep the confined sort reduction when plan-time values are
    non-finite."""
    import numpy as np

    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.ops.device_sorted import EscSpgemm

    rng = np.random.default_rng(167)
    r = rng.integers(0, 5, 24)
    c = rng.integers(0, 21, 24)
    key = np.unique(r * 21 + c)
    r, c = key // 21, key % 21
    a = CsrMatrix.from_coo(5, 21, r, c, rng.standard_normal(len(r)))
    bv = rng.standard_normal(8)
    bv[3] = np.inf
    br = np.sort(rng.choice(21, 8, replace=False))
    b = CsrMatrix.from_coo(21, 1, br, np.zeros(8, np.int64), bv)
    ref = a.to_dense().astype(np.float64) @ b.to_dense().astype(np.float64)
    # auto must route non-finite plan values to the sort reduction
    e = EscSpgemm(a, b, reduce="auto")
    assert e._rspmv is None
    got = e.multiply().to_dense()
    fin = np.isfinite(ref)
    np.testing.assert_allclose(got[fin], ref[fin], rtol=1e-4, atol=1e-6)
    # the finite-value case through the spmv reduction stays exact even
    # though pad slots hold garbage (masked in ReduceSpmv.reduce)
    b2 = CsrMatrix.from_coo(21, 1, br, np.zeros(8, np.int64),
                            np.where(np.isfinite(bv), bv, 7.0))
    e2 = EscSpgemm(a, b2, reduce="spmv")
    ref2 = a.to_dense().astype(np.float64) @ b2.to_dense().astype(np.float64)
    np.testing.assert_allclose(e2.multiply().to_dense(), ref2,
                               rtol=1e-4, atol=1e-6)


def test_params_as_pytree_apply_matches_direct():
    """VERDICT r4 #5: the engines must compose inside an outer jit with
    their plan arrays as ARGUMENTS (as_pytree/apply), exactly like
    AmgRefresh.device_fn — and produce the same values as the direct
    call."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    a = _rand_csr(rng, 48, 48, 0.12)
    b = _rand_csr(rng, 48, 48, 0.12)

    f = FixedSideSpgemm(a, b, fixed="lhs")
    prm = f.as_pytree()
    nv = rng.standard_normal(b.nnz()).astype(np.float32)

    @jax.jit
    def run_f(p, v):
        return f.apply(p, v).val

    np.testing.assert_allclose(
        np.asarray(run_f(prm, jnp.asarray(nv))),
        np.asarray(f.multiply_device(nv).val), rtol=1e-6, atol=1e-6)

    e = EscSpgemm(a, b, reduce="spmv")
    eprm = e.as_pytree()
    assert "rspmv" in eprm

    @jax.jit
    def run_e(p, rv):
        return e.multiply_device(rhs_vals=rv, params=p).val

    rv = rng.standard_normal(b.nnz()).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(run_e(eprm, jnp.asarray(rv))),
        np.asarray(e.multiply_device(rhs_vals=jnp.asarray(rv)).val),
        rtol=1e-6, atol=1e-6)


def test_runtime_nonfinite_boundary_fixed_side():
    """VERDICT r4 #6: the documented contract at the RUNTIME boundary —
    a value stream that turns non-finite AFTER planning flows through the
    SpMV reduction with dense-window semantics. Pinned invariants:
    (a) every output entry whose products include the non-finite value is
    non-finite; (b) every output the engine reports as finite matches the
    oracle exactly (contamination may widen the non-finite set across a
    shared gather window, never corrupt a value it reports as finite)."""
    rng = np.random.default_rng(31)
    a = _rand_csr(rng, 40, 40, 0.15)
    b = _rand_csr(rng, 40, 40, 0.15)
    f = FixedSideSpgemm(a, b, fixed="lhs")  # planned on finite values
    nv = b.vals.copy()
    nv[len(nv) // 2] = np.inf  # runtime drift to non-finite

    # structural oracle: per-output sums over REAL products only — the
    # engine's contract (both the dense oracle and the NaN-aware DOK mul
    # mint 0 * inf = NaN at structurally ABSENT pairs, which the plan
    # never multiplies)
    acc = {}
    ra = a.row_ids()
    boff = b.offsets.astype(np.int64)
    for pos in range(a.nnz()):
        r, k, v = int(ra[pos]), int(a.indices[pos]), float(a.vals[pos])
        for q in range(boff[k], boff[k + 1]):
            c = int(b.indices[q])
            acc[(r, c)] = acc.get((r, c), 0.0) + v * float(nv[q])
    ref = np.zeros((a.rows, b.cols))
    for (r, c), v in acc.items():
        ref[r, c] = v
    got = f.multiply(nv).to_dense()
    struct_nonfinite = ~np.isfinite(ref)
    got_nonfinite = ~np.isfinite(got)
    # (a) structurally non-finite outputs stay non-finite
    assert np.all(got_nonfinite[struct_nonfinite])
    # (b) outputs reported finite are exact
    fin = ~got_nonfinite
    np.testing.assert_allclose(got[fin], ref[fin], rtol=1e-4, atol=1e-5)
    # the strict-confinement escape the docs point drifting-value users
    # at: the sort reduction confines non-finites exactly
    e = EscSpgemm(a, b, reduce="sort")
    got_s = padded_to_host(e.multiply_device(rhs_vals=nv)).to_dense()
    np.testing.assert_array_equal(~np.isfinite(got_s), struct_nonfinite)
    np.testing.assert_allclose(got_s[~struct_nonfinite],
                               ref[~struct_nonfinite], rtol=1e-4, atol=1e-5)


def test_int32_cols_guard():
    a = CsrMatrix.from_coo(2, 2**31 + 5, [0, 1], [0, 5], [1.0, 2.0])
    b = CsrMatrix.from_coo(2, 2, [0, 1], [0, 1], [1.0, 1.0])
    with pytest.raises(ValueError, match="int32"):
        FixedSideSpgemm(b, a)
    with pytest.raises(ValueError, match="int32"):
        ReduceSpmv(np.zeros(4, np.int64), 4, rows=2, cols=2**31 + 5)
