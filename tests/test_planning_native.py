"""Native format-planning substrate: offset histograms, blockwise chunk
sorts, fused Jacobi-smoother values — and parity of the planners that use
them with their pure-numpy fallbacks.

These kernels exist because AMG setup plans ~15 device operators per
hierarchy and the numpy structure analyses (np.unique over element
offsets, global argsort over chunk keys) dominated the 2048^2 setup
profile. Parity here is the guard that the fast path computes the same
plans (reference analog: the load-balancer postcondition tests around
``rows_to_threads``, /root/reference/spam_csr/src/mul_hash.rs:38-64).
"""

import numpy as np
import pytest

from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.native import (
    blockwise_argsort_native,
    jacobi_smoother_native,
    native_available,
    offset_hist_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)

rng = np.random.default_rng(7)


def _rand_csr(rows, cols, nnz, *, local=False):
    r = rng.integers(0, rows, nnz)
    c = (
        np.clip(r + rng.integers(-9, 10, nnz), 0, cols - 1)
        if local
        else rng.integers(0, cols, nnz)
    )
    v = rng.standard_normal(nnz)
    return CsrMatrix.from_coo(rows, cols, r, c, v)


@pytest.mark.parametrize("local", [False, True])
def test_offset_hist_matches_numpy(local):
    m = _rand_csr(200, 230, 1500, local=local)
    res = offset_hist_native(m.rows, m.offsets, m.indices, 500)
    offs_np, counts_np = np.unique(
        m.indices.astype(np.int64) - m.row_ids(), return_counts=True
    )
    assert res != -1 and res is not None
    offs, counts = res
    np.testing.assert_array_equal(offs, offs_np)
    np.testing.assert_array_equal(counts, counts_np)


def test_offset_hist_early_exit_on_cap():
    m = _rand_csr(300, 300, 4000)
    ndistinct = len(np.unique(m.indices.astype(np.int64) - m.row_ids()))
    assert offset_hist_native(m.rows, m.offsets, m.indices, ndistinct - 1) == -1
    assert offset_hist_native(m.rows, m.offsets, m.indices, ndistinct) != -1


def test_offset_hist_single_diagonal_run():
    # the run-along-a-diagonal fast path (last_o carries across rows)
    m = CsrMatrix.from_coo(64, 64, np.arange(64), np.arange(64), np.ones(64))
    offs, counts = offset_hist_native(m.rows, m.offsets, m.indices, 4)
    np.testing.assert_array_equal(offs, [0])
    np.testing.assert_array_equal(counts, [64])


def test_blockwise_argsort_matches_global_argsort():
    # keys grouped so block-major order equals global order (the planner's
    # precondition: chunk keys' high bits are the row block)
    nblocks, per = 13, 101
    keys = []
    for b in range(nblocks):
        keys.append(b * 10_000 + rng.integers(0, 10_000, per).astype(np.uint64))
    keys = np.concatenate(keys)
    starts = np.arange(0, (nblocks + 1) * per, per, dtype=np.int64)
    perm = blockwise_argsort_native(starts, keys)
    np.testing.assert_array_equal(keys[perm], np.sort(keys))
    # stability: equal keys keep original relative order
    ref = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(perm, ref)


def test_blockwise_argsort_empty_blocks():
    keys = np.array([5, 3, 3, 1], dtype=np.uint64)
    starts = np.array([0, 0, 3, 3, 4], dtype=np.int64)
    perm = blockwise_argsort_native(starts, keys)
    np.testing.assert_array_equal(perm, [1, 2, 0, 3])


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_jacobi_smoother_native_matches_numpy(dtype):
    m = _rand_csr(120, 120, 900, local=True)
    # force an explicit diagonal everywhere
    dok = m.to_dok()
    for i in range(120):
        dok.set_element((i, i), 4.0)
    m = CsrMatrix.from_dok(dok)
    m = CsrMatrix(m.rows, m.cols, m.vals.astype(dtype), m.indices, m.offsets,
                  is_sorted=m.is_sorted)
    ws = rng.uniform(0.1, 0.9, 120)
    out = jacobi_smoother_native(m.rows, m.offsets, m.indices, m.vals, ws)
    rids = m.row_ids()
    on_diag = m.indices.astype(np.int64) == rids
    ref64 = -m.vals.astype(np.float64) * ws[rids]
    ref64[on_diag] += 1.0
    ref = ref64.astype(dtype)  # native rounds once, at the end
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_jacobi_smoother_native_missing_diag_returns_false():
    m = CsrMatrix.from_coo(3, 3, [0, 1, 2], [1, 1, 2], [1.0, 2.0, 3.0])
    assert (
        jacobi_smoother_native(m.rows, m.offsets, m.indices, m.vals, np.ones(3))
        is False
    )


def test_plan_aligned_parity_native_vs_fallback(monkeypatch):
    """The chunk-sorted planner must produce the same SpMV result whether
    the permutation comes from the native blockwise sort or the numpy
    global argsort."""
    import sparse_matrix_tpu.formats.aligned as aligned

    m = _rand_csr(700, 650, 9000, local=True)
    x = rng.standard_normal(650).astype(np.float32)

    def dense_of(plan):
        d = np.zeros((m.rows, m.cols), np.float64)
        for s in range(plan.num_slabs):
            for sub in range(8):
                w0 = int(plan.col_off[s * 8 + sub])
                rb = int(plan.chunk_rb[s * 8 + sub])
                vv, ll = plan.vals[s, sub], plan.lane[s, sub]
                nz = np.nonzero(vv)[0]
                d[rb * 128 + nz, w0 * 128 + ll[nz].astype(np.int64)] += vv[nz]
        return d

    p_native = aligned.plan_aligned(m)
    monkeypatch.setattr(
        "sparse_matrix_tpu.native.loader.blockwise_argsort_native",
        lambda starts, keys: None,
    )
    # aligned.py imports inside the helper, so patch the symbol it resolves
    import sparse_matrix_tpu.native as native_pkg

    monkeypatch.setattr(native_pkg, "blockwise_argsort_native", lambda s, k: None)
    p_fallback = aligned.plan_aligned(m)
    assert p_native.num_slabs == p_fallback.num_slabs
    assert (p_native.spill is None) == (p_fallback.spill is None)
    np.testing.assert_allclose(dense_of(p_native), dense_of(p_fallback))


def test_try_dia_memoized_and_invalidated():
    from sparse_matrix_tpu.formats.dia import try_dia_from_csr
    from sparse_matrix_tpu.solvers import poisson_2d_csr

    a = poisson_2d_csr(16, dtype=np.float32)
    d1 = try_dia_from_csr(a)
    assert d1 is not None
    assert try_dia_from_csr(a) is d1  # memo hit
    old = a.set_element((0, 1), 123.0)
    assert old is None or old is not None
    d2 = try_dia_from_csr(a)
    assert d2 is not d1  # set_element invalidated the cache
    assert d2.to_csr().get_element((0, 1)) == np.float32(123.0)


def test_row_ids_memo_invalidated_by_set_element():
    m = _rand_csr(40, 40, 100)
    r1 = m.row_ids()
    assert m.row_ids() is r1
    m.set_element((39, 39), 1.0)  # may append a new entry
    r2 = m.row_ids()
    assert len(r2) == m.nnz()


def test_spill_sub_slabs_parity_with_count_slabs():
    """The chunk-level spill cost estimator must equal _count_slabs on the
    materialized spilled-entry matrix (the decision input it replaced)."""
    from sparse_matrix_tpu.formats.aligned import _chunk_sorted, _spill_sub_slabs
    from sparse_matrix_tpu.formats.lanepack import _count_slabs

    for trial in range(12):
        m = _rand_csr(
            int(rng.integers(50, 500)), int(rng.integers(50, 500)),
            int(rng.integers(20, 3000)), local=bool(trial % 2),
        )
        perm, ck, wtot = _chunk_sorted(m)
        nnz = m.nnz()
        new_chunk = np.r_[True, ck[1:] != ck[:-1]]
        heads = np.nonzero(new_chunk)[0]
        cnt = np.diff(np.append(heads, nnz))
        small = cnt < 32
        if not small.any():
            continue
        est = _spill_sub_slabs(
            (ck[heads] // 128)[small].astype(np.int64), cnt[small], wtot
        )
        spill_mask = np.repeat(small, cnt)
        sp = np.sort(perm[spill_mask])
        offs = np.zeros(m.rows + 1, np.int64)
        offs[1:] = np.bincount(m.row_ids()[sp], minlength=m.rows)
        np.cumsum(offs, out=offs)
        sub = CsrMatrix(m.rows, m.cols, m.vals[sp], m.indices[sp], offs,
                        is_sorted=True)
        assert est == _count_slabs(sub, 1), trial


def test_plan_aligned_spill_engages_on_hub_rows():
    """Hub rows (thousands of count-1 aligned chunks that pack densely in
    the general plan) must trigger the spill sub-plan, and the hybrid
    apply must stay correct."""
    from sparse_matrix_tpu.formats.aligned import plan_aligned
    from sparse_matrix_tpu.ops.operator import SpmvOperator

    n = 2048
    r0 = np.repeat(np.arange(n), 3)
    c0 = np.clip(r0 + np.tile([-1, 0, 1], n), 0, n - 1)
    hub_r, hub_c = [], []
    for hr in rng.choice(n, 4, replace=False):
        hub_r.append(np.full(1024, hr))
        hub_c.append(rng.choice(n, 1024, replace=False))
    m = CsrMatrix.from_coo(
        n, n, np.r_[r0, np.concatenate(hub_r)], np.r_[c0, np.concatenate(hub_c)],
        rng.standard_normal(3 * n + 4 * 1024),
    )
    p = plan_aligned(m)
    assert p.spill is not None and p.spill.nnz > 3000
    x = rng.standard_normal(n).astype(np.float32)
    ref = np.zeros(n)
    np.add.at(ref, m.row_ids(), m.vals * x[m.indices.astype(np.int64)])
    y = np.asarray(SpmvOperator(m, force="aligned")(x))
    assert np.abs(y - ref).max() < 1e-4 * np.abs(ref).max()


def test_flops_per_row_native_matches_numpy():
    from sparse_matrix_tpu.ops.spgemm_host import flops_per_row

    a = _rand_csr(80, 60, 400)
    b = _rand_csr(60, 90, 500)
    got = flops_per_row(a, b)  # native path (skipif guards availability)
    rhs_row_nnz = np.diff(b.offsets)
    ref = np.add.reduceat(
        np.r_[rhs_row_nnz[a.indices.astype(np.int64)], 0], a.offsets[:-1]
    ) * (np.diff(a.offsets) > 0)
    np.testing.assert_array_equal(got, ref)


def test_colsplit_native_matches_numpy_masking():
    from sparse_matrix_tpu.native import colsplit_native

    for trial in range(6):
        rows = int(rng.integers(5, 300))
        cols = int(rng.integers(100, 1500))
        m = _rand_csr(rows, cols, int(rng.integers(10, 4000)))
        nsplit = int(rng.integers(2, 6))
        bounds = np.linspace(0, cols, nsplit + 1).astype(np.int64)
        parts = colsplit_native(m.rows, bounds, m.offsets, m.indices, m.vals)
        cid = m.indices.astype(np.int64)
        rid = m.row_ids()
        for s, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            mask = (cid >= lo) & (cid < hi)
            offs = np.zeros(rows + 1, np.int64)
            offs[1:] = np.bincount(rid[mask], minlength=rows)
            np.cumsum(offs, out=offs)
            np.testing.assert_array_equal(parts[0][s], offs)
            np.testing.assert_array_equal(parts[1][s], (cid[mask] - lo).astype(np.uint32))
            np.testing.assert_array_equal(parts[2][s], m.vals[mask])


def test_lanepack_plan_native_matches_numpy():
    """The fused native lanepack sort+fill computes bit-identical plans to
    the numpy lexsort path (every slab array and metadata field), across
    local/scattered structures, kw widths, f32/f64 values, and tall/wide
    restriction-like shapes."""
    import sparse_matrix_tpu.native.loader as loader
    from sparse_matrix_tpu.formats.lanepack import plan_lanepack

    cases = [
        _rand_csr(200, 230, 1500, local=True),
        _rand_csr(300, 700, 4000),
        _rand_csr(1000, 90, 3000, local=True),  # tall (prolongator-like)
        _rand_csr(90, 1300, 3000),  # wide (restriction-like)
        CsrMatrix.from_coo(5, 5, np.array([0]), np.array([4]), np.array([2.0])),
    ]
    m64 = cases[0]
    cases.append(
        CsrMatrix(
            m64.rows, m64.cols, m64.vals.astype(np.float64), m64.indices,
            m64.offsets, is_sorted=m64.is_sorted,
        )
    )
    for m in cases:
        for kw in (None, 1, 4):
            a = plan_lanepack(m, kw=kw)
            saved, saved_tried = loader._LIB, loader._TRIED
            loader._LIB, loader._TRIED = None, True
            try:
                b = plan_lanepack(m, kw=kw)
            finally:
                loader._LIB, loader._TRIED = saved, saved_tried
            assert (a.kw, a.pack) == (b.kw, b.pack)
            for f in (
                "vals", "lane", "ends", "starts", "rb_a", "rb_b", "split",
                "chunk_rb", "col_off", "rb_mask",
            ):
                np.testing.assert_array_equal(
                    getattr(a, f), getattr(b, f), err_msg=f
                )


def test_spa_spgemm_matches_hash_engine():
    """The Gustavson SPA phases (dense epoch-marked accumulator) produce
    byte-identical CSR output to the hash phases: products are generated in
    the same (p, q) order, so per-(row, col) accumulation order — and hence
    f32 rounding — is identical."""
    import sparse_matrix_tpu.native.loader as loader
    from sparse_matrix_tpu.native import spgemm_hash_native

    for sort in (True, False):
        for trial in range(4):
            a = _rand_csr(120, 90, int(rng.integers(100, 2500)))
            b = _rand_csr(90, 140, int(rng.integers(100, 2500)))
            c_spa = spgemm_hash_native(a, b, output_sorted=sort)
            saved = loader._SPA_COLS_LIMIT
            loader._SPA_COLS_LIMIT = 0  # force the hash phases
            try:
                c_hash = spgemm_hash_native(a, b, output_sorted=sort)
            finally:
                loader._SPA_COLS_LIMIT = saved
            np.testing.assert_array_equal(c_spa.offsets, c_hash.offsets)
            if sort:
                np.testing.assert_array_equal(c_spa.indices, c_hash.indices)
                np.testing.assert_array_equal(c_spa.vals, c_hash.vals)
            else:  # unsorted rows may differ in order; compare as sets
                for i in range(a.rows):
                    lo, hi = int(c_spa.offsets[i]), int(c_spa.offsets[i + 1])
                    o1 = np.argsort(c_spa.indices[lo:hi])
                    o2 = np.argsort(c_hash.indices[lo:hi])
                    np.testing.assert_array_equal(
                        c_spa.indices[lo:hi][o1], c_hash.indices[lo:hi][o2]
                    )
                    np.testing.assert_array_equal(
                        c_spa.vals[lo:hi][o1], c_hash.vals[lo:hi][o2]
                    )
