"""CSR commuting-diagram property tests (reference ``spam_csr/src/tests.rs``).

The contract (tests.rs:93-103): for every op, DOK-op-then-convert equals
convert-then-CSR-op (compared through DOK, which drops explicit zeros). Every
test runs through both conversion paths: ``from_dok`` (sorted) and
``from_dok_shuffled`` (randomized within-row order, unsorted) — the
adversarial-order generator that surfaces order-sensitivity bugs.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparse_matrix_tpu.core import DokMatrix, MatrixIndexError
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops import spgemm_esc_host, spgemm_hash_host
from sparse_matrix_tpu.verify.strategies import (
    add_pairs,
    dok_matrices,
    mul_pairs,
    wrapping_int8s,
)

INT8 = wrapping_int8s()


def both_conversions(dok, seed=0):
    """Yield (kind, csr) for the sorted and shuffled-unsorted conversion paths."""
    rng = np.random.default_rng(seed)
    yield "sorted", CsrMatrix.from_dok(dok)
    yield "unsorted", CsrMatrix.from_dok_shuffled(dok, rng)


# -- construction (tests.rs:128-160) ----------------------------------------


@given(st.integers(min_value=1, max_value=8), st.integers(min_value=1, max_value=8))
def test_new_commutes(r, c):
    m = CsrMatrix.new(r, c, dtype=np.int8)
    assert m.invariants()
    assert m.nnz() == 0
    assert m.to_dok() == DokMatrix.new(r, c, dtype=np.int8)


@given(st.integers(min_value=1, max_value=8))
def test_identity_commutes(n):
    m = CsrMatrix.identity(n, dtype=np.int8)
    assert m.invariants()
    assert m.to_dok() == DokMatrix.identity(n, dtype=np.int8)


def test_new_rejects_zero_dims():
    with pytest.raises(ValueError):
        CsrMatrix.new(0, 1)


# -- conversion round-trip (tests.rs:180-197) --------------------------------


@given(dok_matrices(INT8, dtype=np.int8))
def test_dok_roundtrip(m):
    for kind, csr in both_conversions(m):
        assert csr.invariants(), kind
        assert csr.to_dok() == m, kind


@given(dok_matrices(INT8, dtype=np.int8))
def test_rows_cols(m):
    # tests.rs:207-244
    for _kind, csr in both_conversions(m):
        assert csr.rows == m.rows
        assert csr.cols == m.cols
        assert csr.nnz() == m.nnz()


# -- element access (tests.rs:247-312) ---------------------------------------


@given(dok_matrices(INT8, dtype=np.int8))
def test_get_element_exhaustive(m):
    # exhaustive over all positions, as tests.rs:247-271
    for kind, csr in both_conversions(m):
        for i in range(m.rows):
            for j in range(m.cols):
                assert csr.get_element((i, j)) == m.get_element((i, j)), kind
        with pytest.raises(MatrixIndexError):
            csr.get_element((m.rows, 0))


@given(
    dok_matrices(INT8, dtype=np.int8),
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=0, max_value=6),
    INT8,
)
def test_set_element_commutes(m, i, j, t):
    # tests.rs:275-312 — returned old value must match DOK's
    for kind, csr in both_conversions(m):
        if i < m.rows and j < m.cols:
            dok = DokMatrix(m.rows, m.cols, dict(m.entries), dtype=np.int8)
            old_dok = dok.set_element((i, j), t)
            old_csr = csr.set_element((i, j), t)
            # DOK returns the old *stored* value; CSR may store explicit zeros
            # only after zero-writes, which the generator never produces here,
            # so old values agree.
            assert old_csr == old_dok, kind
            assert csr.invariants(), kind
            assert csr.to_dok() == dok, kind
        else:
            with pytest.raises(MatrixIndexError):
                csr.set_element((i, j), t)


def test_set_element_zero_is_explicit():
    # CSR stores explicit zeros (spam_csr/src/lib.rs:215-254 has no zero-drop)
    csr = CsrMatrix.identity(2, dtype=np.int8)
    old = csr.set_element((0, 1), np.int8(0))
    assert old is None
    assert csr.nnz() == 3
    assert csr.invariants()
    # and they vanish through DOK conversion
    assert csr.to_dok() == DokMatrix.identity(2, dtype=np.int8)


# -- transpose (tests.rs:315-332) ---------------------------------------------


@given(dok_matrices(INT8, dtype=np.int8))
def test_transpose_commutes(m):
    for kind, csr in both_conversions(m):
        t = csr.transpose()
        assert t.invariants(), kind
        assert t.to_dok() == m.transpose(), kind


# -- add/sub (tests.rs:335-354) ------------------------------------------------


@given(add_pairs(INT8, dtype=np.int8))
def test_add_commutes(pair):
    with np.errstate(over="ignore"):
        expected = pair.a + pair.b
        for (ka, ca), (kb, cb) in zip(both_conversions(pair.a, 1), both_conversions(pair.b, 2)):
            s = ca + cb
            assert s.invariants(), (ka, kb)
            assert s.to_dok() == expected, (ka, kb)


@given(add_pairs(INT8, dtype=np.int8))
def test_sub_commutes(pair):
    with np.errstate(over="ignore"):
        expected = pair.a - pair.b
        for (ka, ca), (kb, cb) in zip(both_conversions(pair.a, 1), both_conversions(pair.b, 2)):
            s = ca - cb
            assert s.invariants(), (ka, kb)
            assert s.to_dok() == expected, (ka, kb)


def test_add_dim_mismatch_message():
    a = CsrMatrix.new(2, 3, dtype=np.int8)
    b = CsrMatrix.new(3, 2, dtype=np.int8)
    with pytest.raises(ValueError, match="matrices must have identical dimensions"):
        a + b


# -- SpGEMM (tests.rs:357-371) -------------------------------------------------


@settings(max_examples=30)
@given(mul_pairs(INT8, dtype=np.int8))
def test_spgemm_hash_commutes(pair):
    with np.errstate(over="ignore"):
        expected = pair.a * pair.b
        for (ka, ca), (kb, cb) in zip(both_conversions(pair.a, 1), both_conversions(pair.b, 2)):
            for output_sorted in (False, True):
                p = spgemm_hash_host(ca, cb, output_sorted=output_sorted, force_python=True)
                assert p.invariants(), (ka, kb, output_sorted)
                assert p.is_sorted == output_sorted
                assert p.to_dok() == expected, (ka, kb, output_sorted)


@settings(max_examples=30)
@given(mul_pairs(st.integers(min_value=-100, max_value=100).map(np.int64), dtype=np.int64))
def test_spgemm_native_commutes(pair):
    from sparse_matrix_tpu.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    expected = pair.a * pair.b
    for (ka, ca), (kb, cb) in zip(both_conversions(pair.a, 1), both_conversions(pair.b, 2)):
        for output_sorted in (False, True):
            p = spgemm_hash_host(ca, cb, output_sorted=output_sorted)
            assert p.invariants(), (ka, kb, output_sorted)
            assert p.to_dok() == expected, (ka, kb, output_sorted)


@settings(max_examples=30)
@given(mul_pairs(INT8, dtype=np.int8))
def test_spgemm_esc_commutes(pair):
    with np.errstate(over="ignore"):
        expected = pair.a * pair.b
        for (ka, ca), (kb, cb) in zip(both_conversions(pair.a, 1), both_conversions(pair.b, 2)):
            p = spgemm_esc_host(ca, cb)
            assert p.invariants(), (ka, kb)
            assert p.to_dok() == expected, (ka, kb)


def test_spgemm_dim_mismatch():
    a = CsrMatrix.new(2, 3, dtype=np.float64)
    b = CsrMatrix.new(2, 3, dtype=np.float64)
    with pytest.raises(ValueError, match="LHS cols != RHS rows"):
        spgemm_hash_host(a, b)


# -- iteration consistency (tests.rs:408-425) ----------------------------------


@given(dok_matrices(INT8, dtype=np.int8))
def test_iter_matches_entries(m):
    for kind, csr in both_conversions(m):
        seen = {}
        prev = None
        for (r, c), v in csr.iter_entries():
            seen[(r, c)] = seen.get((r, c), np.int8(0)) + v
            if csr.is_sorted:
                assert prev is None or (r, c) > prev, kind
            prev = (r, c)
        assert seen == dict(m.entries), kind


# -- planner (mul_hash.rs:204-224) ---------------------------------------------


@given(mul_pairs(INT8, dtype=np.int8), st.integers(min_value=1, max_value=8))
def test_partition_rows_postconditions(pair, parts):
    from sparse_matrix_tpu.ops import flops_per_row, partition_rows_by_flops

    a = CsrMatrix.from_dok(pair.a)
    b = CsrMatrix.from_dok(pair.b)
    flops = flops_per_row(a, b)
    assert len(flops) == a.rows
    bounds = partition_rows_by_flops(flops, parts)
    assert len(bounds) == parts + 1
    assert bounds[0] == 0
    assert bounds[-1] == a.rows
    assert np.all(np.diff(bounds) >= 0)


def test_native_partition_matches_python():
    from sparse_matrix_tpu.native import load_library, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    from sparse_matrix_tpu.ops import partition_rows_by_flops

    lib = load_library()
    rng = np.random.default_rng(3)
    flops = rng.integers(0, 50, size=100).astype(np.int64)
    for parts in (1, 2, 5, 8):
        out = np.zeros(parts + 1, dtype=np.int64)
        lib.spmx_partition_rows(100, flops, parts, out)
        np.testing.assert_array_equal(out, partition_rows_by_flops(flops, parts))


def test_apply_elementwise_general_f():
    # the reference API takes an arbitrary f (spam_csr/src/lib.rs:83-148)
    import numpy as _np

    rng = np.random.default_rng(11)
    a = (rng.random((20, 20)) < 0.2) * rng.standard_normal((20, 20))
    b = (rng.random((20, 20)) < 0.2) * rng.standard_normal((20, 20))
    A = CsrMatrix.from_dok(DokMatrix.from_dense(a))
    B = CsrMatrix.from_dok(DokMatrix.from_dense(b))
    out = A.apply_elementwise(B, _np.maximum)
    union = (a != 0) | (b != 0)
    expected = np.where(union, np.maximum(a, b), 0.0)
    np.testing.assert_allclose(out.to_dense(), expected)
