"""DOK oracle property tests (reference ``spam_dok/src/tests.rs``)."""

import numpy as np
import pytest
from hypothesis import given
from hypothesis import strategies as st

from sparse_matrix_tpu.core import DokMatrix, MatrixIndexError
from sparse_matrix_tpu.verify.strategies import (
    add_pairs,
    dok_matrices,
    mul_pairs,
    wrapping_int8s,
)

INT8 = wrapping_int8s()


def test_new_rejects_zero_dims():
    with pytest.raises(ValueError):
        DokMatrix.new(0, 3)
    with pytest.raises(ValueError):
        DokMatrix.new(3, 0)


@given(st.integers(min_value=1, max_value=8))
def test_new_invariants(n):
    # spam_dok/src/tests.rs:29-36
    m = DokMatrix.new(n, n + 1, dtype=np.int8)
    assert m.invariants()
    assert m.nnz() == 0
    assert m.shape == (n, n + 1)


@given(st.integers(min_value=1, max_value=8))
def test_identity_invariants(n):
    # spam_dok/src/tests.rs:38-44
    m = DokMatrix.identity(n, dtype=np.int8)
    assert m.invariants()
    assert m.nnz() == n
    for i in range(n):
        for j in range(n):
            expected = np.int8(1) if i == j else None
            assert m.get_element((i, j)) == expected


@given(dok_matrices(INT8, dtype=np.int8))
def test_generator_invariants(m):
    # spam_dok/src/tests.rs:46-49
    assert m.invariants()


@given(add_pairs(INT8, dtype=np.int8))
def test_add_invariants(pair):
    # spam_dok/src/tests.rs:69-75
    with np.errstate(over="ignore"):
        s = pair.a + pair.b
    assert s.invariants()
    for pos in set(pair.a.entries) | set(pair.b.entries):
        expected = np.int8(pair.a.entries.get(pos, np.int8(0)) + pair.b.entries.get(pos, np.int8(0)))
        got = s.get_element(pos)
        assert (got if got is not None else np.int8(0)) == expected


@given(mul_pairs(INT8, dtype=np.int8))
def test_mul_invariants_and_dense_oracle(pair):
    # spam_dok/src/tests.rs:77-83 — check against a dense numpy product
    with np.errstate(over="ignore"):
        p = pair.a * pair.b
        dense = pair.a.to_dense().astype(np.int8) @ pair.b.to_dense().astype(np.int8)
    assert p.invariants()
    np.testing.assert_array_equal(p.to_dense().astype(np.int8), dense.astype(np.int8))


@given(dok_matrices(INT8, dtype=np.int8))
def test_transpose(m):
    # spam_dok/src/tests.rs:85-88
    t = m.transpose()
    assert t.invariants()
    assert t.shape == (m.cols, m.rows)
    assert t.transpose() == m


@given(
    dok_matrices(INT8, dtype=np.int8),
    st.integers(min_value=0, max_value=10),
    st.integers(min_value=0, max_value=10),
    INT8,
)
def test_set_get_consistency(m, i, j, t):
    # spam_dok/src/tests.rs:90-111
    if i < m.rows and j < m.cols:
        old = m.get_element((i, j))
        returned = m.set_element((i, j), t)
        assert returned == old
        got = m.get_element((i, j))
        if t == 0:
            assert got is None
        else:
            assert got == t
        assert m.invariants()
    else:
        with pytest.raises(MatrixIndexError):
            m.get_element((i, j))
        with pytest.raises(MatrixIndexError):
            m.set_element((i, j), t)


@given(dok_matrices(INT8, dtype=np.int8))
def test_iter_lexicographic(m):
    # spam_dok/src/lib.rs:96-99 — lexicographic (row, col) order
    positions = [pos for pos, _ in m.iter_entries()]
    assert positions == sorted(positions)


def test_mul_dim_mismatch():
    a = DokMatrix.new(2, 3, dtype=np.int8)
    b = DokMatrix.new(2, 3, dtype=np.int8)
    with pytest.raises(ValueError, match="LHS cols != RHS rows"):
        a * b


def test_add_dim_mismatch():
    a = DokMatrix.new(2, 3, dtype=np.int8)
    b = DokMatrix.new(3, 2, dtype=np.int8)
    with pytest.raises(ValueError, match="identical dimensions"):
        a + b


def test_nan_times_implicit_zero_propagates():
    # reference dense-loop semantics: NaN * implicit 0 = NaN fills the row
    a = DokMatrix.new(1, 2, dtype=np.float64)
    a.set_element((0, 0), float("nan"))
    b = DokMatrix.new(2, 2, dtype=np.float64)
    b.set_element((1, 1), 1.0)
    p = a * b
    # column 0: nan*0 + 0*0 = nan; column 1: nan*0 + 0*1 = nan
    assert np.isnan(p.get_element((0, 0)))
    assert np.isnan(p.get_element((0, 1)))


def test_debug_in_scientific_notation():
    m = DokMatrix.new(2, 2, dtype=np.float64)
    m.set_element((0, 1), 1234.5)
    s = m.debug_in_scientific_notation()
    assert s.startswith("{(0, 1, ") and "e" in s
