"""MatrixMarket parser/serializer tests (reference ``spam_dok`` I/O +
round-trip test ``spam_dok/src/tests.rs:51-66``)."""

import numpy as np
import pytest
from hypothesis import given

from sparse_matrix_tpu.core import (
    DokMatrix,
    HasZeroDimensionError,
    MatrixMarketError,
    MatrixType,
    parse_matrix_market,
    to_matrix_market_string,
)
from sparse_matrix_tpu.verify.strategies import dok_matrices, finite_f64s


def test_parse_real_general():
    text = """%%MatrixMarket matrix coordinate real general
% a comment line
3 4 3
1 1 1.5
2 3 -2.0
3 4 0.0
"""
    p = parse_matrix_market(text)
    assert p.type is MatrixType.REAL
    m = p.matrix
    assert m.shape == (3, 4)
    # zero entry dropped (spam_dok/src/lib.rs:336)
    assert m.nnz() == 2
    assert m.get_element((0, 0)) == 1.5
    assert m.get_element((1, 2)) == -2.0
    assert m.get_element((2, 3)) is None


def test_parse_integer():
    text = "%%MatrixMarket matrix coordinate integer general\n2 2 2\n1 2 7\n2 1 -3\n"
    p = parse_matrix_market(text)
    assert p.type is MatrixType.INTEGER
    assert p.matrix.get_element((0, 1)) == 7
    assert p.matrix.get_element((1, 0)) == -3


def test_parse_complex():
    text = "%%MatrixMarket matrix coordinate complex general\n2 2 1\n1 2 1.5 -2.5\n"
    p = parse_matrix_market(text)
    assert p.type is MatrixType.COMPLEX
    assert p.matrix.get_element((0, 1)) == complex(1.5, -2.5)


def test_parse_symmetric_mirrors():
    # spam_dok/src/lib.rs:342-352
    text = "%%MatrixMarket matrix coordinate real symmetric\n3 3 2\n2 1 5.0\n3 3 1.0\n"
    m = parse_matrix_market(text).matrix
    assert m.get_element((1, 0)) == 5.0
    assert m.get_element((0, 1)) == 5.0
    assert m.get_element((2, 2)) == 1.0
    assert m.nnz() == 3


def test_zero_dimension_rejected():
    text = "%%MatrixMarket matrix coordinate real general\n0 3 0\n"
    with pytest.raises(HasZeroDimensionError):
        parse_matrix_market(text)


# pattern / skew-symmetric / hermitian: todo!() in the reference
# (spam_dok/src/lib.rs:373,446), implemented here.


def test_pattern_general():
    text = "%%MatrixMarket matrix coordinate pattern general\n2 3 2\n1 1\n2 3\n"
    p = parse_matrix_market(text)
    assert p.type is MatrixType.PATTERN
    assert p.matrix.get_element((0, 0)) == 1.0
    assert p.matrix.get_element((1, 2)) == 1.0
    assert p.matrix.nnz() == 2


def test_pattern_symmetric_mirrors():
    text = "%%MatrixMarket matrix coordinate pattern symmetric\n3 3 2\n2 1\n3 3\n"
    m = parse_matrix_market(text).matrix
    assert m.get_element((1, 0)) == 1.0
    assert m.get_element((0, 1)) == 1.0
    assert m.nnz() == 3


def test_pattern_skew_rejected():
    text = "%%MatrixMarket matrix coordinate pattern skew-symmetric\n2 2 1\n2 1\n"
    with pytest.raises(MatrixMarketError):
        parse_matrix_market(text)


def test_skew_symmetric_mirrors_negated():
    text = "%%MatrixMarket matrix coordinate real skew-symmetric\n3 3 2\n2 1 1.5\n3 1 -2.0\n"
    m = parse_matrix_market(text).matrix
    assert m.get_element((1, 0)) == 1.5
    assert m.get_element((0, 1)) == -1.5
    assert m.get_element((2, 0)) == -2.0
    assert m.get_element((0, 2)) == 2.0
    assert m.nnz() == 4


def test_skew_symmetric_diagonal_rejected():
    text = "%%MatrixMarket matrix coordinate real skew-symmetric\n2 2 1\n1 1 1.0\n"
    with pytest.raises(MatrixMarketError):
        parse_matrix_market(text)


def test_hermitian_conjugate_mirrors():
    text = (
        "%%MatrixMarket matrix coordinate complex hermitian\n"
        "2 2 2\n2 1 1.5 -2.5\n1 1 3.0 0.0\n"
    )
    m = parse_matrix_market(text).matrix
    assert m.get_element((1, 0)) == complex(1.5, -2.5)
    assert m.get_element((0, 1)) == complex(1.5, 2.5)
    assert m.get_element((0, 0)) == 3.0
    assert m.nnz() == 3


def test_hermitian_requires_complex():
    text = "%%MatrixMarket matrix coordinate real hermitian\n2 2 1\n2 1 1.0\n"
    with pytest.raises(MatrixMarketError):
        parse_matrix_market(text)


def test_hermitian_diagonal_must_be_real():
    text = "%%MatrixMarket matrix coordinate complex hermitian\n2 2 1\n1 1 1.0 2.0\n"
    with pytest.raises(MatrixMarketError):
        parse_matrix_market(text)


def test_bad_header():
    with pytest.raises(MatrixMarketError):
        parse_matrix_market("%%MatrixMarket matrix array real general\n2 2 4\n")


def test_nnz_mismatch():
    text = "%%MatrixMarket matrix coordinate real general\n2 2 2\n1 1 1.0\n"
    with pytest.raises(MatrixMarketError):
        parse_matrix_market(text)


@given(dok_matrices(finite_f64s(), dtype=np.float64))
def test_roundtrip(m):
    # spam_dok/src/tests.rs:51-66: serialize -> parse == identity
    text = to_matrix_market_string(m)
    m2 = parse_matrix_market(text).matrix
    assert m2.shape == m.shape
    assert m2 == m
