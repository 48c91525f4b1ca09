"""Fast (native C) MatrixMarket parsing path vs the Python parser."""

import numpy as np
import pytest
from hypothesis import given

from sparse_matrix_tpu.core import (
    HasZeroDimensionError,
    MatrixMarketError,
    parse_matrix_market,
    parse_matrix_market_csr,
    to_matrix_market_string,
)
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.verify.strategies import dok_matrices, finite_f64s


@given(dok_matrices(finite_f64s(), dtype=np.float64))
def test_fast_parser_matches_python(m):
    text = to_matrix_market_string(m)
    fast = parse_matrix_market_csr(text)
    slow = CsrMatrix.from_dok(parse_matrix_market(text).matrix)
    assert fast == slow


def test_fast_parser_errors():
    with pytest.raises(HasZeroDimensionError):
        parse_matrix_market_csr("%%MatrixMarket matrix coordinate real general\n0 1 0\n")
    with pytest.raises(MatrixMarketError):
        parse_matrix_market_csr("%%MatrixMarket matrix coordinate real general\n2 2 2\n1 1 1.0\n")
    with pytest.raises(MatrixMarketError):
        parse_matrix_market_csr("%%MatrixMarket matrix coordinate real general\n2 2 1\n3 1 1.0\n")
    with pytest.raises(MatrixMarketError):
        # real hermitian is invalid (hermitian requires complex entries)
        parse_matrix_market_csr("%%MatrixMarket matrix coordinate real hermitian\n2 2 1\n2 1 1.0\n")
    with pytest.raises(MatrixMarketError):
        # skew-symmetric entries must be strictly off-diagonal
        parse_matrix_market_csr("%%MatrixMarket matrix coordinate real skew-symmetric\n2 2 1\n1 1 1.0\n")


def test_fast_parser_skew_symmetric():
    t = "%%MatrixMarket matrix coordinate real skew-symmetric\n3 3 2\n2 1 1.5\n3 1 -2.0\n"
    d = parse_matrix_market_csr(t).to_dense()
    assert d[1, 0] == 1.5 and d[0, 1] == -1.5
    assert d[2, 0] == -2.0 and d[0, 2] == 2.0
    slow = CsrMatrix.from_dok(parse_matrix_market(t).matrix).to_dense()
    assert (d == slow).all()


def test_fast_parser_pattern_falls_back():
    t = "%%MatrixMarket matrix coordinate pattern general\n2 3 2\n1 1\n2 3\n"
    d = parse_matrix_market_csr(t).to_dense()
    assert d[0, 0] == 1.0 and d[1, 2] == 1.0


def test_fast_parser_hermitian_falls_back():
    t = "%%MatrixMarket matrix coordinate complex hermitian\n2 2 1\n2 1 1.5 -2.5\n"
    c = parse_matrix_market_csr(t).to_dense()
    assert c[1, 0] == 1.5 - 2.5j and c[0, 1] == 1.5 + 2.5j


def test_fast_parser_symmetric():
    t = "%%MatrixMarket matrix coordinate real symmetric\n3 3 2\n2 1 5.0\n3 3 1.0\n"
    d = parse_matrix_market_csr(t).to_dense()
    assert d[1, 0] == 5.0 and d[0, 1] == 5.0 and d[2, 2] == 1.0


def test_fast_parser_complex_falls_back():
    t = "%%MatrixMarket matrix coordinate complex general\n2 2 1\n1 2 1.5 -2.5\n"
    c = parse_matrix_market_csr(t)
    assert c.vals[0] == 1.5 - 2.5j


def test_fast_parser_integer_stays_exact():
    t = "%%MatrixMarket matrix coordinate integer general\n2 2 1\n1 1 9007199254740993\n"
    c = parse_matrix_market_csr(t)
    # 2^53+1 is not representable in float64; the integer path must keep it
    assert int(c.vals[0]) == 9007199254740993
    assert np.issubdtype(c.vals.dtype, np.integer)
