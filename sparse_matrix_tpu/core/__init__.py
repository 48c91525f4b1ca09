"""Core layer: matrix protocol, DOK oracle format, MatrixMarket I/O, and the
Higham float-accuracy oracle (reference crates ``spam_matrix`` + ``spam_dok``)."""

from .matrix import Matrix, MatrixIndexError, AddPair, MulPair, check_dims
from .dok import DokMatrix
from .matrix_market import (
    MatrixType,
    ParsedMatrix,
    MatrixMarketError,
    HasZeroDimensionError,
    parse_matrix_market,
    parse_matrix_market_csr,
    write_matrix_market,
    to_matrix_market_string,
    load_matrix_market,
    load_matrix_market_csr,
    save_matrix_market,
)
from .accuracy import IsNanError, is_good_approx_of_mul, gamma_n, inf_norm

__all__ = [
    "Matrix",
    "MatrixIndexError",
    "AddPair",
    "MulPair",
    "check_dims",
    "DokMatrix",
    "MatrixType",
    "ParsedMatrix",
    "MatrixMarketError",
    "HasZeroDimensionError",
    "parse_matrix_market",
    "parse_matrix_market_csr",
    "write_matrix_market",
    "to_matrix_market_string",
    "load_matrix_market",
    "load_matrix_market_csr",
    "save_matrix_market",
    "IsNanError",
    "is_good_approx_of_mul",
    "gamma_n",
    "inf_norm",
]
