"""Hypothesis strategies for matrix generation.

Re-design of the reference's trait-generic proptest strategies
(``spam_matrix/src/proptest.rs``) and libFuzzer generators
(``spam_matrix/src/arbitrary.rs``):

* random dims in ``1..MAX_SIZE`` (reference ``MAX_SIZE = 5``,
  ``spam_matrix/src/proptest.rs:7``), then delegate to a format-specific
  fixed-size generator;
* DOK fixed-size generator: up to ``2*r*c`` random ``set_element`` ops
  (``spam_dok/src/lib.rs:245-261``);
* conformable pairs :class:`AddPair` / :class:`MulPair`
  (``spam_matrix/src/proptest.rs:20-71``);
* value strategies: wrapping int8 (total arithmetic, as the reference's
  ``Wrapping<i8>`` tests, ``spam_csr/src/tests.rs:336``) and f64 (including
  non-finite values for the fuzz oracle).
"""

from __future__ import annotations

import numpy as np
from hypothesis import strategies as st

from ..core.dok import DokMatrix
from ..core.matrix import AddPair, MulPair

__all__ = [
    "MAX_SIZE",
    "wrapping_int8s",
    "finite_f64s",
    "any_f64s",
    "dims",
    "dok_fixed_size",
    "dok_matrices",
    "add_pairs",
    "mul_pairs",
]

MAX_SIZE = 5  # dims drawn from 1..MAX_SIZE-1 inclusive, as the reference


def wrapping_int8s() -> st.SearchStrategy:
    """np.int8 values; arithmetic wraps, making + - * total like Wrapping<i8>."""
    return st.integers(min_value=-128, max_value=127).map(np.int8)


def finite_f64s() -> st.SearchStrategy:
    return st.floats(allow_nan=False, allow_infinity=False, width=64)


def any_f64s() -> st.SearchStrategy:
    """f64 including NaN/inf — the fuzz-oracle value domain
    (``fuzz/fuzz_targets/mul_hash.rs`` draws arbitrary f64)."""
    return st.floats(allow_nan=True, allow_infinity=True, width=64)


def dims(max_size: int = MAX_SIZE) -> st.SearchStrategy[int]:
    return st.integers(min_value=1, max_value=max_size - 1)


@st.composite
def dok_fixed_size(draw, rows: int, cols: int, values: st.SearchStrategy, dtype=None):
    """Fixed-size DOK: up to 2*r*c random set_element ops
    (``spam_dok/src/lib.rs:245-261``)."""
    n_ops = draw(st.integers(min_value=0, max_value=2 * rows * cols))
    m = DokMatrix(rows, cols, dtype=dtype)
    for _ in range(n_ops):
        i = draw(st.integers(min_value=0, max_value=rows - 1))
        j = draw(st.integers(min_value=0, max_value=cols - 1))
        t = draw(values)
        m.set_element((i, j), t)
    return m


@st.composite
def dok_matrices(draw, values: st.SearchStrategy, dtype=None, max_size: int = MAX_SIZE):
    r = draw(dims(max_size))
    c = draw(dims(max_size))
    return draw(dok_fixed_size(r, c, values, dtype=dtype))


@st.composite
def add_pairs(draw, values: st.SearchStrategy, dtype=None, max_size: int = MAX_SIZE):
    """Same-dims pair (``spam_matrix/src/proptest.rs:20-46``)."""
    r = draw(dims(max_size))
    c = draw(dims(max_size))
    a = draw(dok_fixed_size(r, c, values, dtype=dtype))
    b = draw(dok_fixed_size(r, c, values, dtype=dtype))
    return AddPair(a, b)


@st.composite
def mul_pairs(draw, values: st.SearchStrategy, dtype=None, max_size: int = MAX_SIZE):
    """Conformable (l,m) x (m,n) pair (``spam_matrix/src/proptest.rs:48-71``)."""
    l = draw(dims(max_size))
    m = draw(dims(max_size))
    n = draw(dims(max_size))
    a = draw(dok_fixed_size(l, m, values, dtype=dtype))
    b = draw(dok_fixed_size(m, n, values, dtype=dtype))
    return MulPair(a, b)
