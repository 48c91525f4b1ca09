"""Higham-bound float oracle tests (reference ``spam_dok/src/lib.rs:52-93``)."""

import numpy as np
from hypothesis import given

from sparse_matrix_tpu.core import DokMatrix, is_good_approx_of_mul
from sparse_matrix_tpu.core.accuracy import gamma_n, inf_norm
from sparse_matrix_tpu.verify.strategies import finite_f64s, mul_pairs


def test_inf_norm():
    m = DokMatrix.new(2, 3, dtype=np.float64)
    m.set_element((0, 0), -2.0)
    m.set_element((0, 2), 3.0)
    m.set_element((1, 1), 4.0)
    assert inf_norm(m) == 5.0


def test_gamma_small():
    assert 0 < gamma_n(10) < 1e-14


@given(mul_pairs(finite_f64s(), dtype=np.float64))
def test_exact_product_is_good_approx(pair):
    p = pair.a * pair.b
    if any(not np.isfinite(t) for _pos, t in p.entries.items()):
        return  # overflowed to inf — bound vacuous
    assert is_good_approx_of_mul(p, pair.a, pair.b)


def test_wrong_product_rejected():
    a = DokMatrix.identity(2, dtype=np.float64)
    b = DokMatrix.identity(2, dtype=np.float64)
    c = DokMatrix.identity(2, dtype=np.float64)
    c.set_element((0, 0), 1.0 + 1e-6)
    assert not is_good_approx_of_mul(c, a, b)


def test_spurious_nan_rejected():
    a = DokMatrix.identity(2, dtype=np.float64)
    b = DokMatrix.identity(2, dtype=np.float64)
    c = DokMatrix.identity(2, dtype=np.float64)
    c.set_element((0, 1), float("nan"))
    assert not is_good_approx_of_mul(c, a, b)


def test_inf_input_raises_isnan():
    # all-zero lhs x inf rhs: the dense-loop expected product is NaN
    # (0*inf), so the residual norm is NaN -> IsNan, as in the reference
    # (spam_dok/src/lib.rs:56-92 returns Err(IsNan)).
    import pytest

    from sparse_matrix_tpu.core import IsNanError

    a = DokMatrix.new(2, 2, dtype=np.float64)  # zero matrix
    b = DokMatrix.new(2, 2, dtype=np.float64)
    b.set_element((0, 0), float("inf"))
    c = DokMatrix.new(2, 2, dtype=np.float64)
    with pytest.raises(IsNanError):
        is_good_approx_of_mul(c, a, b)


def test_zero_norm_guard():
    # both norms finite, one zero: bound collapses to 0 without 0*inf = NaN
    a = DokMatrix.new(2, 2, dtype=np.float64)  # zero matrix
    b = DokMatrix.identity(2, dtype=np.float64)
    c = DokMatrix.new(2, 2, dtype=np.float64)
    assert is_good_approx_of_mul(c, a, b)
