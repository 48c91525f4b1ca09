"""DIA x DIA band-convolution SpGEMM tests."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.formats.dia import try_dia_from_csr, DiaMatrix
from sparse_matrix_tpu.ops.spgemm_dia import spgemm_dia
from sparse_matrix_tpu.solvers import poisson_2d_csr


def test_poisson_squared():
    A = poisson_2d_csr(16, dtype=np.float32)
    d = try_dia_from_csr(A)
    C = spgemm_dia(d, d)
    ref = A.to_dense() @ A.to_dense()
    np.testing.assert_allclose(C.to_csr().to_dense(), ref, rtol=1e-4, atol=1e-4)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(2, 12), st.integers(2, 12), st.integers(2, 12),
    st.lists(st.integers(-6, 6), min_size=1, max_size=4, unique=True),
    st.lists(st.integers(-6, 6), min_size=1, max_size=4, unique=True),
    st.integers(0, 1000),
)
def test_band_conv_matches_dense(l, m, n, offs_a, offs_b, seed):
    rng = np.random.default_rng(seed)

    def make(rows, cols, offs):
        data = np.zeros((len(offs), rows), np.float32)
        i = np.arange(rows)
        for k, o in enumerate(sorted(offs)):
            ok = (i + o >= 0) & (i + o < cols)
            data[k][ok] = rng.standard_normal(ok.sum()).astype(np.float32)
        return DiaMatrix(rows, cols, data, tuple(sorted(offs)))

    A = make(l, m, offs_a)
    B = make(m, n, offs_b)
    C = spgemm_dia(A, B)
    ref = A.to_csr().to_dense() @ B.to_csr().to_dense()
    np.testing.assert_allclose(C.to_csr().to_dense(), ref, rtol=1e-4, atol=1e-5)


def test_dim_mismatch():
    A = try_dia_from_csr(poisson_2d_csr(4, dtype=np.float32))
    B = DiaMatrix(9, 9, np.ones((1, 9), np.float32), (0,))
    with pytest.raises(ValueError):
        spgemm_dia(A, B)
