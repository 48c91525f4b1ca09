"""SpMM (sparse x dense block) tests."""

import numpy as np

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.formats.bcsr import BsrMatrix
from sparse_matrix_tpu.formats.dia import try_dia_from_csr
from sparse_matrix_tpu.ops.spmm import spmm_bcsr, spmm_dia
from sparse_matrix_tpu.solvers import poisson_2d_csr


def test_spmm_dia():
    A = poisson_2d_csr(16, dtype=np.float32)
    d = try_dia_from_csr(A)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 7)).astype(np.float32)
    y = np.asarray(spmm_dia(d, x))
    np.testing.assert_allclose(y, A.to_dense() @ x, rtol=1e-4, atol=1e-4)


def test_spmm_bcsr():
    rng = np.random.default_rng(1)
    a = (rng.random((200, 150)) < 0.05) * rng.standard_normal((200, 150))
    A = CsrMatrix.from_dok(DokMatrix.from_dense(a.astype(np.float32)))
    B = BsrMatrix.from_csr(A, 8)
    x = rng.standard_normal((150, 5)).astype(np.float32)
    y = np.asarray(spmm_bcsr(B, x))
    np.testing.assert_allclose(y, a.astype(np.float32) @ x, rtol=1e-3, atol=1e-4)


def test_spmm_bcsr_empty_block_rows():
    m = DokMatrix.new(300, 300, dtype=np.float32)
    m.set_element((299, 0), np.float32(3.0))
    A = CsrMatrix.from_dok(m)
    B = BsrMatrix.from_csr(A, 128)
    x = np.ones((300, 3), dtype=np.float32)
    y = np.asarray(spmm_bcsr(B, x))
    assert y[299, 0] == 3.0
    assert np.all(y[:299] == 0)
