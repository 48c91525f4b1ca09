"""Distributed SpGEMM tests (FLOP-balanced row shards over the mesh)."""

import jax
import numpy as np
import pytest

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.parallel import make_mesh
from sparse_matrix_tpu.parallel.spgemm import dist_spgemm


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


@pytest.mark.parametrize("seed,shape_a,shape_b,density", [
    (0, (60, 80), (80, 50), 0.05),
    (1, (200, 100), (100, 150), 0.02),
    (2, (16, 16), (16, 16), 0.3),
])
def test_dist_spgemm_matches_dense(mesh, seed, shape_a, shape_b, density):
    rng = np.random.default_rng(seed)
    a = (rng.random(shape_a) < density) * rng.standard_normal(shape_a)
    b = (rng.random(shape_b) < density) * rng.standard_normal(shape_b)
    A = CsrMatrix.from_dok(DokMatrix.from_dense(a.astype(np.float32)))
    B = CsrMatrix.from_dok(DokMatrix.from_dense(b.astype(np.float32)))
    C = dist_spgemm(A, B, mesh)
    assert C.invariants()
    ref = a.astype(np.float32) @ b.astype(np.float32)
    np.testing.assert_allclose(C.to_dense(), ref, rtol=1e-3, atol=1e-4)


def test_dist_spgemm_empty(mesh):
    A = CsrMatrix.new(10, 10, dtype=np.float32)
    C = dist_spgemm(A, A, mesh)
    assert C.nnz() == 0
    assert C.invariants()
