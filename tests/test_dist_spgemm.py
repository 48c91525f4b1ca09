"""Distributed SpGEMM tests (FLOP-balanced row shards over the mesh)."""

import jax
import numpy as np
import pytest

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.parallel import make_mesh
from sparse_matrix_tpu.parallel.spgemm import dist_spgemm, dist_spgemm_2d


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


@pytest.fixture(scope="module")
def mesh2d():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("r", "c"))


@pytest.mark.parametrize("seed,shape_a,shape_b,density", [
    (0, (60, 80), (80, 50), 0.05),
    (1, (200, 100), (100, 150), 0.02),
    (2, (16, 16), (16, 16), 0.3),
    (3, (40, 7), (7, 300), 0.2),   # wide output stresses the column split
])
def test_dist_spgemm_2d_matches_dense(mesh2d, seed, shape_a, shape_b, density):
    rng = np.random.default_rng(seed)
    a = (rng.random(shape_a) < density) * rng.standard_normal(shape_a)
    b = (rng.random(shape_b) < density) * rng.standard_normal(shape_b)
    A = CsrMatrix.from_dok(DokMatrix.from_dense(a.astype(np.float32)))
    B = CsrMatrix.from_dok(DokMatrix.from_dense(b.astype(np.float32)))
    C = dist_spgemm_2d(A, B, mesh2d)
    assert C.invariants()
    ref = a.astype(np.float32) @ b.astype(np.float32)
    np.testing.assert_allclose(C.to_dense(), ref, rtol=1e-3, atol=1e-4)


def test_dist_spgemm_2d_agrees_with_1d(mesh, mesh2d):
    rng = np.random.default_rng(9)
    a = (rng.random((120, 120)) < 0.04) * rng.standard_normal((120, 120))
    A = CsrMatrix.from_dok(DokMatrix.from_dense(a.astype(np.float32)))
    C1 = dist_spgemm(A, A, mesh)
    C2 = dist_spgemm_2d(A, A, mesh2d)
    np.testing.assert_allclose(C1.to_dense(), C2.to_dense(), rtol=1e-4, atol=1e-5)


def test_dist_spgemm_2d_empty(mesh2d):
    A = CsrMatrix.new(10, 10, dtype=np.float32)
    C = dist_spgemm_2d(A, A, mesh2d)
    assert C.nnz() == 0
    assert C.invariants()
