"""Fuzz-loop smoke (the deep run is a CLI: python -m sparse_matrix_tpu.verify.fuzz)
and scipy differential tests (the MKL-analog third implementation)."""

import numpy as np
import pytest
from hypothesis import given, settings

from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops import spgemm_esc_host, spgemm_hash_host
from sparse_matrix_tpu.verify.differential import from_scipy, scipy_available, to_scipy
from sparse_matrix_tpu.verify.fuzz import fuzz_spgemm
from sparse_matrix_tpu.verify.strategies import mul_pairs, finite_f64s


def test_fuzz_smoke_finite():
    assert fuzz_spgemm(30, seed=1, max_dim=12, non_finite=False) == 30


def test_fuzz_smoke_nonfinite():
    assert fuzz_spgemm(30, seed=2, max_dim=10, non_finite=True) == 30


def test_fuzz_smoke_device():
    assert fuzz_spgemm(10, seed=3, max_dim=8, non_finite=False, include_device=True) == 10


def test_fuzz_smoke_amortized():
    # the same-pattern SpGEMM-as-SpMV engines, driven through their
    # refresh contract (values scaled 1.5x post-plan, unscaled after)
    assert fuzz_spgemm(8, seed=4, max_dim=10, non_finite=True,
                       include_amortized=True) == 8


@pytest.mark.skipif(not scipy_available(), reason="scipy missing")
@settings(max_examples=25)
@given(mul_pairs(finite_f64s(), dtype=np.float64))
def test_spgemm_matches_scipy(pair):
    a = CsrMatrix.from_dok(pair.a, dtype=np.float64)
    b = CsrMatrix.from_dok(pair.b, dtype=np.float64)
    ours = spgemm_hash_host(a, b, output_sorted=True)
    theirs = to_scipy(a) @ to_scipy(b)
    np.testing.assert_allclose(ours.to_dense(), theirs.toarray(), rtol=1e-12, atol=1e-300)


@pytest.mark.skipif(not scipy_available(), reason="scipy missing")
def test_scipy_roundtrip_and_ops():
    rng = np.random.default_rng(0)
    a = (rng.random((60, 40)) < 0.1) * rng.standard_normal((60, 40))
    A = CsrMatrix.from_dok(__import__("sparse_matrix_tpu").DokMatrix.from_dense(a))
    # round-trip
    back = from_scipy(to_scipy(A))
    assert back == A
    # transpose differential
    np.testing.assert_allclose(A.transpose().to_dense(), to_scipy(A).T.toarray())
    # add differential
    B = CsrMatrix.from_dok(__import__("sparse_matrix_tpu").DokMatrix.from_dense(a * 2))
    np.testing.assert_allclose((A + B).to_dense(), (to_scipy(A) + to_scipy(B)).toarray())
