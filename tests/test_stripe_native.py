"""Native stripe plan assembly parity (loader.stripe_plan_native /
spmx_stripe_count+fill vs the numpy reference body in
formats/stripe.py plan_stripe).

The native pass must reproduce the numpy plan BYTE-FOR-BYTE — same slab
arrays, same spill set, same derived gather width — because the kernel
compiles against these layouts and the cost model prices them.
"""

import os

import numpy as np
import pytest

from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.formats.stripe import plan_stripe
from sparse_matrix_tpu.native.loader import load_library, stripe_plan_native

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native library unavailable")


def _random_csr(rng, rows, cols, nnz):
    r = rng.integers(0, rows, nnz)
    c = rng.integers(0, cols, nnz)
    v = rng.standard_normal(nnz).astype(np.float32)
    return CsrMatrix.from_coo(rows, cols, r, c, v, sum_duplicates=True)


def _skewed_csr(rng, rows, cols, nnz):
    """Power-law row sizes + a few dense rows: triggers select-mode
    same-row collisions (the spill path)."""
    r = (rows * rng.random(nnz) ** 4).astype(np.int64)
    c = rng.integers(0, cols, nnz)
    v = rng.standard_normal(nnz).astype(np.float32)
    return CsrMatrix.from_coo(rows, cols, r, c, v, sum_duplicates=True)


def _plans_equal(a, b):
    assert a.mode == b.mode and a.levels == b.levels and a.kw == b.kw, (
        a.mode, a.levels, a.kw, b.mode, b.levels, b.kw)
    for f in ("vals", "lane", "ends", "stripe_rb", "col_off",
              "chunk_stripe", "rb_mask"):
        x, y = getattr(a, f), getattr(b, f)
        assert x.dtype == y.dtype, (f, x.dtype, y.dtype)
        assert x.shape == y.shape, (f, x.shape, y.shape)
        assert np.array_equal(x, y), f
    if a.starts is None:
        assert b.starts is None
    else:
        assert np.array_equal(a.starts, b.starts)
    assert a.nnz == b.nnz
    if a.spill is None:
        assert b.spill is None
    else:
        assert b.spill is not None
        _plans_equal(a.spill, b.spill)


def _both(m, **kw):
    nat = plan_stripe(m, **kw)
    os.environ["SPMX_NO_NATIVE_STRIPE"] = "1"
    try:
        ref = plan_stripe(m, **kw)
    finally:
        del os.environ["SPMX_NO_NATIVE_STRIPE"]
    return nat, ref


@pytest.mark.parametrize("mode", ["scan", "select"])
@pytest.mark.parametrize("levels,kw", [(1, 1), (2, 2), (4, 1), (8, 16)])
def test_native_parity_random(mode, levels, kw):
    rng = np.random.default_rng(hash((mode, levels, kw)) % 2**31)
    m = _random_csr(rng, 1000, 3000, 8000)
    nat, ref = _both(m, levels=levels, kw=kw, mode=mode)
    _plans_equal(nat, ref)


@pytest.mark.parametrize("mode", ["scan", "select"])
def test_native_parity_skewed_spill(mode):
    rng = np.random.default_rng(7)
    m = _skewed_csr(rng, 2000, 4096, 30000)
    nat, ref = _both(m, levels=4, kw=2, mode=mode)
    if mode == "select":
        assert nat.spill is not None and nat.spill.nnz > 0
    _plans_equal(nat, ref)


@pytest.mark.parametrize("mode", ["scan", "select"])
def test_native_parity_banded(mode):
    # contiguous bands: exercises the already-sorted fast path
    rows = cols = 1500
    r = np.repeat(np.arange(rows), 3)
    c = np.clip(np.stack([np.arange(rows) - 1, np.arange(rows),
                          np.arange(rows) + 1], 1).ravel(), 0, cols - 1)
    v = np.ones(len(r), np.float32)
    m = CsrMatrix.from_coo(rows, cols, r, c, v, sum_duplicates=True)
    nat, ref = _both(m, levels=2, kw=1, mode=mode)
    _plans_equal(nat, ref)


def test_native_parity_empty_and_tiny():
    m0 = CsrMatrix.from_coo(64, 64, np.zeros(0, np.int64),
                            np.zeros(0, np.int64), np.zeros(0, np.float32),
                            sum_duplicates=False)
    nat, ref = _both(m0, levels=2, kw=1, mode="scan")
    _plans_equal(nat, ref)
    m1 = CsrMatrix.from_coo(1, 1, np.array([0]), np.array([0]),
                            np.array([2.5], np.float32), sum_duplicates=False)
    nat, ref = _both(m1, levels=1, kw=1, mode="select")
    _plans_equal(nat, ref)


def test_native_parity_auto_dispatch():
    # the auto grid must land on the same plan either way (counts are
    # numpy in both paths; only the assembly is native)
    rng = np.random.default_rng(11)
    m = _random_csr(rng, 4000, 8192, 60000)
    nat, ref = _both(m)
    _plans_equal(nat, ref)


def test_native_spmv_correct():
    import jax.numpy as jnp

    from sparse_matrix_tpu.ops.spmv import spmv_stripe

    rng = np.random.default_rng(3)
    m = _skewed_csr(rng, 1500, 2048, 20000)
    x = rng.standard_normal(m.cols).astype(np.float32)
    ref = np.zeros(m.rows, np.float64)
    for i in range(m.rows):
        lo, hi = int(m.offsets[i]), int(m.offsets[i + 1])
        ref[i] = m.vals[lo:hi].astype(np.float64) @ x[
            m.indices[lo:hi].astype(np.int64)]
    for mode in ("scan", "select"):
        plan = plan_stripe(m, levels=2, kw=2, mode=mode)
        y = np.asarray(spmv_stripe(plan, jnp.asarray(x)))
        np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)
