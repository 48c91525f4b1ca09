"""Round-3 fixes: precision guards and split-operator persistence.

Covers the round-2 verdict/advice items: the f64->f32 silent truncation on
the SpMV fast paths is now a TypeError (explicit ``allow_downcast=`` opt-in),
split (colsplit/rowsplit) operators persist and report bytes_per_apply, and
ILUT reports a zero pivot when a factor diagonal underflows at storage
precision instead of emitting inf/NaN factors.
"""

import numpy as np
import pytest

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix


def _rand_csr(rng, rows, cols, density):
    dense = (rng.random((rows, cols)) < density) * rng.standard_normal((rows, cols))
    dense = dense.astype(np.float32)
    return CsrMatrix.from_dok(DokMatrix.from_dense(dense)), dense


def test_spmv_refuses_silent_downcast():
    from sparse_matrix_tpu.formats.aligned import plan_aligned
    from sparse_matrix_tpu.formats.lanepack import plan_lanepack
    from sparse_matrix_tpu.ops.spmv import spmv_aligned, spmv_lanepack

    rng = np.random.default_rng(0)
    A, a = _rand_csr(rng, 64, 64, 0.1)
    x64 = rng.standard_normal(64)  # float64
    with pytest.raises(TypeError, match="refusing"):
        spmv_lanepack(plan_lanepack(A), x64)
    with pytest.raises(TypeError, match="refusing"):
        spmv_aligned(plan_aligned(A), x64)
    # explicit opt-in still works and matches the f32 result
    y = np.asarray(spmv_lanepack(plan_lanepack(A), x64, allow_downcast=True))
    np.testing.assert_allclose(y, a @ x64.astype(np.float32), rtol=1e-4, atol=1e-4)
    # f32 input is unaffected
    y2 = np.asarray(spmv_aligned(plan_aligned(A), x64.astype(np.float32)))
    np.testing.assert_allclose(y2, a @ x64.astype(np.float32), rtol=1e-4, atol=1e-4)


def test_colsplit_operator_persists_and_accounts(tmp_path):
    # 12M cols forces the planner into column shards (ops/operator.py
    # colsplit branch — the cap moved from 3.5M to 10M in round 5 with the
    # 100 MB kernel scoped-vmem limit); the plan must survive save/load and
    # report a real bytes_per_apply (advice r2: both used to silently
    # degrade)
    from sparse_matrix_tpu.ops.operator import (
        SpmvOperator,
        load_operator_plan,
        save_operator_plan,
    )

    rng = np.random.default_rng(1)
    rows, cols, nnz = 600, 12_000_000, 1500
    r = rng.integers(0, rows, nnz)
    c = rng.integers(0, cols, nnz)
    v = rng.standard_normal(nnz).astype(np.float32)
    m = CsrMatrix.from_coo(rows, cols, r, c, v)
    op = SpmvOperator(m)
    assert op.format == "colsplit"
    assert op.bytes_per_apply() > 0

    x = rng.standard_normal(cols).astype(np.float32)
    ref = np.zeros(rows, np.float64)
    np.add.at(ref, m.row_ids(), m.vals.astype(np.float64) * x[m.indices])
    y = np.asarray(op(x))
    np.testing.assert_allclose(y, ref.astype(np.float32), rtol=1e-4, atol=1e-4)

    p = str(tmp_path / "split.npz")
    save_operator_plan(op, p)
    op2 = load_operator_plan(p)
    assert op2.format == "colsplit"
    assert op2.bytes_per_apply() == op.bytes_per_apply()
    np.testing.assert_allclose(np.asarray(op2(x)), y, rtol=1e-6, atol=1e-7)


def _underflow_matrix(dtype):
    # row 2's pivot is created purely by elimination fill:
    # w[2] = -(a20/u00)*u02 = -(1e-30/3)*1e-15 ~ -3.3e-46 — nonzero in the
    # double workspace, but 0.0 once stored as float32 (min subnormal
    # ~1.4e-45). Row 3 then divides by that stored pivot.
    dense = np.zeros((4, 4), dtype)
    dense[0, 0] = 3.0
    dense[0, 2] = 1e-15
    dense[1, 1] = 1.0
    dense[2, 0] = 1e-30
    dense[3, 2] = 1.0
    dense[3, 3] = 1.0
    return CsrMatrix.from_dok(DokMatrix.from_dense(dense))


def test_ilut_f32_pivot_underflow_raises():
    from sparse_matrix_tpu.solvers.ilu import ilut

    with pytest.raises(ValueError, match="zero pivot"):
        ilut(_underflow_matrix(np.float32), tau=0.0, p=4)
    # the same matrix factors fine at f64 storage precision
    f = ilut(_underflow_matrix(np.float64), tau=0.0, p=4)
    assert np.all(np.isfinite(f.l.vals)) and np.all(np.isfinite(f.u.vals))


def test_ilut_python_fallback_pivot_underflow_raises():
    from sparse_matrix_tpu.solvers.ilu import _ilut_python

    m = _underflow_matrix(np.float32)
    with pytest.raises(ValueError, match="zero pivot"):
        _ilut_python(
            m.rows, m.cols, m.offsets, m.indices.astype(np.int64), m.vals, 0.0, 4
        )
