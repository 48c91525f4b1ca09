"""TPU-gated parity tests: the actual Mosaic kernels vs host oracles.

On CPU the library runs vectorized XLA references of the same math
(``_lanepack_reference``, pallas interpret mode), so the regular suite never
executes the compiled TPU kernels. This file does. Run on TPU hardware with::

    SPMX_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -v

(conftest.py keeps the real backend when SPMX_TPU_TESTS=1; otherwise every
test here skips.)

Sizes are kept small: each distinct (shape, B, KW) config costs a remote
Mosaic compile on the axon tunnel.
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="TPU kernels only run on TPU (set SPMX_TPU_TESTS=1 on TPU hardware)",
)

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.formats.lanepack import plan_lanepack
from sparse_matrix_tpu.ops.spmv import spmv_lanepack, spmv_oracle
from sparse_matrix_tpu.solvers import poisson_2d_csr


def _rand_csr(rng, rows, cols, density):
    a = (rng.random((rows, cols)) < density) * rng.standard_normal((rows, cols))
    a = a.astype(np.float32)
    return CsrMatrix.from_dok(DokMatrix.from_dense(a)), a


def _check_lanepack(A, x, **plan_kw):
    plan = plan_lanepack(A, **plan_kw)
    y = np.asarray(spmv_lanepack(plan, x))
    y_ref = spmv_oracle(A, x).astype(np.float32)
    scale = max(1.0, float(np.abs(y_ref).max()))
    np.testing.assert_allclose(y / scale, y_ref / scale, atol=2e-5)
    return plan


@pytest.mark.parametrize("kw", [1, 2, 4])
def test_lanepack_dense_pack_kw(kw):
    rng = np.random.default_rng(42 + kw)
    A, _ = _rand_csr(rng, 512, 700, 0.02)
    x = rng.standard_normal(700).astype(np.float32)
    plan = _check_lanepack(A, x, kw=kw, pack="dense")
    assert plan.kw == kw and plan.pack == "dense"


def test_lanepack_per_rb_pack():
    rng = np.random.default_rng(7)
    A, _ = _rand_csr(rng, 512, 512, 0.03)
    x = rng.standard_normal(512).astype(np.float32)
    plan = _check_lanepack(A, x, kw=1, pack="per_rb")
    assert plan.pack == "per_rb"


def test_lanepack_padding_slabs_and_empty_blocks():
    # rows only in blocks 0 and 10: unvisited row blocks must come out zero,
    # and the slab stream gets padded to a whole number of B-slab steps
    rng = np.random.default_rng(9)
    A = CsrMatrix.new(1500, 1500, dtype=np.float32)
    for j in range(0, 1400, 7):
        A.set_element((j % 100, j), np.float32(rng.standard_normal()))
        A.set_element((1280 + (j % 60), j), np.float32(rng.standard_normal()))
    x = rng.standard_normal(1500).astype(np.float32)
    _check_lanepack(A, x, kw=2)
    y = np.asarray(spmv_lanepack(plan_lanepack(A, kw=2), x))
    assert np.all(y[128:1280] == 0.0)


def test_lanepack_rectangular_wide():
    rng = np.random.default_rng(11)
    A, _ = _rand_csr(rng, 200, 2000, 0.01)
    x = rng.standard_normal(2000).astype(np.float32)
    _check_lanepack(A, x)


def test_lanepack_poisson_general_path():
    A = poisson_2d_csr(64, dtype=np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.cols).astype(np.float32)
    _check_lanepack(A, x)


def test_dia_spmv_parity():
    from sparse_matrix_tpu.formats.dia import try_dia_from_csr
    from sparse_matrix_tpu.ops.spmv_dia import spmv_dia

    A = poisson_2d_csr(48, dtype=np.float32)
    dia = try_dia_from_csr(A)
    assert dia is not None
    rng = np.random.default_rng(1)
    x = rng.standard_normal(A.cols).astype(np.float32)
    y = np.asarray(spmv_dia(dia, x))
    y_ref = spmv_oracle(A, x).astype(np.float32)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_block_spgemm_parity_and_segmentation(monkeypatch):
    # force the >_MAX_PAIRS_PER_CALL segmented path with a small cap so the
    # disjoint-C-block splitting logic runs on-device without a huge matrix
    import sparse_matrix_tpu.ops.spgemm_block as sb

    rng = np.random.default_rng(3)
    A, a = _rand_csr(rng, 384, 384, 0.05)
    C_ref = a @ a

    c1 = sb.spgemm_block_device(A, A)
    np.testing.assert_allclose(c1.to_dense(), C_ref, rtol=1e-4, atol=1e-3)

    monkeypatch.setattr(sb, "_MAX_PAIRS_PER_CALL", 8)
    c2 = sb.spgemm_block_device(A, A)
    np.testing.assert_allclose(c2.to_dense(), C_ref, rtol=1e-4, atol=1e-3)


def test_spmm_bcsr_parity():
    from sparse_matrix_tpu.formats.bcsr import BsrMatrix
    from sparse_matrix_tpu.ops.spmm import spmm_bcsr

    rng = np.random.default_rng(4)
    A, a = _rand_csr(rng, 256, 256, 0.08)
    bsr = BsrMatrix.from_csr(A, 128)
    X = rng.standard_normal((256, 128)).astype(np.float32)
    Y = np.asarray(spmm_bcsr(bsr, X))
    np.testing.assert_allclose(Y, a @ X, rtol=1e-4, atol=1e-3)


def test_spmm_dia_parity():
    from sparse_matrix_tpu.formats.dia import try_dia_from_csr
    from sparse_matrix_tpu.ops.spmm import spmm_dia

    A = poisson_2d_csr(32, dtype=np.float32)
    dia = try_dia_from_csr(A)
    rng = np.random.default_rng(5)
    X = rng.standard_normal((A.cols, 64)).astype(np.float32)
    Y = np.asarray(spmm_dia(dia, X))
    a = A.to_dense()
    np.testing.assert_allclose(Y, a @ X, rtol=1e-4, atol=1e-3)


def test_device_sorted_add_parity():
    from sparse_matrix_tpu.formats.device import DeviceCsr
    from sparse_matrix_tpu.ops.device_sorted import add_device, padded_to_host

    rng = np.random.default_rng(6)
    A, a = _rand_csr(rng, 300, 300, 0.03)
    B, b = _rand_csr(rng, 300, 300, 0.03)
    C = padded_to_host(add_device(DeviceCsr.from_host(A), DeviceCsr.from_host(B)))
    np.testing.assert_allclose(C.to_dense(), a + b, rtol=1e-5, atol=1e-5)


def test_aligned_kernel_parity():
    from sparse_matrix_tpu.formats.aligned import plan_aligned
    from sparse_matrix_tpu.ops.spmv import spmv_aligned

    A = poisson_2d_csr(64, dtype=np.float32)
    rng = np.random.default_rng(15)
    x = rng.standard_normal(A.cols).astype(np.float32)
    plan = plan_aligned(A)
    y = np.asarray(spmv_aligned(plan, x))
    y_ref = spmv_oracle(A, x).astype(np.float32)
    scale = max(1.0, float(np.abs(y_ref).max()))
    np.testing.assert_allclose(y / scale, y_ref / scale, atol=2e-5)


def test_aligned_kernel_with_spill_parity(monkeypatch, tmp_path):
    # force the spill path on-device: huge aligned slab cost makes the
    # planner spill the straddlers to the general kernel
    import json

    from sparse_matrix_tpu.formats.aligned import plan_aligned
    from sparse_matrix_tpu.ops.spmv import spmv_aligned
    from sparse_matrix_tpu.utils import autotune

    p = tmp_path / "autotune.json"
    p.write_text(json.dumps({"lanepack_aligned_slab_ns": 1e6}))
    monkeypatch.setenv("SPMX_AUTOTUNE_CACHE", str(p))
    autotune.reset_cache()
    try:
        rng = np.random.default_rng(16)
        A, a = _rand_csr(rng, 512, 512, 0.03)
        plan = plan_aligned(A, spill_k=32)
        assert plan.spill is not None
        x = rng.standard_normal(512).astype(np.float32)
        y = np.asarray(spmv_aligned(plan, x))
        np.testing.assert_allclose(y, a @ x, rtol=1e-3, atol=1e-3)
    finally:
        autotune.reset_cache()


def test_spmm_aligned_kernel_parity():
    from sparse_matrix_tpu.formats.aligned import plan_aligned
    from sparse_matrix_tpu.ops.spmm import spmm_aligned

    rng = np.random.default_rng(11)
    A = poisson_2d_csr(48, dtype=np.float32)
    plan = plan_aligned(A)
    X = rng.standard_normal((A.cols, 8)).astype(np.float32)
    Y = np.asarray(spmm_aligned(plan, X))
    Yref = A.to_dense().astype(np.float32) @ X
    scale = max(1.0, float(np.abs(Yref).max()))
    np.testing.assert_allclose(Y / scale, Yref / scale, atol=2e-5)


def test_cg_solve_multi_packed_on_tpu():
    import jax.numpy as jnp

    from sparse_matrix_tpu.formats.aligned import plan_aligned
    from sparse_matrix_tpu.ops.spmm import aligned_matvec_multi, pack_rhs, unpack_rhs
    from sparse_matrix_tpu.solvers import cg_solve_multi

    rng = np.random.default_rng(12)
    A = poisson_2d_csr(32, dtype=np.float32)
    plan = plan_aligned(A)
    k = 4
    b = rng.standard_normal((A.rows, k)).astype(np.float32)
    mv = aligned_matvec_multi(plan, k)
    solve = jax.jit(
        lambda b3: cg_solve_multi(mv, b3, tol=1e-5, maxiter=3000, rhs_axis=1)
    )
    res = solve(pack_rhs(b, A.cols))
    x = np.asarray(unpack_rhs(res.x, A.rows))
    dense = A.to_dense().astype(np.float64)
    for j in range(k):
        r = dense @ x[:, j] - b[:, j]
        assert np.linalg.norm(r) < 2e-4 * np.linalg.norm(b[:, j])


@pytest.mark.parametrize("kw,pack", [(1, "dense"), (2, "per_rb")])
def test_spmm_lanepack_kernel_parity(kw, pack):
    """General-path multi-RHS Mosaic kernel vs dense (both pack modes)."""
    from sparse_matrix_tpu.ops.spmm import spmm_lanepack

    rng = np.random.default_rng(19 + kw)
    A, dense = _rand_csr(rng, 512, 600, 0.02)
    plan = plan_lanepack(A, kw=kw, pack=pack)
    # K=9 >= _LP_SPMM_MIN_K so the packed Mosaic kernel (not the
    # per-column dispatch branch) is what runs on hardware here
    X = rng.standard_normal((A.cols, 9)).astype(np.float32)
    Y = np.asarray(spmm_lanepack(plan, X))
    Yref = dense @ X
    scale = max(1.0, float(np.abs(Yref).max()))
    np.testing.assert_allclose(Y / scale, Yref / scale, atol=2e-5)


def test_block_amg_pcg_on_tpu():
    """Block V-cycle + pcg_solve_multi end-to-end on hardware (exercises
    spmm_lanepack through the level P^T operators)."""
    from sparse_matrix_tpu.solvers import amg_pcg_solve, amg_setup

    A = poisson_2d_csr(48, dtype=np.float32)
    rng = np.random.default_rng(23)
    B = rng.standard_normal((A.rows, 4)).astype(np.float32)
    hier = amg_setup(A, coarse_size=120, dtype=np.float32)
    res = jax.jit(
        lambda bb: amg_pcg_solve(A, bb, tol=1e-6, maxiter=60, hierarchy=hier)
    )(B)
    assert int(res.iterations) <= 25
    dense = A.to_dense().astype(np.float64)
    X = np.asarray(res.x, np.float64)
    for j in range(4):
        r = dense @ X[:, j] - B[:, j]
        assert np.linalg.norm(r) < 5e-4 * np.linalg.norm(B[:, j])


def test_round3_solvers_on_tpu():
    """Hardware pass over the round-3 solver surfaces in one test (shared
    operator plans keep the compile count down): IC(0)-PCG, batched CG,
    complex operator, chebyshev solve, svds."""
    from sparse_matrix_tpu.ops import BatchedEllOperator, ComplexSpmvOperator, batched_cg_solve
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import (
        chebyshev_solve,
        ic_pcg_solve,
        svds_csr,
    )

    rng = np.random.default_rng(0)
    p = poisson_2d_csr(48, dtype=np.float32)  # 2304 unknowns
    b = rng.standard_normal(p.rows).astype(np.float32)
    dense64 = p.to_dense().astype(np.float64)

    # IC(0)-PCG (nilpotent-sweep trisolves on hardware)
    res = ic_pcg_solve(p, b, sweeps=4, tol=1e-5, maxiter=2000)
    x = np.asarray(res.x, dtype=np.float64)
    assert np.linalg.norm(dense64 @ x - b) < 1e-4 * np.linalg.norm(b)

    # chebyshev (dot-free) on the same operator
    op = SpmvOperator(p, dtype=np.float32)
    resc = chebyshev_solve(op, b, n=p.rows, tol=1e-5, maxiter=4000)
    xc = np.asarray(resc.x, dtype=np.float64)
    assert np.linalg.norm(dense64 @ xc - b) < 1e-4 * np.linalg.norm(b)

    # batched CG (one-hot MXU apply)
    pat = poisson_2d_csr(12, dtype=np.float32)
    vals = np.stack([pat.vals * s for s in (0.5 + rng.random(32))]).astype(np.float32)
    bop = BatchedEllOperator(pat, vals)
    assert bop.use_onehot
    B = rng.standard_normal((32, pat.rows)).astype(np.float32)
    bres = batched_cg_solve(bop, B, tol=1e-5, maxiter=300)
    d7 = CsrMatrix(pat.rows, pat.cols, vals[7], pat.indices, pat.offsets,
                   is_sorted=True).to_dense()
    assert np.linalg.norm(
        d7 @ np.asarray(bres.x)[7] - B[7]
    ) < 1e-3 * np.linalg.norm(B[7])

    # complex operator (two K=2 SpMMs on hardware)
    mask = rng.random((200, 200)) < 0.04
    dc = mask * (rng.standard_normal((200, 200)) + 1j * rng.standard_normal((200, 200)))
    ac = CsrMatrix.from_dok(DokMatrix.from_dense(dc.astype(np.complex128)))
    copz = ComplexSpmvOperator(ac)
    xcx = (rng.standard_normal(200) + 1j * rng.standard_normal(200)).astype(np.complex64)
    yc = np.asarray(copz(xcx))
    np.testing.assert_allclose(yc, dc.astype(np.complex64) @ xcx, rtol=1e-4, atol=1e-4)

    # svds (GKL loop on hardware)
    dsv = ((rng.random((300, 120)) < 0.05) * rng.standard_normal((300, 120))).astype(np.float64)
    asv = CsrMatrix.from_dok(DokMatrix.from_dense(dsv))
    sv = svds_csr(asv, k=3, steps=30)
    ref = np.linalg.svd(dsv, compute_uv=False)[:3]
    np.testing.assert_allclose(np.asarray(sv.s), ref, rtol=3e-3)


def test_dia_streaming_kernel_parity(monkeypatch):
    """The large-DIA Pallas streaming kernel on hardware (thresholds
    shrunk so Poisson 512^2 takes the streaming branch)."""
    import jax.numpy as jnp

    from sparse_matrix_tpu.formats.dia import try_dia_from_csr
    from sparse_matrix_tpu.ops import spmv_dia as sd

    a = poisson_2d_csr(512, dtype=np.float32)
    dia = try_dia_from_csr(a)
    rng = np.random.default_rng(21)
    x = rng.standard_normal(a.rows).astype(np.float32)
    ref = np.asarray(
        sd._spmv_dia_jit(
            jnp.asarray(dia.data), jnp.asarray(x),
            offsets=dia.offsets, rows=dia.rows, cols=dia.cols,
        )
    )
    dpad = sd._dia_pallas_blocked_data(jnp.asarray(dia.data), rows=dia.rows)
    y = np.asarray(
        sd._spmv_dia_pallas(
            dpad, jnp.asarray(x), offsets=dia.offsets, rows=dia.rows,
            interpret=False,
        )
    )
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(y / scale, ref / scale, atol=2e-6)


def test_fused_trisweep_kernel_parity():
    """The fused multi-sweep trisolve Pallas kernel vs the per-sweep band
    applies (same math, different dispatch structure)."""
    rng = np.random.default_rng(41)
    from sparse_matrix_tpu.solvers.ilu import TriangularJacobi, ic0

    p = poisson_2d_csr(48, dtype=np.float32)  # 2304 rows
    lc = ic0(p)
    b = rng.standard_normal(p.rows).astype(np.float32)
    for t in (lc, lc.transpose()):
        # explicit opt-in: the kernel is an ablation knob after the v5e
        # measurement picked the loop form (experiments/ilu_pcg_1024.out)
        sj = TriangularJacobi(t, sweeps=4, dtype=np.float32, fused=True)
        assert sj._fused is not None
        got = np.asarray(sj(np.asarray(b)))
        x = sj.dinv * b
        for _ in range(4):
            x = sj.dinv * (b - sj.n_op(x))
        np.testing.assert_allclose(got, np.asarray(x), rtol=2e-5, atol=2e-6)


def test_autodiff_grad_through_pallas_kernels():
    """jax.grad through the COMPILED Pallas matvec (custom_vjp routes the
    cotangent through A^T's own planned kernel) and through an implicit
    CG solve — dense-jax oracle."""
    import jax.numpy as jnp

    from sparse_matrix_tpu.ops import differentiable_operator, implicit_solve

    a = poisson_2d_csr(32)
    n = a.rows
    f, op, op_t = differentiable_operator(a, force="lanepack")
    d = jnp.asarray(a.to_dense().astype(np.float32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.ones(n, jnp.float32)

    @jax.jit
    def loss(xx):
        r = f(xx) - b
        return 0.5 * jnp.vdot(r, r)

    g = np.asarray(jax.grad(loss)(x))
    g_ref = np.asarray(d.T @ (d @ x - b))
    scale = max(1.0, float(np.abs(g_ref).max()))
    np.testing.assert_allclose(g / scale, g_ref / scale, atol=5e-5)

    gb = np.asarray(jax.grad(
        lambda bb: implicit_solve(a, bb, tol=1e-7, maxiter=4000).sum())(b))
    g_ref2 = np.linalg.solve(a.to_dense().astype(np.float64), np.ones(n))
    np.testing.assert_allclose(gb, g_ref2, rtol=5e-3, atol=5e-3)


def test_spmm_bell_kernel_parity():
    """Packed BELL SpMM on hardware: one streamed pass over the slot
    planes for all K columns vs the float64 oracle, plus the
    operator.matmat packed route (K=8) and K-chunking (K=20)."""
    from sparse_matrix_tpu.formats.bell import plan_bell
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.ops.spmm import bell_spmm_viable, spmm_bell
    from sparse_matrix_tpu.ops.spmv import spmv_oracle

    a = poisson_2d_csr(96)
    plan = plan_bell(a)
    assert plan.num_layers > 0
    rng = np.random.default_rng(0)
    for k in (2, 8, 16):
        assert bell_spmm_viable(plan, k)
        x = rng.standard_normal((a.cols, k)).astype(np.float32)
        y = np.asarray(spmm_bell(plan, x))
        y_ref = np.stack(
            [spmv_oracle(a, x[:, j].astype(np.float64)) for j in range(k)],
            axis=1,
        ).astype(np.float32)
        scale = max(1.0, np.abs(y_ref).max())
        np.testing.assert_allclose(y / scale, y_ref / scale, atol=2e-4)
    op = SpmvOperator(a, force="bell")
    x = rng.standard_normal((a.cols, 20)).astype(np.float32)
    y = np.asarray(op.matmat(x))
    y_ref = np.stack(
        [spmv_oracle(a, x[:, j].astype(np.float64)) for j in range(20)],
        axis=1,
    ).astype(np.float32)
    scale = max(1.0, np.abs(y_ref).max())
    np.testing.assert_allclose(y / scale, y_ref / scale, atol=2e-4)


def test_bf16_value_planes_on_tpu():
    """bf16 DIA band planes + BELL slot planes through the real Mosaic
    kernels (widen-in-kernel, f32 accumulate), and the mixed-precision
    refinement CG on hardware. Small shapes exercise the XLA DIA path;
    a >48 MB banded operator would engage the streaming kernel — covered
    by the bench scripts, not paid here (remote-compile cost)."""
    import jax.numpy as jnp

    from sparse_matrix_tpu.formats.bell import plan_bell
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.ops.spmv_bell import bell_device_arrays, spmv_bell
    from sparse_matrix_tpu.solvers import cg_solve_ir

    rng = np.random.default_rng(11)
    a64 = poisson_2d_csr(64, dtype=np.float64)
    d = (0.5 + rng.random(a64.rows)).astype(np.float64)
    vals = a64.vals * d[a64.row_ids()] * d[a64.indices.astype(np.int64)]
    a = CsrMatrix(a64.rows, a64.cols, vals.astype(np.float32), a64.indices,
                  a64.offsets, is_sorted=a64.is_sorted)

    x = rng.standard_normal(a.cols).astype(np.float32)
    y_ref = spmv_oracle(a, x.astype(np.float64))
    scale = np.abs(y_ref).max()

    plan = plan_bell(a)
    assert plan.num_layers > 0
    arrs16 = bell_device_arrays(plan, values_dtype=jnp.bfloat16)
    y16 = np.asarray(spmv_bell(plan, x, device_arrays=arrs16))
    assert np.abs(y16 - y_ref).max() / scale < 3e-2  # bf16-grade
    assert np.abs(y16 - y_ref).max() / scale > 1e-6  # really rounded

    op_hi = SpmvOperator(a, force="dia")
    op_lo = SpmvOperator(a, force="dia", values_dtype=jnp.bfloat16)
    assert op_lo._dia_arrs["data"].dtype == jnp.bfloat16
    b = rng.standard_normal(a.rows).astype(np.float32)
    res = cg_solve_ir(op_hi, op_lo, b, tol=1e-5, maxiter=6000)
    assert float(res.residual_norm) <= 1e-5 * np.linalg.norm(b)
    true_r = np.linalg.norm(
        b.astype(np.float64) - spmv_oracle(a, np.asarray(res.x, np.float64))
    )
    assert true_r <= 1e-4 * np.linalg.norm(b)


def test_stripe_kernel_parity():
    """Round-4 stripe kernel (multi-level destinations): Mosaic vs oracle
    across (L, KW) configs including the multi-window gather path."""
    from sparse_matrix_tpu.formats.stripe import plan_stripe
    from sparse_matrix_tpu.ops.spmv import spmv_stripe

    rng = np.random.default_rng(44)
    r = np.repeat(np.arange(900, dtype=np.int64), 10)
    c = np.clip(r + rng.integers(-250, 251, len(r)), 0, 899)
    m = CsrMatrix.from_coo(900, 900, r, c, rng.standard_normal(len(r)))
    x = rng.standard_normal(900).astype(np.float32)
    ref = spmv_oracle(m, x)
    for L, KW in [(2, 1), (4, 2), (2, 4)]:
        plan = plan_stripe(m, levels=L, kw=KW)
        y = np.asarray(spmv_stripe(plan, x))
        np.testing.assert_allclose(
            y, ref, rtol=0, atol=3e-5 * max(1.0, np.abs(ref).max()),
            err_msg=f"L={L} KW={KW}")


def test_esc_packed_key_parity_on_tpu():
    """Round-4 packed-key ESC SpGEMM (1-key int32 sorts) on hardware."""
    from sparse_matrix_tpu.formats.device import DeviceCsr
    from sparse_matrix_tpu.ops.device_sorted import (
        expand_plan, padded_to_host, spgemm_esc_device,
    )

    rng = np.random.default_rng(45)
    A, ad = _rand_csr(rng, 96, 96, 0.08)
    B, bd = _rand_csr(rng, 96, 96, 0.08)
    c = padded_to_host(spgemm_esc_device(
        DeviceCsr.from_host(A), DeviceCsr.from_host(B),
        plan=expand_plan(A, B)))
    np.testing.assert_allclose(c.to_dense(), ad @ bd, atol=1e-3)


def test_lanepack_vmem_stack_near_split_caps():
    """Regression (VERDICT r4 weak #2a): a colsplit x rowsplit shard with
    ~3.26M cols AND ~1.57M rows — each under its individual split cap —
    stacks x (13 MB) + y (6.3 MB) = 19.4 MB of scoped VMEM and OOMed at
    Mosaic's 16 MB DEFAULT limit (AmgRefresh at Poisson 2048^2,
    amg_refresh_bench.out). The kernels now raise vmem_limit_bytes like
    BELL does; this pins the exact shape class. nnz is kept tiny — the
    stack size depends only on (rows, cols)."""
    rng = np.random.default_rng(46)
    rows, cols, nnz = 1_571_000, 3_258_000, 16_000
    r = np.sort(rng.choice(rows, nnz, replace=False).astype(np.int64))
    c = rng.integers(0, cols, nnz)
    A = CsrMatrix.from_coo(rows, cols, r, c,
                           rng.standard_normal(nnz).astype(np.float32))
    x = rng.standard_normal(cols).astype(np.float32)
    plan = plan_lanepack(A)
    y = np.asarray(spmv_lanepack(plan, x))
    ref = spmv_oracle(A, x).astype(np.float32)
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(y / scale, ref / scale, atol=2e-5)
