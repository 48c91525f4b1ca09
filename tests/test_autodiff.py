"""Autodiff through the sparse kernels (ops/autodiff.py).

Oracles are dense-jax gradients (same graph, dense matmul) and closed-form
linear-algebra identities (grad of sum(A^{-1} b) w.r.t. b is A^{-T} 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.formats.construct import diags, random_csr
from sparse_matrix_tpu.ops import (
    SpmvOperator,
    cg_solve_implicit,
    differentiable_operator,
    implicit_solve,
    linear_matvec,
)
from sparse_matrix_tpu.solvers import poisson_2d_csr


def _spd(n=80, seed=0):
    rng = np.random.default_rng(seed)
    a = random_csr(n, n, 0.05, rng)
    s = a + a.transpose()
    row_dom = np.abs(s.to_dense()).sum(axis=1) + 1.0
    return s + diags([row_dom], [0], shape=(n, n))


@pytest.mark.parametrize("force", [None, "lanepack", "ell"])
def test_grad_x_through_matvec_matches_dense(force):
    a = _spd(64, seed=1)
    f, op, op_t = differentiable_operator(a, force=force)
    d = jnp.asarray(a.to_dense().astype(np.float32))
    w = jnp.asarray(np.random.default_rng(2).standard_normal(64).astype(np.float32))

    loss_sparse = lambda x: jnp.vdot(w, f(x))  # noqa: E731
    loss_dense = lambda x: jnp.vdot(w, d @ x)  # noqa: E731
    x = jnp.asarray(np.random.default_rng(3).standard_normal(64).astype(np.float32))
    g_sparse = jax.grad(loss_sparse)(x)
    g_dense = jax.grad(loss_dense)(x)
    np.testing.assert_allclose(np.asarray(g_sparse), np.asarray(g_dense),
                               rtol=5e-5, atol=5e-5)


def test_grad_through_nonlinear_loss_and_jit():
    a = poisson_2d_csr(12)
    n = a.rows
    f, *_ = differentiable_operator(a)
    d = jnp.asarray(a.to_dense().astype(np.float32))
    b = jnp.ones(n, jnp.float32)

    @jax.jit
    def loss(x):
        r = f(x) - b
        return 0.5 * jnp.vdot(r, r)

    x = jnp.asarray(np.random.default_rng(4).standard_normal(n).astype(np.float32))
    g = jax.grad(loss)(x)
    g_ref = d.T @ (d @ x - b)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-4)


def test_linear_matvec_rectangular():
    rng = np.random.default_rng(5)
    a = random_csr(30, 18, 0.2, rng)
    op = SpmvOperator(a)
    op_t = SpmvOperator(a.transpose())
    f = linear_matvec(op, op_t)
    d = jnp.asarray(a.to_dense().astype(np.float32))
    x = jnp.asarray(rng.standard_normal(18).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(30).astype(np.float32))
    g = jax.grad(lambda xx: jnp.vdot(w, f(xx)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(d.T @ w), rtol=5e-5,
                               atol=5e-5)


def test_implicit_solve_grad_b_is_inverse_transpose_apply():
    a = _spd(48, seed=6)
    d64 = a.to_dense().astype(np.float64)
    b = np.random.default_rng(7).standard_normal(48).astype(np.float32)

    x = implicit_solve(a, b, tol=1e-8, maxiter=3000)
    np.testing.assert_allclose(np.asarray(x, np.float64), np.linalg.solve(d64, b),
                               rtol=2e-4, atol=2e-4)

    # d/db sum(A^{-1} b) = A^{-T} 1 = A^{-1} 1 (symmetric)
    g = jax.grad(lambda bb: implicit_solve(a, bb, tol=1e-8, maxiter=3000).sum())(
        jnp.asarray(b))
    g_ref = np.linalg.solve(d64, np.ones(48))
    np.testing.assert_allclose(np.asarray(g, np.float64), g_ref, rtol=5e-4,
                               atol=5e-4)


def test_cg_solve_implicit_jits_and_composes():
    a = poisson_2d_csr(10)
    n = a.rows
    op = SpmvOperator(a)

    @jax.jit
    def endpoint(b):
        x = cg_solve_implicit(op, b, tol=1e-7, maxiter=2000)
        return jnp.vdot(x, x)

    b = jnp.ones(n, jnp.float32)
    val = endpoint(b)
    g = jax.grad(endpoint)(b)
    d64 = a.to_dense().astype(np.float64)
    x_ref = np.linalg.solve(d64, np.ones(n))
    np.testing.assert_allclose(float(val), float(x_ref @ x_ref), rtol=1e-3)
    # d/db x^T x = 2 A^{-T} x = 2 A^{-1} x
    g_ref = 2.0 * np.linalg.solve(d64, x_ref)
    np.testing.assert_allclose(np.asarray(g, np.float64), g_ref, rtol=1e-3,
                               atol=1e-3)


def test_value_gradients_through_dia_pytree():
    """The pure-XLA DIA path differentiates w.r.t. the operator VALUES
    natively: grad through op.apply(params, x) w.r.t. params['dia']['data']
    matches the dense oracle restricted to the band pattern."""
    a = poisson_2d_csr(8)
    op = SpmvOperator(a, force="dia")
    assert op.format == "dia"
    params = op.as_pytree()
    n = a.rows
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def loss(p):
        return jnp.vdot(w, op.apply(p, x))

    g = jax.grad(loss)(params)
    gd = np.asarray(g["dia"]["data"])  # (ndiags, rows_padded)

    # dense oracle: dL/dA = w x^T, mapped onto the DIA layout
    # data[d, i] multiplies x[i + offset_d] into y[i]
    offsets = np.asarray(op._dia.offsets if hasattr(op._dia, "offsets")
                         else op._dia_arrs.get("offsets"))
    wxT = np.outer(np.asarray(w), np.asarray(x))
    for di, off in enumerate(np.asarray(offsets).ravel()[: gd.shape[0]]):
        off = int(off)
        for i in range(gd.shape[1]):
            j = i + off
            expect = wxT[i, j] if 0 <= i < n and 0 <= j < n else 0.0
            np.testing.assert_allclose(gd[di, i], expect, rtol=1e-4,
                                       atol=1e-4)
