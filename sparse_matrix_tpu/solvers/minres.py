"""MINRES: minimal-residual solver for symmetric (possibly indefinite)
systems, driven by any SpMV closure.

North-star scope (not in the Rust reference): completes the symmetric
solver family next to CG/PCG — CG requires positive-definiteness, MINRES
only symmetry, so shifted operators (A - sigma*I, as in inverse iteration)
and saddle-point systems stay solvable on-device. Lanczos + Givens
rotations (Paige & Saunders 1975), pure ``lax.while_loop``: one jit, no
host round-trips per iteration, same discipline as :mod:`.cg`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .cg import CgResult

__all__ = ["minres_solve"]


def minres_solve(
    matvec: Callable,
    b,
    x0=None,
    *,
    tol: float = 1e-6,
    maxiter: int = 1000,
) -> CgResult:
    """Solve ``A x = b`` for symmetric ``A`` (definite or not).

    Convergence: estimated ||r||_2 <= tol * ||b||_2 (the Givens-recurrence
    residual estimate, exact in exact arithmetic).
    """
    b = jnp.asarray(b)
    x_init = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    r0 = b - matvec(x_init) if x0 is not None else b
    beta1 = jnp.linalg.norm(r0)
    bnorm = jnp.linalg.norm(b)
    rtol = tol * jnp.where(bnorm > 0, bnorm, 1.0)
    eps = jnp.asarray(1e-30, b.dtype)

    # state: x, v_prev, v, w, w_prev, beta, eta, gamma1, gamma0, sigma1,
    # sigma0, phibar (residual estimate), k
    v1 = r0 / jnp.maximum(beta1, eps)

    def cond(st):
        _, _, _, _, _, _, _, _, _, _, _, phibar, k = st
        return jnp.logical_and(phibar > rtol, k < maxiter)

    def body(st):
        x, v_old, v, w_old2, w_old, beta, eta, g1, g0, s1, s0, phibar, k = st
        p = matvec(v) - beta * v_old
        alpha = jnp.vdot(v, p).real.astype(b.dtype)
        p = p - alpha * v
        beta_new = jnp.linalg.norm(p)
        v_new = p / jnp.maximum(beta_new, eps)

        # apply the two previous rotations, build the new one
        delta = g1 * alpha - g0 * s1 * beta
        rho1 = jnp.sqrt(delta * delta + beta_new * beta_new)
        rho1 = jnp.maximum(rho1, eps)
        rho2 = s1 * alpha + g0 * g1 * beta
        rho3 = s0 * beta
        g0n, s0n = g1, s1
        g1n = delta / rho1
        s1n = beta_new / rho1

        w_new = (v - rho3 * w_old2 - rho2 * w_old) / rho1
        x = x + (g1n * eta) * w_new
        eta_new = -s1n * eta
        phibar_new = jnp.abs(eta_new)
        return (x, v, v_new, w_old, w_new, beta_new, eta_new,
                g1n, g0n, s1n, s0n, phibar_new, k + 1)

    zero = jnp.zeros_like(b)
    one = jnp.asarray(1.0, b.dtype)
    z = jnp.asarray(0.0, b.dtype)
    st = (x_init, zero, v1, zero, zero, z, beta1, one, one, z, z, beta1,
          jnp.int32(0))
    st = jax.lax.while_loop(cond, body, st)
    x, *_ = st
    phibar, k = st[11], st[12]
    return CgResult(x=x, iterations=k, residual_norm=phibar)
