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
    precond: Callable = None,
) -> CgResult:
    """Solve ``A x = b`` for symmetric ``A`` (definite or not).

    Convergence: estimated ||r||_2 <= tol * ||b||_2 (the Givens-recurrence
    residual estimate, exact in exact arithmetic).

    ``precond`` (an SPD approximate-inverse apply, e.g.
    :func:`~.cg.jacobi_preconditioner`) switches to preconditioned MINRES
    (Paige-Saunders recurrence in the M-inner product); the residual
    estimate then measures ``||r||_{M}`` of the preconditioned system and
    the stopping test is relative to the preconditioned ``||b||``.
    """
    if precond is not None:
        return _pminres(matvec, precond, b, x0, tol=tol, maxiter=maxiter)
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


def _pminres(
    matvec: Callable,
    precond: Callable,
    b,
    x0=None,
    *,
    tol: float = 1e-6,
    maxiter: int = 1000,
) -> CgResult:
    """Preconditioned MINRES (Paige & Saunders 1975 recurrence with an SPD
    preconditioner, the classic Stanford/scipy formulation). One
    ``lax.while_loop``: two matvec-family applies (A and M^-1) per
    iteration, no host round-trips."""
    b = jnp.asarray(b)
    eps = jnp.asarray(1e-30, b.dtype)
    x_init = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    r1 = b - matvec(x_init) if x0 is not None else b
    y = precond(r1)
    beta1 = jnp.sqrt(jnp.maximum(jnp.vdot(r1, y).real.astype(b.dtype), 0.0))
    rtol = tol * jnp.where(beta1 > 0, beta1, 1.0)

    # state: x, r1, r2, y, w, w2, oldb, beta, dbar, epsln, phibar, cs, sn, k
    def cond(st):
        return jnp.logical_and(st[10] > rtol, st[13] < maxiter)

    def body(st):
        x, r1, r2, y, w, w2, oldb, beta, dbar, epsln, phibar, cs, sn, k = st
        v = y / jnp.maximum(beta, eps)
        y2 = matvec(v)
        # first iteration has no r1 correction (oldb == 0 encodes it)
        y2 = y2 - jnp.where(oldb > 0, beta / jnp.maximum(oldb, eps), 0.0) * r1
        alfa = jnp.vdot(v, y2).real.astype(b.dtype)
        y2 = y2 - (alfa / jnp.maximum(beta, eps)) * r2
        r1n, r2n = r2, y2
        yn = precond(r2n)
        oldbn = beta
        betan = jnp.sqrt(jnp.maximum(jnp.vdot(r2n, yn).real.astype(b.dtype), 0.0))

        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln_n = sn * betan
        dbar_n = -cs * betan
        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + betan * betan), eps)
        cs_n = gbar / gamma
        sn_n = betan / gamma
        phi = cs_n * phibar
        phibar_n = sn_n * phibar

        w1 = w2
        w2n = w
        wn = (v - oldeps * w1 - delta * w2n) / gamma
        xn = x + phi * wn
        return (xn, r1n, r2n, yn, wn, w2n, oldbn, betan, dbar_n, epsln_n,
                phibar_n, cs_n, sn_n, k + 1)

    zero = jnp.zeros_like(b)
    z = jnp.asarray(0.0, b.dtype)
    st = (x_init, r1, r1, y, zero, zero, z, beta1, z, z, beta1,
          jnp.asarray(-1.0, b.dtype), z, jnp.int32(0))
    st = jax.lax.while_loop(cond, body, st)
    return CgResult(x=st[0], iterations=st[13], residual_norm=st[10])
