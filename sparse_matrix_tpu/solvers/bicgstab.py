"""BiCGSTAB for general (nonsymmetric) systems.

Complements CG: same pluggable-matvec shape, pure recurrences (no Krylov
basis storage), one jitted ``lax.while_loop``. Breakdown (rho or omega
collapsing to ~0) terminates the loop with the current iterate.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .cg import CgResult

__all__ = ["bicgstab_solve"]

_EPS = 1e-30


def bicgstab_solve(
    matvec: Callable,
    b,
    x0=None,
    *,
    tol: float = 1e-6,
    maxiter: int = 1000,
    m_inv: Callable = None,
) -> CgResult:
    """Solve ``A x = b`` for general square ``A``; ||r|| <= tol*||b||.

    ``m_inv`` right-preconditions (van der Vorst's variant: the search
    directions are preconditioned, the recurrence tracks the TRUE
    residual, so the stopping test needs no unpreconditioned re-check);
    pass e.g. :func:`~.ilu.ilu_preconditioner`.
    """
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    if m_inv is None:
        m_inv = lambda v: v  # noqa: E731

    r = b - matvec(x)
    r_hat = r
    rho = jnp.vdot(r_hat, r).real
    p = r
    rr = jnp.vdot(r, r).real
    b_norm2 = jnp.vdot(b, b).real
    tol2 = jnp.asarray(tol, rr.dtype) ** 2 * jnp.where(b_norm2 > 0, b_norm2, 1.0)

    def cond(state):
        _x, _p, _r, _rho, rr, ok, k = state
        return jnp.logical_and(jnp.logical_and(rr > tol2, ok), k < maxiter)

    def body(state):
        x, p, r, rho, _rr, _ok, k = state
        p_hat = m_inv(p)
        v = matvec(p_hat)
        denom = jnp.vdot(r_hat, v).real
        alpha = rho / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
        s = r - alpha * v
        s_hat = m_inv(s)
        t = matvec(s_hat)
        tt = jnp.vdot(t, t).real
        omega = jnp.vdot(t, s).real / jnp.where(tt < _EPS, _EPS, tt)
        x = x + alpha * p_hat + omega * s_hat
        r = s - omega * t
        rho_new = jnp.vdot(r_hat, r).real
        beta = (rho_new / jnp.where(jnp.abs(rho) < _EPS, _EPS, rho)) * (
            alpha / jnp.where(jnp.abs(omega) < _EPS, _EPS, omega)
        )
        p = r + beta * (p - omega * v)
        ok = jnp.logical_and(jnp.abs(rho_new) > _EPS, jnp.abs(omega) > _EPS)
        return x, p, r, rho_new, jnp.vdot(r, r).real, ok, k + 1

    x, p, r, rho, rr, ok, k = jax.lax.while_loop(
        cond, body, (x, p, r, rho, rr, jnp.bool_(True), jnp.int32(0))
    )
    return CgResult(x=x, iterations=k, residual_norm=jnp.sqrt(rr))
