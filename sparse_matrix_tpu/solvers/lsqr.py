"""LSQR: least-squares / rectangular-system solver driven by a pluggable
SpMV pair (A and A^T).

North-star scope (not in the Rust reference): every other solver here
assumes a square operator; LSQR (Paige & Saunders 1982, Golub-Kahan
bidiagonalization + QR of the bidiagonal) solves ``min ||A x - b||_2`` for
any m x n sparse A, the canonical sparse least-squares method. Pure
``lax.while_loop`` — one jit, no host round-trips per iteration, same
discipline as :mod:`.cg`. The transpose matvec comes for free on device:
``transpose_device`` is one (col, row) sort (:mod:`..ops.device_sorted`),
after which A^T has its own :class:`~..ops.operator.SpmvOperator`.

Stopping: ||A^T r|| <= tol * ||A||_F * ||r|| (the standard LSQR ``atol``
criterion with the Frobenius estimate accumulated from the bidiagonal
coefficients), or ||r|| <= tol * ||b|| for consistent systems.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["LsqrResult", "lsqr_solve"]


class LsqrResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32
    residual_norm: jnp.ndarray  # ||A x - b||_2 estimate
    atr_norm: jnp.ndarray  # ||A^T (A x - b)||_2 estimate


def _sym_ortho(a, b):
    """Stable Givens (c, s, r) with r = hypot(a, b) (Paige-Saunders)."""
    r = jnp.hypot(a, b)
    safe = jnp.where(r == 0, 1.0, r)
    return jnp.where(r == 0, 1.0, a / safe), jnp.where(r == 0, 0.0, b / safe), r


def lsqr_solve(
    matvec: Callable,
    rmatvec: Callable,
    b,
    *,
    n: int | None = None,
    x0=None,
    tol: float = 1e-6,
    maxiter: int = 1000,
) -> LsqrResult:
    """Solve ``min ||A x - b||_2`` with ``matvec(v) = A v`` ((n,) -> (m,))
    and ``rmatvec(u) = A^T u`` ((m,) -> (n,)).

    ``n`` (the column count) is required when ``x0`` is None and cannot be
    inferred; otherwise it is taken from ``x0``.
    """
    b = jnp.asarray(b)
    if x0 is None:
        if n is None:
            raise ValueError("lsqr_solve needs n= or x0= to size x")
        x = jnp.zeros(n, b.dtype)
        u = b
    else:
        x = jnp.asarray(x0)
        u = b - matvec(x)

    beta = jnp.linalg.norm(u)
    u = u / jnp.where(beta == 0, 1.0, beta)
    v = rmatvec(u)
    alpha = jnp.linalg.norm(v)
    v = v / jnp.where(alpha == 0, 1.0, alpha)
    w = v
    phibar = beta
    rhobar = alpha
    anorm2 = alpha * alpha  # accumulates ||B_k||_F^2 ~ ||A||_F^2 lower bound
    b_norm = jnp.linalg.norm(b)

    # state: x, u, v, w, alpha, rhobar, phibar, anorm2, rnorm, atrnorm, k
    atr0 = alpha * beta

    def cond(st):
        _x, _u, _v, _w, alpha, _rb, _pb, anorm2, rnorm, atrnorm, k = st
        anorm = jnp.sqrt(anorm2)
        ok1 = atrnorm > tol * anorm * jnp.where(rnorm == 0, 1.0, rnorm)
        ok2 = rnorm > tol * jnp.where(b_norm == 0, 1.0, b_norm)
        return jnp.logical_and(jnp.logical_and(ok1, ok2), k < maxiter)

    def body(st):
        x, u, v, w, alpha, rhobar, phibar, anorm2, _rn, _at, k = st
        # bidiagonalization step
        u = matvec(v) - alpha * u
        beta = jnp.linalg.norm(u)
        u = u / jnp.where(beta == 0, 1.0, beta)
        v_new = rmatvec(u) - beta * v
        alpha_new = jnp.linalg.norm(v_new)
        v_new = v_new / jnp.where(alpha_new == 0, 1.0, alpha_new)
        anorm2 = anorm2 + beta * beta + alpha_new * alpha_new
        # QR via Givens on the lower bidiagonal
        c, s, rho = _sym_ortho(rhobar, beta)
        theta = s * alpha_new
        rhobar_new = -c * alpha_new
        phi = c * phibar
        phibar_new = s * phibar
        # update
        safe_rho = jnp.where(rho == 0, 1.0, rho)
        x = x + (phi / safe_rho) * w
        w = v_new - (theta / safe_rho) * w
        rnorm = phibar_new
        atrnorm = phibar_new * alpha_new * jnp.abs(c)
        return x, u, v_new, w, alpha_new, rhobar_new, phibar_new, anorm2, rnorm, atrnorm, k + 1

    st0 = (x, u, v, w, alpha, rhobar, phibar, anorm2, beta, atr0, jnp.int32(0))
    x, u, v, w, alpha, rhobar, phibar, anorm2, rnorm, atrnorm, k = jax.lax.while_loop(
        cond, body, st0
    )
    return LsqrResult(x=x, iterations=k, residual_norm=rnorm, atr_norm=atrnorm)
