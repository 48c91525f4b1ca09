"""Eigenvalue solvers driven by the planned SpMV operator.

Solver-layer breadth beyond CG: power iteration (dominant eigenpair) and a
fixed-iteration Lanczos tridiagonalization for extremal eigenvalues of
symmetric operators. Everything is one jitted ``lax``-loop; the matvec is
any callable (SpmvOperator, distributed SpMV, ...).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PowerResult", "power_iteration", "inverse_power_iteration", "lanczos", "eigsh_extremal"]


class PowerResult(NamedTuple):
    eigenvalue: jnp.ndarray
    eigenvector: jnp.ndarray
    iterations: jnp.ndarray


def power_iteration(
    matvec: Callable, n: int, *, tol: float = 1e-6, maxiter: int = 500, seed: int = 0
) -> PowerResult:
    """Dominant eigenpair by power iteration with Rayleigh quotient."""
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype=jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)

    def cond(state):
        _v, lam, lam_prev, k = state
        return jnp.logical_and(jnp.abs(lam - lam_prev) > tol * jnp.abs(lam) + 1e-30, k < maxiter)

    def body(state):
        v, lam, _prev, k = state
        w = matvec(v)
        lam_new = jnp.vdot(v, w).real
        v = w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
        return v, lam_new, lam, k + 1

    v, lam, _prev, k = jax.lax.while_loop(
        cond, body, (v0, jnp.float32(0), jnp.float32(jnp.inf), jnp.int32(0))
    )
    return PowerResult(eigenvalue=lam, eigenvector=v, iterations=k)


def lanczos(matvec: Callable, n: int, m: int, *, seed: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """m-step Lanczos: returns (alpha (m,), beta (m-1,)) of the tridiagonal
    projection of a symmetric operator (full reorthogonalization omitted —
    fine for extremal-eigenvalue estimates)."""
    q = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype=jnp.float32)
    q = q / jnp.linalg.norm(q)

    def body(carry, _):
        q_prev, q_cur, beta_prev = carry
        w = matvec(q_cur) - beta_prev * q_prev
        alpha = jnp.vdot(q_cur, w).real
        w = w - alpha * q_cur
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.maximum(beta, 1e-30)
        return (q_cur, q_next, beta), (alpha, beta)

    (_, _, _), (alphas, betas) = jax.lax.scan(
        body, (jnp.zeros_like(q), q, jnp.float32(0)), None, length=m
    )
    return alphas, betas[:-1]


def eigsh_extremal(matvec: Callable, n: int, *, m: int = 50, seed: int = 0):
    """(lambda_min, lambda_max) estimates from the Lanczos tridiagonal."""
    alphas, betas = lanczos(matvec, n, m, seed=seed)
    t = np.diag(np.asarray(alphas)) + np.diag(np.asarray(betas), 1) + np.diag(np.asarray(betas), -1)
    ev = np.linalg.eigvalsh(t)
    return float(ev[0]), float(ev[-1])


def inverse_power_iteration(
    matvec: Callable,
    n: int,
    *,
    tol: float = 1e-5,
    maxiter: int = 100,
    inner_tol: float = 1e-6,
    inner_maxiter: int = 500,
    seed: int = 0,
) -> PowerResult:
    """Smallest eigenpair of an SPD operator by inverse iteration, with the
    linear solves done by the library's own CG — solvers composing solvers."""
    from .cg import cg_solve

    v = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype=jnp.float32)
    v = v / jnp.linalg.norm(v)
    lam = jnp.float32(0)
    lam_prev = jnp.float32(jnp.inf)
    k = 0
    # host loop: each step is a full jitted CG solve
    for k in range(1, maxiter + 1):
        w = cg_solve(matvec, v, tol=inner_tol, maxiter=inner_maxiter).x
        w = w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
        lam_prev, lam = lam, jnp.vdot(w, matvec(w)).real
        v = w
        if abs(float(lam - lam_prev)) <= tol * abs(float(lam)) + 1e-30:
            break
    return PowerResult(eigenvalue=lam, eigenvector=v, iterations=jnp.int32(k))
