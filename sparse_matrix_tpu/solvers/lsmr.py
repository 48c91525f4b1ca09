"""LSMR: least-squares solver equivalent to MINRES on the normal equations.

North-star scope (not in the Rust reference; completes the rectangular-
solver pair with :mod:`.lsqr`): LSMR (Fong & Saunders 2011) runs the same
Golub-Kahan bidiagonalization as LSQR but applies a second QR so that
``||A^T r_k||`` decreases MONOTONICALLY — the safer method to stop early
on ill-conditioned problems, and the scipy.sparse.linalg.lsmr analog.
Optional Tikhonov ``damp`` solves ``min ||Ax-b||^2 + damp^2 ||x||^2``.

Pure ``lax.while_loop`` — one jit, no host round-trips per iteration,
same discipline as :mod:`.cg`/:mod:`.lsqr`; the transpose matvec comes
from the device transpose + its own operator, exactly as in LSQR.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .lsqr import _sym_ortho

__all__ = ["LsmrResult", "lsmr_solve"]


class LsmrResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32
    residual_norm: jnp.ndarray  # ||A x - b||_2 estimate
    atr_norm: jnp.ndarray  # ||A^T (A x - b)||_2 estimate (monotone)


def _safe(x):
    return jnp.where(x == 0, 1.0, x)


def lsmr_solve(
    matvec: Callable,
    rmatvec: Callable,
    b,
    *,
    n: int | None = None,
    x0=None,
    damp: float = 0.0,
    tol: float = 1e-6,
    maxiter: int = 1000,
) -> LsmrResult:
    """Solve ``min ||A x - b||_2`` (plus ``damp^2 ||x||^2`` when damped)
    with ``matvec(v) = A v`` ((n,) -> (m,)) and ``rmatvec(u) = A^T u``.

    Stopping mirrors :func:`~.lsqr.lsqr_solve`:
    ``||A^T r|| <= tol * ||A||_F * ||r||`` or ``||r|| <= tol * ||b||``.
    With ``x0`` the iteration solves for the correction ``x - x0``
    (standard shift; the returned residual estimates are exact for the
    shifted problem).
    """
    b = jnp.asarray(b)
    if x0 is None:
        if n is None:
            raise ValueError("lsmr_solve needs n= or x0= to size x")
        xshift = None
        u = b
        x = jnp.zeros(n, b.dtype)
    else:
        xshift = jnp.asarray(x0)
        u = b - matvec(xshift)
        x = jnp.zeros_like(xshift)
    damp = jnp.asarray(damp, b.dtype)

    beta0 = jnp.linalg.norm(u)
    u = u / _safe(beta0)
    v = rmatvec(u)
    alpha0 = jnp.linalg.norm(v)
    v = v / _safe(alpha0)
    b_norm = beta0

    # Fong-Saunders state (their variable names, flattened into a tuple):
    # x, u, v, h, hbar, alphabar, rho, rhobar, cbar, sbar, zeta, zetabar,
    # + residual-estimate chain (betadd, betad, rhodold, tautildeold,
    # thetatilde, d2) + normA2 accumulator + rnorm/atrnorm readouts + k
    st0 = dict(
        x=x, u=u, v=v, h=v, hbar=jnp.zeros_like(v),
        alpha=alpha0, alphabar=alpha0, rho=jnp.asarray(1.0, b.dtype),
        rhobar=jnp.asarray(1.0, b.dtype), cbar=jnp.asarray(1.0, b.dtype),
        sbar=jnp.asarray(0.0, b.dtype), zeta=jnp.asarray(0.0, b.dtype),
        zetabar=alpha0 * beta0,
        betadd=beta0, betad=jnp.asarray(0.0, b.dtype),
        rhodold=jnp.asarray(1.0, b.dtype),
        tautildeold=jnp.asarray(0.0, b.dtype),
        thetatilde=jnp.asarray(0.0, b.dtype),
        d2=jnp.asarray(0.0, b.dtype),
        normA2=alpha0 * alpha0,
        rnorm=beta0, atrnorm=alpha0 * beta0,
        k=jnp.int32(0),
    )
    keys = tuple(st0.keys())

    def cond(vals):
        st = dict(zip(keys, vals))
        anorm = jnp.sqrt(st["normA2"])
        ok1 = st["atrnorm"] > tol * anorm * _safe(st["rnorm"])
        ok2 = st["rnorm"] > tol * _safe(b_norm)
        return jnp.logical_and(jnp.logical_and(ok1, ok2), st["k"] < maxiter)

    def body(vals):
        st = dict(zip(keys, vals))
        u = matvec(st["v"]) - st["alpha"] * st["u"]
        beta = jnp.linalg.norm(u)
        u = u / _safe(beta)
        v = rmatvec(u) - beta * st["v"]
        alpha = jnp.linalg.norm(v)
        v = v / _safe(alpha)

        # rotation eliminating the damping row (identity when damp == 0)
        chat, shat, alphahat = _sym_ortho(st["alphabar"], damp)
        # rotation turning the bidiagonal into upper-triangular R
        rhoold = st["rho"]
        c, s, rho = _sym_ortho(alphahat, beta)
        thetanew = s * alpha
        alphabar = c * alpha
        # second rotation (the LSMR extra) producing Rbar
        rhobarold = st["rhobar"]
        zetaold = st["zeta"]
        thetabar = st["sbar"] * rho
        cbar, sbar, rhobar = _sym_ortho(st["cbar"] * rho, thetanew)
        zeta = cbar * st["zetabar"]
        zetabar = -sbar * st["zetabar"]

        hbar = st["h"] - (thetabar * rho / _safe(rhoold * rhobarold)) * st["hbar"]
        x = st["x"] + (zeta / _safe(rho * rhobar)) * hbar
        h = v - (thetanew / _safe(rho)) * st["h"]

        # ||r|| estimate chain (Fong-Saunders section 5.2)
        betaacute = chat * st["betadd"]
        betacheck = -shat * st["betadd"]
        betahat = c * betaacute
        betadd = -s * betaacute
        thetatildeold = st["thetatilde"]
        ctildeold, stildeold, rhotildeold = _sym_ortho(st["rhodold"], thetabar)
        thetatilde = stildeold * rhobar
        rhodold = ctildeold * rhobar
        betad = -stildeold * st["betad"] + ctildeold * betahat
        tautildeold = (zetaold - thetatildeold * st["tautildeold"]) / _safe(
            rhotildeold
        )
        taud = (zeta - thetatilde * tautildeold) / _safe(rhodold)
        d2 = st["d2"] + betacheck * betacheck
        rnorm = jnp.sqrt(d2 + (betad - taud) ** 2 + betadd * betadd)
        normA2 = st["normA2"] + beta * beta + alpha * alpha
        atrnorm = jnp.abs(zetabar)

        out = dict(
            x=x, u=u, v=v, h=h, hbar=hbar, alphabar=alphabar, rho=rho,
            rhobar=rhobar, cbar=cbar, sbar=sbar, zeta=zeta, zetabar=zetabar,
            betadd=betadd, betad=betad, rhodold=rhodold,
            tautildeold=tautildeold, thetatilde=thetatilde, d2=d2,
            normA2=normA2, rnorm=rnorm, atrnorm=atrnorm, k=st["k"] + 1,
            alpha=alpha,
        )
        return tuple(out[k] for k in keys)

    vals = jax.lax.while_loop(cond, body, tuple(st0[k] for k in keys))
    st = dict(zip(keys, vals))
    x = st["x"] if xshift is None else st["x"] + xshift
    return LsmrResult(
        x=x, iterations=st["k"], residual_norm=st["rnorm"],
        atr_norm=st["atrnorm"],
    )
