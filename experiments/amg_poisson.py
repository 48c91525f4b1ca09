"""AMG-PCG vs plain CG / Jacobi-PCG on Poisson 512^2 and 1024^2 (real TPU).

Timing: solver called under jax.jit; wall-clock = min over repeats minus
the measured tunnel round-trip latency (same methodology as bench/runner).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_matrix_tpu.solvers import (
    amg_setup,
    cg_solve,
    pcg_solve,
    poisson_2d_csr,
)
from sparse_matrix_tpu.solvers.cg import jacobi_preconditioner


def log(*a):
    print(*a, flush=True)


def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0)
    _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(f0(jnp.float32(0)))
        ls.append(time.perf_counter() - t0)
    return min(ls)


def timed(fn, arg, repeats=4):
    res = fn(arg)
    jax.block_until_ready(res)
    lat = probe_latency()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = fn(arg)
        _ = float(res.residual_norm)  # host readback forces completion
        ts.append(time.perf_counter() - t0)
    return max(0.0, min(ts) - lat), res


def run(n, smoother, cheb_degree=3, nu=1):
    log(f"=== poisson {n}^2 ({n*n} unknowns), smoother={smoother} ===")
    a = poisson_2d_csr(n, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))

    t0 = time.time()
    hier = amg_setup(
        a, coarse_size=400, smoother=smoother, cheb_degree=cheb_degree,
        nu=nu, dtype=np.float32, verbose=True,
    )
    log(f"setup {time.time()-t0:.1f}s: {hier!r}")

    op = hier.levels[0].a_op
    tol = 1e-5

    solve_amg = jax.jit(
        lambda bb: pcg_solve(op, bb, hier.preconditioner(), tol=tol, maxiter=100)
    )
    t_amg, r_amg = timed(solve_amg, b)
    log(
        f"AMG-PCG: {t_amg*1e3:.1f} ms, iters={int(r_amg.iterations)}, "
        f"|r|={float(r_amg.residual_norm):.3e}"
    )

    solve_cg = jax.jit(lambda bb: cg_solve(op, bb, tol=tol, maxiter=4000))
    t_cg, r_cg = timed(solve_cg, b)
    log(
        f"plain CG: {t_cg*1e3:.1f} ms, iters={int(r_cg.iterations)}, "
        f"|r|={float(r_cg.residual_norm):.3e}"
    )

    mj = jacobi_preconditioner(a)
    solve_j = jax.jit(lambda bb: pcg_solve(op, bb, mj, tol=tol, maxiter=4000))
    t_j, r_j = timed(solve_j, b)
    log(
        f"Jacobi-PCG: {t_j*1e3:.1f} ms, iters={int(r_j.iterations)}, "
        f"|r|={float(r_j.residual_norm):.3e}"
    )
    log(
        f"speedup vs plain CG: {t_cg/max(t_amg,1e-9):.2f}x "
        f"(iters {int(r_cg.iterations)} -> {int(r_amg.iterations)})"
    )


if __name__ == "__main__":
    ns = [int(x) for x in (sys.argv[1:] or ["512"])]
    log(f"backend: {jax.default_backend()}")
    for n in ns:
        for sm in ("jacobi", "chebyshev"):
            run(n, sm)
