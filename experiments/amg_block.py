"""Block AMG-PCG: K right-hand sides in one lockstep solve vs K sequential
single-RHS solves (real TPU).

The block path runs ONE block V-cycle + ONE SpMM per iteration for all
live columns, so operator loads amortize K-fold (docs/PERF.md SpMM
section). Timing: R solves CHAINED inside one jit with a data dependency
(single-solve wall is below the tunnel RTT variance — un-chained
min-minus-latency measurements of this workload moved 0.0-6 ms between
runs), minus latency, divided by R.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sparse_matrix_tpu.solvers import amg_setup, poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import pcg_solve, pcg_solve_multi


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


def timed_chain(solve_fn, b0, R=20, reps=4):
    """solve_fn(b) -> CgResult; chains R solves with a data dependency."""

    @jax.jit
    def chain(b):
        def body(i, acc):
            res = solve_fn(b + acc * 1e-6)
            return acc + jnp.max(res.residual_norm)

        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    _ = float(chain(b0))
    lat = probe_latency()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(chain(b0))
        ts.append(time.perf_counter() - t0)
    return max(0.0, min(ts) - lat) / R


def run(n, ks):
    log(f"=== poisson {n}^2 ({n*n} unknowns), jacobi smoother ===")
    a = poisson_2d_csr(n, dtype=np.float32)
    rng = np.random.default_rng(0)

    t0 = time.time()
    hier = amg_setup(a, coarse_size=400, dtype=np.float32)
    log(f"setup {time.time()-t0:.1f}s: {hier!r}")
    op = hier.levels[0].a_op
    m_inv = hier.preconditioner()

    b1 = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))
    t1 = timed_chain(lambda bb: pcg_solve(op, bb, m_inv, tol=1e-5, maxiter=60), b1)
    res1 = jax.jit(lambda bb: pcg_solve(op, bb, m_inv, tol=1e-5, maxiter=60))(b1)
    log(f"K=1 single: {t1*1e3:.2f} ms, iters={int(res1.iterations)}")

    for k in ks:
        B = jnp.asarray(rng.standard_normal((a.rows, k)).astype(np.float32))
        solve = lambda bb: pcg_solve_multi(
            lambda X: op.matmat(X), bb, m_inv, tol=1e-5, maxiter=60, rhs_axis=-1
        )
        tk = timed_chain(solve, B, R=10)
        resk = jax.jit(solve)(B)
        it = int(jnp.max(resk.iterations)) if hasattr(resk.iterations, "shape") else int(resk.iterations)
        log(
            f"K={k:2d} block: {tk*1e3:8.2f} ms ({tk/k*1e3:6.2f} ms/rhs), "
            f"iters={it}, max|r|={float(jnp.max(resk.residual_norm)):.2e} "
            f"| sequential {t1*k*1e3:8.2f} ms -> {t1*k/tk:.2f}x"
        )


if __name__ == "__main__":
    run(512, (4, 8, 16))
