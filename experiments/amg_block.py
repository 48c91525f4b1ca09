"""Block AMG-PCG: K right-hand sides in one lockstep solve vs K sequential
single-RHS solves (real TPU).

The block path runs ONE block V-cycle + ONE SpMM per iteration for all
live columns, so operator loads amortize K-fold (docs/PERF.md SpMM
section). Timing methodology = experiments/amg_poisson.py (min over
repeats minus tunnel round-trip latency).
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


def timed(fn, arg, repeats=4):
    res = fn(arg)
    jax.block_until_ready(res)
    lat = probe_latency()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = fn(arg)
        _ = float(jnp.max(res.residual_norm))  # host readback forces completion
        ts.append(time.perf_counter() - t0)
    return max(0.0, min(ts) - lat), res


def run(n, ks):
    log(f"=== poisson {n}^2 ({n*n} unknowns), jacobi smoother ===")
    a = poisson_2d_csr(n, dtype=np.float32)
    rng = np.random.default_rng(0)

    t0 = time.time()
    hier = amg_setup(a, coarse_size=400, dtype=np.float32)
    log(f"setup {time.time()-t0:.1f}s: {hier!r}")
    op = hier.levels[0].a_op
    m_inv = hier.preconditioner()
    tol = 1e-5

    solve_one = jax.jit(lambda bb: pcg_solve(op, bb, m_inv, tol=tol, maxiter=100))
    solve_blk = jax.jit(
        lambda bb: pcg_solve_multi(op.matmat, bb, m_inv, tol=tol, maxiter=100)
    )

    b1 = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))
    t1, r1 = timed(solve_one, b1)
    log(f"K=1 single: {t1*1e3:.2f} ms, iters={int(r1.iterations)}")

    for k in ks:
        B = jnp.asarray(rng.standard_normal((a.rows, k)).astype(np.float32))
        tb, rb = timed(solve_blk, B)
        # sequential baseline: K independent single solves (measured once,
        # scaled — each column is statistically identical)
        seq = t1 * k
        log(
            f"K={k:2d} block: {tb*1e3:7.2f} ms ({tb/k*1e3:6.2f} ms/rhs), "
            f"iters={int(rb.iterations)}, max|r|={float(jnp.max(rb.residual_norm)):.2e} "
            f"| sequential {seq*1e3:7.2f} ms -> {seq/max(tb,1e-9):4.2f}x"
        )


if __name__ == "__main__":
    ns = [int(x) for x in (sys.argv[1:] or ["512"])]
    log(f"backend: {jax.default_backend()}")
    for n in ns:
        run(n, ks=[4, 8, 16])
