"""CG Poisson 2048^2 with bf16 band planes vs f32.

The {-1, 4} stencil is exact in bf16, so the bf16-operator CG computes
BIT-IDENTICAL iterates — the 2.33x SpMV uplift (bf16_bench.out) is free.
Chained-solve timing: R solves chained in one jit (unchained solver
timings are RTT noise — CLAUDE.md).
"""
import faulthandler, sys, time
sys.path.insert(0, "/root/repo")
faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)
import numpy as np, jax, jax.numpy as jnp

from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import cg_solve, poisson_2d_csr


def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)


def bench_chained_solve(op, b, tol, maxiter, chain=4, reps=3):
    @jax.jit
    def run(bb):
        def body(_, v):
            r = cg_solve(op, v, tol=tol, maxiter=maxiter)
            # data dependency: next rhs perturbed by the solution
            return bb + 1e-9 * r.x
        return cg_solve(op, jax.lax.fori_loop(0, chain - 1, body, bb), tol=tol, maxiter=maxiter)
    r = run(b); _ = float(r.residual_norm)
    lat = probe_latency(); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = run(b); _ = float(r.residual_norm)
        ts.append(time.perf_counter() - t0)
    return (min(ts) - lat) / chain, r


n = 2048
a = poisson_2d_csr(n, dtype=np.float32)
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))
bn = float(jnp.linalg.norm(b))

for tag, vdt in (("f32", None), ("bf16", jnp.bfloat16)):
    op = SpmvOperator(a, force="dia", values_dtype=vdt)
    t, r = bench_chained_solve(op, b, 1e-5, 3000)
    print(f"cg poisson_{n}^2 {tag}: {t*1e3:.1f} ms/solve, "
          f"iters={int(r.iterations)}, rel res={float(r.residual_norm)/bn:.2e}",
          flush=True)
print("DONE", flush=True)
