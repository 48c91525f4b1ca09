"""IC(0)-PCG wall-clock on real TPU vs plain CG / Jacobi-PCG / AMG-PCG.

Methodology: R solves chained inside one jit with a data dependency
(single solves sit near the tunnel RTT; unchained timing is noise), minus
latency, divided by R.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import poisson_2d_csr, amg_setup
from sparse_matrix_tpu.solvers.cg import cg_solve, pcg_solve, jacobi_preconditioner
from sparse_matrix_tpu.solvers.ilu import ic_preconditioner

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

def timed_chain(solve_fn, b0, R=10, reps=4):
    @jax.jit
    def chain(b):
        def body(i, acc):
            res = solve_fn(b + acc * 1e-6)
            return acc + res.residual_norm
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))
    _ = float(chain(b0))
    lat = probe_latency(); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); _ = float(chain(b0)); ts.append(time.perf_counter() - t0)
    return max(0.0, min(ts) - lat) / R

print("backend:", jax.default_backend(), flush=True)
n = 512
a = poisson_2d_csr(n, dtype=np.float32)
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))
op = SpmvOperator(a, dtype=np.float32)

mj = jacobi_preconditioner(a)
for sweeps in (2, 4, 8):
    t0=time.time(); mic = ic_preconditioner(a, sweeps=sweeps)
    setup = time.time()-t0
    t = timed_chain(lambda bb: pcg_solve(op, bb, mic, tol=1e-5, maxiter=3000), b)
    res = jax.jit(lambda bb: pcg_solve(op, bb, mic, tol=1e-5, maxiter=3000))(b)
    print(f"IC(0)-PCG sweeps={sweeps}: setup {setup:.2f}s, solve {t*1e3:8.2f} ms, iters={int(res.iterations)}", flush=True)
t = timed_chain(lambda bb: cg_solve(op, bb, tol=1e-5, maxiter=3000), b)
res = jax.jit(lambda bb: cg_solve(op, bb, tol=1e-5, maxiter=3000))(b)
print(f"plain CG:   {t*1e3:8.2f} ms, iters={int(res.iterations)}", flush=True)
t = timed_chain(lambda bb: pcg_solve(op, bb, mj, tol=1e-5, maxiter=3000), b)
res = jax.jit(lambda bb: pcg_solve(op, bb, mj, tol=1e-5, maxiter=3000))(b)
print(f"jacobi-PCG: {t*1e3:8.2f} ms, iters={int(res.iterations)}", flush=True)
t0=time.time(); hier = amg_setup(a, coarse_size=400, dtype=np.float32); amg_t = time.time()-t0
mamg = hier.preconditioner()
t = timed_chain(lambda bb: pcg_solve(op, bb, mamg, tol=1e-5, maxiter=3000), b)
res = jax.jit(lambda bb: pcg_solve(op, bb, mamg, tol=1e-5, maxiter=3000))(b)
print(f"AMG-PCG: setup {amg_t:.2f}s, solve {t*1e3:8.2f} ms, iters={int(res.iterations)}", flush=True)
