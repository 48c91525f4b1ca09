"""Round-3 scale record: CG / IC(0)-PCG / AMG-PCG at 512^2, 1024^2, 2048^2
on the real v5e (chained-solve timing)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import amg_setup, poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import cg_solve, pcg_solve
from sparse_matrix_tpu.solvers.ilu import ic_preconditioner

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

def timed_chain(solve_fn, b0, R=8, reps=3, chained=True):
    if not chained:
        # 2048^2: the chained program embeds ~84 MB of operator constants
        # and exceeds the remote-compile payload limit (HTTP 413, the
        # known env artifact); single solves are >>RTT there, so plain
        # min-minus-latency is accurate enough
        jf = jax.jit(solve_fn)
        res = jf(b0); jax.block_until_ready(res.x)
        lat = probe_latency(); ts = []
        for _ in range(reps + 2):
            t0 = time.perf_counter(); res = jf(b0); _ = float(res.residual_norm)
            ts.append(time.perf_counter() - t0)
        return max(0.0, min(ts) - lat)
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
for n in (2048,):  # 512/1024 recorded in the same .out already
    a = poisson_2d_csr(n, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))
    op = SpmvOperator(a, dtype=np.float32)
    ch = n < 2048
    t_cg = timed_chain(lambda bb: cg_solve(op, bb, tol=1e-5, maxiter=8000), b, R=4, chained=ch)
    r_cg = jax.jit(lambda bb: cg_solve(op, bb, tol=1e-5, maxiter=8000))(b)
    t0=time.time(); mic = ic_preconditioner(a, sweeps=4); ic_setup = time.time()-t0
    t_ic = timed_chain(lambda bb: pcg_solve(op, bb, mic, tol=1e-5, maxiter=8000), b, R=4, chained=ch)
    r_ic = jax.jit(lambda bb: pcg_solve(op, bb, mic, tol=1e-5, maxiter=8000))(b)
    t0=time.time(); hier = amg_setup(a, coarse_size=400, dtype=np.float32); amg_t = time.time()-t0
    mamg = hier.preconditioner()
    t_amg = timed_chain(lambda bb: pcg_solve(op, bb, mamg, tol=1e-5, maxiter=200), b, chained=ch)
    r_amg = jax.jit(lambda bb: pcg_solve(op, bb, mamg, tol=1e-5, maxiter=200))(b)
    print(f"poisson {n}^2 ({a.rows} rows, {a.nnz()} nnz, fmt={op.format}):", flush=True)
    print(f"  CG      {t_cg*1e3:8.1f} ms ({int(r_cg.iterations)} it)", flush=True)
    print(f"  IC-PCG  {t_ic*1e3:8.1f} ms ({int(r_ic.iterations)} it, setup {ic_setup:.1f}s)", flush=True)
    print(f"  AMG-PCG {t_amg*1e3:8.1f} ms ({int(r_amg.iterations)} it, setup {amg_t:.1f}s)", flush=True)
