"""VERDICT r2 item 4: IC(0)-PCG vs plain CG at 1024^2 and 2048^2.

Round-2 reading: IC-PCG 25.5 ms vs CG 24.4 ms at 1024^2 ("loses its
edge").  This experiment (a) confirms the factor sweeps plan onto DIA,
(b) scans the sweep count — the composite M^{-1} = S^T S is symmetric
PSD for ANY count, so fewer sweeps is legal and trades iteration count
against per-iteration cost.  Chained-solve timing at BOTH sizes: all
operator/factor arrays are passed as jit ARGUMENTS (as_pytree/apply), so
the 2048^2 program carries no 84+ MB constants (no HTTP 413).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import cg_solve, pcg_solve
from sparse_matrix_tpu.solvers.ilu import ic0, TriangularJacobi

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

def timed_chain(solve_fn, params, b0, R, reps=3):
    @jax.jit
    def chain(pp, b):
        def body(i, acc):
            res = solve_fn(pp, b + acc * 1e-6)
            return acc + res.residual_norm
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))
    _ = float(chain(params, b0))
    lat = probe_latency(); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); _ = float(chain(params, b0)); ts.append(time.perf_counter() - t0)
    return max(0.0, min(ts) - lat) / R

print("backend:", jax.default_backend(), flush=True)
for n in (1024, 2048):
    a = poisson_2d_csr(n, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))
    op = SpmvOperator(a, dtype=np.float32)
    ap = op.as_pytree()
    R = 6 if n <= 1024 else 3
    t0 = time.time(); lc = ic0(a); fac_t = time.time() - t0
    print(f"poisson {n}^2 ({a.rows} rows): A fmt={op.format}, ic0 {fac_t:.2f}s", flush=True)

    t_cg = timed_chain(lambda pp, bb: cg_solve(lambda v: op.apply(pp, v), bb,
                                               tol=1e-5, maxiter=8000), ap, b, R=R)
    r_cg = jax.jit(lambda pp, bb: cg_solve(lambda v: op.apply(pp, v), bb,
                                           tol=1e-5, maxiter=8000))(ap, b)
    print(f"  CG              {t_cg*1e3:8.1f} ms ({int(r_cg.iterations)} it)", flush=True)

    for sweeps, fused in ((1, None), (2, None), (4, None), (4, False), (2, False)):
        t0 = time.time()
        sl = TriangularJacobi(lc, sweeps=sweeps, fused=fused)
        su = TriangularJacobi(lc.transpose(), sweeps=sweeps, fused=fused)
        setup = time.time() - t0 + fac_t
        params = (ap, sl.as_pytree(), su.as_pytree())
        if sweeps == 1:
            print(f"    L/Lt sweep fmts={sl.n_op.format}/{su.n_op.format} "
                  f"fused={sl._fused is not None}", flush=True)

        def solve(pp, bb):
            app, lp, up = pp
            return pcg_solve(lambda v: op.apply(app, v), bb,
                             lambda r: su.apply(up, sl.apply(lp, r)),
                             tol=1e-5, maxiter=8000)
        t = timed_chain(solve, params, b, R=R)
        r = jax.jit(solve)(params, b)
        tag = "fused" if sl._fused is not None else "loop "
        print(f"  IC-PCG s={sweeps} {tag}: setup {setup:5.2f}s  "
              f"{t*1e3:8.1f} ms ({int(r.iterations)} it)  "
              f"vs CG {t_cg/t:4.2f}x", flush=True)
