"""bf16 at solver scale, Poisson 2048^2: IC-PCG with bf16 factor sweeps
and AMG-PCG with a bf16 hierarchy, vs their f32 forms.

The {-1,4} stencil is bf16-exact, but the IC factor and the AMG Galerkin
operators are NOT — these runs exercise the real preconditioner-grade
rounding path at scale. Chained-solve timing (fori_loop of solves with a
data dependency, scalar readback, minus RTT); all arrays as jit args.
"""
import faulthandler, sys, time
sys.path.insert(0, "/root/repo")
faulthandler.dump_traceback_later(900, repeat=True, file=sys.stderr)
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


def timed_chain(solve_fn, params, b0, R=3, reps=3):
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
n = 2048
a = poisson_2d_csr(n, dtype=np.float32)
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))
bn = float(jnp.linalg.norm(b))

op = SpmvOperator(a, dtype=np.float32)
ap = op.as_pytree()
t_cg = timed_chain(lambda pp, bb: cg_solve(lambda v: op.apply(pp, v), bb,
                                           tol=1e-5, maxiter=8000), ap, b)
r_cg = jax.jit(lambda pp, bb: cg_solve(lambda v: op.apply(pp, v), bb,
                                       tol=1e-5, maxiter=8000))(ap, b)
print(f"CG f32       {t_cg*1e3:8.1f} ms ({int(r_cg.iterations)} it)", flush=True)

# bf16 operator: stencil exact in bf16 -> identical iterates, faster SpMV
op16 = SpmvOperator(a, dtype=np.float32, force="dia", values_dtype=jnp.bfloat16)
ap16 = op16.as_pytree()
t_cg16 = timed_chain(lambda pp, bb: cg_solve(lambda v: op16.apply(pp, v), bb,
                                             tol=1e-5, maxiter=8000), ap16, b)
r16 = jax.jit(lambda pp, bb: cg_solve(lambda v: op16.apply(pp, v), bb,
                                      tol=1e-5, maxiter=8000))(ap16, b)
print(f"CG bf16-op   {t_cg16*1e3:8.1f} ms ({int(r16.iterations)} it) "
      f"rel res={float(r16.residual_norm)/bn:.2e}  vs f32 {t_cg/t_cg16:4.2f}x",
      flush=True)

# IC(0)-PCG s=2 loop sweeps, f32 vs bf16 factor planes
t0 = time.time(); lc = ic0(a); fac_t = time.time() - t0
print(f"ic0 {fac_t:.2f}s", flush=True)
for tag, vdt in (("f32 ", None), ("bf16", jnp.bfloat16)):
    sl = TriangularJacobi(lc, sweeps=2, values_dtype=vdt)
    su = TriangularJacobi(lc.transpose(), sweeps=2, values_dtype=vdt)
    print(f"  sweep fmts={sl.n_op.format}/{su.n_op.format} "
          f"dtype={sl.n_op._dia_arrs['data'].dtype if sl.n_op._dia is not None else '?'}",
          flush=True)
    params = (ap, sl.as_pytree(), su.as_pytree())

    def solve(pp, bb):
        app, lp, up = pp
        return pcg_solve(lambda v: op.apply(app, v), bb,
                         lambda r: su.apply(up, sl.apply(lp, r)),
                         tol=1e-5, maxiter=8000)
    t = timed_chain(solve, params, b)
    r = jax.jit(solve)(params, b)
    print(f"IC-PCG s=2 {tag} {t*1e3:8.1f} ms ({int(r.iterations)} it)  "
          f"rel res={float(r.residual_norm)/bn:.2e}  vs CG {t_cg/t:4.2f}x",
          flush=True)

# AMG-PCG, f32 vs bf16 hierarchy
from sparse_matrix_tpu.solvers.amg import amg_coarsen, amg_setup

t0 = time.time()
coars = amg_coarsen(a, coarse_size=400)
print(f"amg coarsen {time.time()-t0:.1f}s", flush=True)
for tag, vdt in (("f32 ", None), ("bf16", jnp.bfloat16)):
    t0 = time.time()
    h = amg_setup(a, coarsening=coars, values_dtype=vdt)
    print(f"  amg plan {tag} {time.time()-t0:.1f}s "
          f"lvl0 fmt={h.levels[0].a_op.format}", flush=True)
    aop = h.outer_a_op if h.outer_a_op is not None else h.levels[0].a_op
    aparams = aop.as_pytree()
    hp = h.as_pytree()

    def solve(pp, bb):
        app, hpp = pp
        return pcg_solve(lambda v: aop.apply(app, v), bb,
                         lambda r: h.vcycle_p(hpp, r),
                         tol=1e-5, maxiter=200)
    t = timed_chain(solve, (aparams, hp), b)
    r = jax.jit(solve)((aparams, hp), b)
    print(f"AMG-PCG {tag}  {t*1e3:8.1f} ms ({int(r.iterations)} it)  "
          f"rel res={float(r.residual_norm)/bn:.2e}  vs CG {t_cg/t:4.2f}x",
          flush=True)
print("DONE", flush=True)
