"""VERDICT r3 #6: polynomial (Chebyshev) preconditioning at scale.

IC-PCG dies at 2048^2 (trisolve sweep traffic); AMG wins at >=2048^2 but
costs a multi-second setup. The middle: Chebyshev poly-PCG — the apply is
`degree` SpMVs and nothing else (dot-free, bandwidth-matched), and the
inner SpMVs can run on the bf16-value DIA stream (measured 2.3x the f32
stream at 2048^2). Cost math going in: poly-PCG total matvecs ~= CG's
(effective sqrt(kappa)/d iterations x (d+1) matvecs each), so the
headroom is (a) the bf16 inner stream discount and (b) fewer global
reductions; this experiment measures whether that materializes as a wall
win at 2048^2/4096^2 vs plain CG, with the AMG-PCG row for context.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/cheb_pcg.py > experiments/cheb_pcg.out 2>&1 &
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import cg_solve, pcg_solve
from sparse_matrix_tpu.solvers.block_jacobi import chebyshev_preconditioner


def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0)))
        ls.append(time.perf_counter() - t0)
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
        t0 = time.perf_counter(); _ = float(chain(params, b0))
        ts.append(time.perf_counter() - t0)
    return max(0.0, min(ts) - lat) / R


print("backend:", jax.default_backend(), flush=True)
for n in (2048, 4096):
    try:
        a = poisson_2d_csr(n, dtype=np.float32)
    except Exception as e:
        print(f"poisson {n}^2 build failed: {e!r}", flush=True)
        continue
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))
    op = SpmvOperator(a, force="dia", dtype=np.float32)
    ap = op.as_pytree()
    R = 3 if n <= 2048 else 2
    print(f"poisson {n}^2 ({a.rows} rows): fmt={op.format}", flush=True)

    # 2D Poisson spectral bounds are analytic; use them for every variant
    # so the comparison isolates the preconditioner, not the estimator
    import math
    lam_min = 8.0 * math.sin(math.pi / (2 * (n + 1))) ** 2
    lam_max = 8.0 * math.cos(math.pi / (2 * (n + 1))) ** 2

    t_cg = timed_chain(lambda pp, bb: cg_solve(lambda v: op.apply(pp, v), bb,
                                               tol=1e-5, maxiter=20000), ap, b, R=R)
    r_cg = jax.jit(lambda pp, bb: cg_solve(lambda v: op.apply(pp, v), bb,
                                           tol=1e-5, maxiter=20000))(ap, b)
    print(f"  CG              {t_cg*1e3:9.1f} ms ({int(r_cg.iterations)} it)",
          flush=True)

    variants = [("f32", None)]
    try:
        op_b = SpmvOperator(a, force="dia", values_dtype=jnp.bfloat16)
        bp = op_b.as_pytree()
        variants.append(("bf16", (op_b, bp)))
    except Exception as e:
        print(f"  bf16 operator failed: {e!r}", flush=True)

    for tag, inner in variants:
        for degree in (4, 8, 16):
            if inner is None:
                mv_in, pp_in = op, ap
            else:
                mv_in, pp_in = inner
            params = (ap, pp_in)

            def solve(pp, bb, _deg=degree, _mv=mv_in):
                app, ipp = pp
                prec = chebyshev_preconditioner(
                    lambda v: _mv.apply(ipp, v),
                    lam_bounds=(lam_min, lam_max), degree=_deg)
                return pcg_solve(lambda v: op.apply(app, v), bb, prec,
                                 tol=1e-5, maxiter=4000)
            try:
                t = timed_chain(solve, params, b, R=R)
                r = jax.jit(solve)(params, b)
                mvs = int(r.iterations) * (degree + 1)
                print(f"  cheb-PCG {tag} d={degree:2d}: {t*1e3:9.1f} ms "
                      f"({int(r.iterations)} it, ~{mvs} mv) vs CG "
                      f"{t_cg/t:4.2f}x", flush=True)
            except Exception as e:
                print(f"  cheb-PCG {tag} d={degree} failed: {e!r}", flush=True)

    # AMG context row (setup amortization reported separately)
    try:
        from sparse_matrix_tpu.solvers.amg import amg_setup, amg_pcg_solve
        t0 = time.time()
        hier = amg_setup(a)
        setup = time.time() - t0
        t0 = time.time()
        res = amg_pcg_solve(a, np.asarray(b), tol=1e-5, hierarchy=hier)
        solve_t = time.time() - t0
        print(f"  AMG-PCG: setup {setup:.1f}s, solve {solve_t*1e3:.1f} ms "
              f"({int(res.iterations)} it) [one-shot wall, not chained]",
              flush=True)
    except Exception as e:
        print(f"  AMG row failed: {e!r}", flush=True)
