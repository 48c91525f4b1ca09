import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.solvers import poisson_2d_csr, cg_solve_multi, cg_solve
from sparse_matrix_tpu.formats.aligned import plan_aligned
from sparse_matrix_tpu.ops.spmm import aligned_matvec_multi, pack_rhs
from sparse_matrix_tpu.ops.operator import SpmvOperator

m = poisson_2d_csr(512, dtype=np.float32)
plan = plan_aligned(m)
rng = np.random.default_rng(0)
k = 8
b = rng.standard_normal((m.rows, k)).astype(np.float32)
mv = aligned_matvec_multi(plan, k)
b3 = pack_rhs(b, m.cols)

# fixed 200 iterations, jitted end-to-end
solve = jax.jit(lambda bb: cg_solve_multi(mv, bb, tol=0.0, maxiter=200, rhs_axis=1))
t0 = time.perf_counter(); res = solve(b3); _ = float(res.residual_norm.max())
print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
for _ in range(2):
    t0 = time.perf_counter(); res = solve(b3); _ = float(res.residual_norm.max())
    print(f"jitted 200 iters: {(time.perf_counter()-t0)*1e3:.0f} ms -> {(time.perf_counter()-t0)/200*1e3:.3f} ms/iter", flush=True)

# non-jitted call (what the bench did)
t0 = time.perf_counter()
res = cg_solve_multi(mv, b3, tol=0.0, maxiter=200, rhs_axis=1)
_ = float(res.residual_norm.max())
print(f"eager call 200 iters: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

# single-RHS CG on the aligned operator for reference
op = SpmvOperator(m, force="aligned")
bv = jnp.asarray(b[:, 0])
solve1 = jax.jit(lambda bb: cg_solve(op, bb, tol=0.0, maxiter=200))
_ = float(solve1(bv).residual_norm)
t0 = time.perf_counter(); _ = float(solve1(bv).residual_norm)
print(f"single-RHS 200 iters: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
