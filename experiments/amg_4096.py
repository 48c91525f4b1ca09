"""Poisson 2048^2 (4.2M rows) AMG-PCG on one v5e with the hierarchy
passed as jit ARGUMENTS (as_pytree/vcycle_p — closure constants would
exceed the remote-compile payload limit)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.solvers import amg_setup, poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import pcg_solve

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

print("backend:", jax.default_backend(), flush=True)
n = 4096
a = poisson_2d_csr(n, dtype=np.float32)
t0 = time.time()
hier = amg_setup(a, coarse_size=400, dtype=np.float32)
setup = time.time() - t0
print(f"setup {setup:.1f}s: {hier!r}", flush=True)
params = hier.as_pytree()
op = hier.levels[0].a_op
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))

@jax.jit
def solve(pp, bb):
    return pcg_solve(
        lambda v: op.apply(pp["levels"][0]["a"], v), bb,
        lambda rr: hier.vcycle_p(pp, rr), tol=1e-5, maxiter=100,
    )

res = solve(params, b); jax.block_until_ready(res.x)
lat = probe_latency(); ts = []
for _ in range(5):
    t0 = time.perf_counter(); res = solve(params, b); _ = float(res.residual_norm)
    ts.append(time.perf_counter() - t0)
t = max(0.0, min(ts) - lat)
print(f"AMG-PCG: {t*1e3:.1f} ms ({int(res.iterations)} iters)", flush=True)
x = np.asarray(res.x).astype(np.float64)
rid = a.row_ids(); ax = np.zeros(a.rows)
np.add.at(ax, rid, a.vals.astype(np.float64) * x[a.indices.astype(np.int64)])
print(f"indep |r|/|b| = {np.linalg.norm(ax - np.asarray(b))/np.linalg.norm(np.asarray(b)):.2e}", flush=True)
