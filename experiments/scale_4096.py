"""Poisson 2048^2 (4.2M rows) on one v5e: CG and AMG-PCG with the DIA
operator data passed as a jit ARGUMENT — at this size the operator is
~84 MB, and closure-captured constants exceed the remote-compile tunnel's
payload limit (HTTP 413). Argument-passing is the correct pattern for
large operators anyway (no giant constants in the program)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.formats.dia import try_dia_from_csr
from sparse_matrix_tpu.ops.spmv_dia import _dia_pallas_blocked_data, _spmv_dia_pallas
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import cg_solve

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

print("backend:", jax.default_backend(), flush=True)
n = 4096
a = poisson_2d_csr(n, dtype=np.float32)
dia = try_dia_from_csr(a)
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal(a.rows).astype(np.float32))
data = jnp.asarray(dia.data)
offs, rows, cols = dia.offsets, dia.rows, dia.cols
print(f"poisson {n}^2: {a.rows} rows, {a.nnz()} nnz, dia data {data.nbytes/1e6:.0f} MB", flush=True)

dpad = jax.block_until_ready(_dia_pallas_blocked_data(data, rows=rows))

@jax.jit
def solve_cg(dd, bb):
    mv = lambda v: _spmv_dia_pallas(dd, v, offsets=offs, rows=rows, interpret=False)
    return cg_solve(mv, bb, tol=1e-5, maxiter=10000)

res = solve_cg(dpad, b); jax.block_until_ready(res.x)
lat = probe_latency(); ts = []
for _ in range(4):
    t0 = time.perf_counter(); res = solve_cg(dpad, b); _ = float(res.residual_norm)
    ts.append(time.perf_counter() - t0)
t = max(0.0, min(ts) - lat)
print(f"CG: {t*1e3:.1f} ms ({int(res.iterations)} iters)", flush=True)
# independent residual via host SpMV on a sample of rows
x = np.asarray(res.x).astype(np.float64)
rid = a.row_ids(); ax = np.zeros(a.rows)
np.add.at(ax, rid, a.vals.astype(np.float64) * x[a.indices.astype(np.int64)])
print(f"indep |r|/|b| = {np.linalg.norm(ax - np.asarray(b))/np.linalg.norm(np.asarray(b)):.2e}", flush=True)
