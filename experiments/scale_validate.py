"""Scale validation on real TPU: 1M-row operators through every major path."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import scipy.sparse as sp
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import poisson_2d_csr, cg_solve

print("backend:", jax.default_backend(), flush=True)

def lat(f0):
    ls=[]
    for _ in range(5):
        t0=time.perf_counter(); _=float(f0(jnp.float32(0))); ls.append(time.perf_counter()-t0)
    return min(ls)

def timeloop(op, xj, iters=1000):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i,v: op(v)*0.2, x)
    _=float(jnp.sum(loop(xj)))
    f0 = jax.jit(lambda s: s+1.0); _=float(f0(jnp.float32(0)))
    l0 = lat(f0)
    runs=[]
    for _ in range(3):
        t0=time.perf_counter(); _=float(jnp.sum(loop(xj))); runs.append(time.perf_counter()-t0)
    l0=min(l0, lat(f0))
    return max((min(runs)-l0)/iters, min(runs)/iters/100)

# 1) Poisson 1024^2
import os
SKIP1 = os.environ.get("SKIP1")
t0=time.time()
A = poisson_2d_csr(8 if SKIP1 else 1024, dtype=np.float32)
op = SpmvOperator(A)
print(f"poisson1024: rows={A.rows} nnz={A.nnz()} format={op.format} plan {time.time()-t0:.0f}s", flush=True)
rng = np.random.default_rng(0)
xj = jnp.asarray(rng.standard_normal(A.rows).astype(np.float32))
y = np.asarray(op(xj))
i0 = rng.integers(0, A.rows, 10)
for j in i0:
    lo, hi = int(A.offsets[j]), int(A.offsets[j+1])
    ref = float(A.vals[lo:hi].astype(np.float64) @ np.asarray(xj)[A.indices[lo:hi].astype(np.int64)])
    assert abs(float(y[j])-ref) < 1e-2, (j, y[j], ref)
per = timeloop(op, xj)
print(f"  dia spmv: {per*1e3:.4f} ms -> {A.nnz()/per/1e9:.0f} Gnnz/s", flush=True)
b = jnp.asarray(rng.standard_normal(A.rows).astype(np.float32))
solve = jax.jit(lambda bb: cg_solve(op, bb, tol=1e-5, maxiter=4000))
res = solve(b); jax.block_until_ready(res.x)
t0=time.perf_counter(); res = solve(b); it=int(res.iterations); dt=time.perf_counter()-t0
print(f"  CG 1024^2: iters={it} residual={float(res.residual_norm):.2e} wall={dt*1e3:.0f} ms", flush=True)

# 2) unstructured 200K rows, ~6M nnz: LanePack at scale
n = 200_000
nnzb = 6_000_000
rr = rng.integers(0, n, nnzb)
cc = rng.integers(0, n, nnzb)
vv = rng.standard_normal(nnzb).astype(np.float32)
B = CsrMatrix.from_coo(n, n, rr, cc, vv)
t0=time.time()
opb = SpmvOperator(B)
print(f"uniform200k: nnz={B.nnz()} format={opb.format} plan {time.time()-t0:.0f}s bytes/nnz={opb.bytes_per_apply()/B.nnz():.1f}", flush=True)
xb = jnp.asarray(rng.standard_normal(n).astype(np.float32))
yb = np.asarray(opb(xb))
for j in rng.integers(0, n, 10):
    lo, hi = int(B.offsets[j]), int(B.offsets[j+1])
    ref = float(B.vals[lo:hi].astype(np.float64) @ np.asarray(xb)[B.indices[lo:hi].astype(np.int64)])
    assert abs(float(yb[j])-ref) < 1e-2 + 1e-3*abs(ref), (j, yb[j], ref)
per = timeloop(opb, xb, iters=300)
print(f"  lanepack spmv: {per*1e3:.4f} ms -> {B.nnz()/per/1e9:.1f} Gnnz/s", flush=True)
print("DONE", flush=True)
