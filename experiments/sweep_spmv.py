import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.formats.lanepack import plan_lanepack
from sparse_matrix_tpu.ops.spmv import lanepack_device_arrays, _spmv_lanepack_jit

A = poisson_2d_csr(512)
nnz = A.nnz()
rng = np.random.default_rng(0)
xj = jnp.asarray(rng.standard_normal(A.cols).astype(np.float32))
f0 = jax.jit(lambda s: s + 1.0); _=float(f0(jnp.float32(0)))

def lat():
    ls=[]
    for _ in range(5):
        t0=time.perf_counter(); _=float(f0(jnp.float32(0))); ls.append(time.perf_counter()-t0)
    return min(ls)

def measure(kw, b, iters=3000):
    plan = plan_lanepack(A, kw=kw)
    arrs = lanepack_device_arrays(plan, b=b)
    static = {k:v for k,v in arrs.items() if k!="b"}
    fn = lambda x: _spmv_lanepack_jit(static, x, rows=A.rows, cols=A.cols, kw=plan.kw, b=b, interpret=False)
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i,v: fn(v)*0.2, x)
    t0=time.perf_counter(); _=float(jnp.sum(loop(xj))); comp=time.perf_counter()-t0
    l0 = lat()
    runs=[]
    for _ in range(4):
        t0=time.perf_counter(); _=float(jnp.sum(loop(xj))); runs.append(time.perf_counter()-t0)
    l0 = min(l0, lat())
    per = (min(runs)-l0)/iters
    print(f"kw={kw} b={b}: slabs={plan.num_slabs} fill={plan.fill:.3f} compile={comp:.0f}s "
          f"{per*1e3:.4f} ms -> {nnz/per/1e9:.1f} Gnnz/s ({plan.slot_bytes()/per/1e9:.0f} GB/s)", flush=True)

for kw, b in [(1,32),(1,64),(2,32),(2,64),(4,32)]:
    measure(kw, b)
