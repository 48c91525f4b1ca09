import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.formats.lanepack import plan_lanepack
from sparse_matrix_tpu.ops.spmv import lanepack_device_arrays, _spmv_lanepack_jit, ell_from_csr, spmv_ell_xla

A = poisson_2d_csr(512)
rng = np.random.default_rng(0)
xj = jnp.asarray(rng.standard_normal(A.cols).astype(np.float32))
ev, ec = ell_from_csr(A)
y_ref = np.asarray(spmv_ell_xla(jnp.asarray(ev), jnp.asarray(ec), xj))
f0 = jax.jit(lambda s: s+1.0); _=float(f0(jnp.float32(0)))
def lat():
    ls=[]
    for _ in range(5):
        t0=time.perf_counter(); _=float(f0(jnp.float32(0))); ls.append(time.perf_counter()-t0)
    return min(ls)

for pk in ("per_rb", "dense"):
    for B in (32, 64):
        plan = plan_lanepack(A, kw=1, pack=pk)
        arrs = lanepack_device_arrays(plan, b=B)
        static = {k:v for k,v in arrs.items() if k!="b"}
        fn = lambda x: _spmv_lanepack_jit(static, x, rows=A.rows, cols=A.cols, kw=1, b=B, interpret=False, pack=plan.pack)
        y = np.asarray(fn(xj))
        err = np.abs(y-y_ref).max()
        iters=3000
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, iters, lambda i,v: fn(v)*0.2, x)
        _=float(jnp.sum(loop(xj)))
        l0=lat()
        runs=[]
        for _ in range(3):
            t0=time.perf_counter(); _=float(jnp.sum(loop(xj))); runs.append(time.perf_counter()-t0)
        l0=min(l0,lat())
        per=(min(runs)-l0)/iters
        print(f"{pk} B={B}: slabs={plan.num_slabs} err={err:.1e} {per*1e3:.4f} ms -> {A.nnz()/per/1e9:.1f} Gnnz/s", flush=True)
