import sys, os; sys.path.insert(0, "/root/repo")
import sys, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.formats.lanepack import plan_lanepack, SUBLANES, LANES
from sparse_matrix_tpu.ops.spmv import lanepack_device_arrays, _lane_cumsum

B = int(sys.argv[1])
variants = sys.argv[2:]
A = poisson_2d_csr(512)
plan = plan_lanepack(A, kw=1)
arrs = lanepack_device_arrays(plan, b=B)
r128, c128 = plan.r128, plan.c128
Sp = arrs["vals"].shape[0]
rng = np.random.default_rng(0)
xj = jnp.asarray(rng.standard_normal(A.cols).astype(np.float32))
f0 = jax.jit(lambda s: s+1.0); _=float(f0(jnp.float32(0)))

def make_kernel(variant):
    def kernel(row_blk_ref, col_off_ref, x_ref, vals_ref, lane_ref, ends_ref, starts_ref, y_ref):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)
        base = i*B*SUBLANES
        if variant == "noslice":
            xw = jnp.broadcast_to(x_ref[0:1,:], (B*SUBLANES, LANES))
        else:
            xw = jnp.concatenate([x_ref[pl.ds(col_off_ref[base+j],1),:] for j in range(B*SUBLANES)], axis=0)
        lane = lane_ref[...].reshape(B*SUBLANES, LANES).astype(jnp.int32)
        v = vals_ref[...].reshape(B*SUBLANES, LANES)
        p = v*jnp.take_along_axis(xw, lane, axis=1)
        if variant == "nocumsum":
            c = p
        elif variant == "mxu":
            rowi = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            coli = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            U = jnp.where(rowi <= coli, 1.0, 0.0).astype(jnp.float32)
            c = jnp.dot(p, U, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        else:
            c = _lane_cumsum(p)
        ends = ends_ref[...].reshape(B*SUBLANES, LANES).astype(jnp.int32)
        starts = starts_ref[...].reshape(B*SUBLANES, LANES).astype(jnp.int32)
        gE = jnp.take_along_axis(c, ends, axis=1)
        gS = jnp.where(starts<0, 0.0, jnp.take_along_axis(c, jnp.maximum(starts,0), axis=1))
        contrib = gE - gS
        for bb in range(B):
            part = jnp.sum(contrib[bb*SUBLANES:(bb+1)*SUBLANES], axis=0, keepdims=True)
            y_ref[pl.ds(row_blk_ref[i*B+bb],1), :] += part
    return kernel

def build(variant):
    @jax.jit
    def spmv(x):
        xpad = jnp.zeros((c128+1)*LANES, x.dtype).at[:x.shape[0]].set(x)
        x2d = xpad.reshape(c128+1, LANES)
        gs = pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=2, grid=(Sp//B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [pl.BlockSpec((B,SUBLANES,LANES), lambda i,*r:(i,0,0))]*4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        y = pl.pallas_call(make_kernel(variant), grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((r128, LANES), jnp.float32))(
            arrs["row_blk"], arrs["col_off"], x2d, arrs["vals"], arrs["lane"], arrs["ends"], arrs["starts"])
        return y.reshape(-1)[:A.rows]
    return spmv

def timeloop(fn, iters=1000):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i,x: fn(x)*0.2, x)
    _=float(jnp.sum(loop(xj)))
    ls=[]
    for _ in range(3):
        t0=time.perf_counter(); _=float(jnp.sum(loop(xj))); ls.append(time.perf_counter()-t0)
    t0=time.perf_counter(); _=float(f0(jnp.float32(0))); LAT=time.perf_counter()-t0
    return (min(ls)-LAT)/iters

for variant in variants:
    per = timeloop(build(variant))
    print(f"B={B} {variant}: {per*1e3:.4f} ms -> {A.nnz()/per/1e9:.1f} Gnnz/s", flush=True)
