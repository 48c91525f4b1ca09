"""Step-size (b) sweep for the lanepack SpMM kernel at small K
(calls _spmm_lanepack_jit directly; the public wrapper pins b)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.formats.lanepack import plan_lanepack
from sparse_matrix_tpu.ops.spmv import lanepack_device_arrays, spmv_lanepack, _interpret
from sparse_matrix_tpu.ops.spmm import _spmm_lanepack_jit, pack_rhs
from sparse_matrix_tpu.solvers import poisson_2d_csr

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

def bench_chain(apply_fn, x0, ch=150, reps=6):
    @jax.jit
    def chain(x):
        def body(_, v): return apply_fn(v) * 1e-3
        return jax.lax.fori_loop(0, ch, body, x)
    out = chain(x0); jax.block_until_ready(out)
    lat = probe_latency(); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = chain(x0); _ = float(jnp.ravel(out)[0])
        ts.append(time.perf_counter() - t0)
    return max(0.0, min(ts) - lat) / ch

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
mat = poisson_2d_csr(512, dtype=np.float32)
plan = plan_lanepack(mat)
nnz = mat.nnz()
r128 = -(-plan.rows // 128)
x = jnp.asarray(rng.standard_normal(mat.cols).astype(np.float32))
t1 = bench_chain(lambda v: spmv_lanepack(plan, v), x)
print(f"single SpMV {t1*1e6:6.1f} us ({nnz/t1/1e9:.1f} Gnnz/s)", flush=True)
for K in (2, 4, 8):
    X = rng.standard_normal((mat.cols, K)).astype(np.float32)
    x3 = pack_rhs(X, mat.cols, guard=plan.kw)
    for b in (8, 16, 32, 64):
        try:
            arrs = lanepack_device_arrays(plan, b=b)
            arrs = {kk: v for kk, v in arrs.items() if kk != "b"}
            def ap(v3, arrs=arrs, K=K, b=b):
                y3 = _spmm_lanepack_jit(
                    arrs, v3, rows=plan.rows, kw=plan.kw, b=b, k=K,
                    nbuf=2, interpret=_interpret(), pack=plan.pack)
                guard = jnp.zeros((v3.shape[0] - y3.shape[0], K, 128), y3.dtype)
                return jnp.concatenate([y3, guard], axis=0)
            t = bench_chain(ap, x3)
            print(f"K={K} b={b:2d}: {t*1e6:8.1f} us -> {nnz*K/t/1e9:6.1f} Gnnz*K/s ({t1*K/t:4.1f}x)", flush=True)
        except Exception as e:
            print(f"K={K} b={b}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
