"""Direct throughput of the general-path (lanepack) multi-RHS SpMM kernel
vs repeated single SpMV, Poisson 512^2 + femlike corpus matrix.

Methodology = bench/runner.py: chained applies inside one jit, min over
repeats minus tunnel latency.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.formats.lanepack import plan_lanepack
from sparse_matrix_tpu.ops.spmv import lanepack_device_arrays, spmv_lanepack
from sparse_matrix_tpu.ops.spmm import spmm_lanepack_packed, pack_rhs, _pick_b_lp_spmm
from sparse_matrix_tpu.solvers import poisson_2d_csr
# (poisson only; femlike covered by corpus runner)

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
for name, mat in (("poisson 512^2", poisson_2d_csr(512, dtype=np.float32)),):
    plan = plan_lanepack(mat)
    nnz = mat.nnz()
    x = jnp.asarray(rng.standard_normal(mat.cols).astype(np.float32))
    t1 = bench_chain(lambda v: spmv_lanepack(plan, v), x)
    print(f"{name}: single lanepack SpMV {t1*1e6:7.1f} us -> {nnz/t1/1e9:5.1f} Gnnz/s", flush=True)
    for K in (2, 4, 8):
        arrs = lanepack_device_arrays(plan, b=_pick_b_lp_spmm(K, plan.kw))
        X = rng.standard_normal((mat.cols, K)).astype(np.float32)
        x3 = pack_rhs(X, mat.cols, guard=plan.kw)
        def ap(v3, arrs=arrs, K=K):
            y3 = spmm_lanepack_packed(plan, v3, device_arrays=arrs)
            guard = jnp.zeros((v3.shape[0] - y3.shape[0], K, 128), y3.dtype)
            return jnp.concatenate([y3, guard], axis=0)
        t = bench_chain(ap, x3)
        print(f"  K={K}: {t*1e6:8.1f} us/apply -> {nnz*K/t/1e9:6.1f} Gnnz*K/s ({t1*K/t:4.1f}x vs K SpMVs)", flush=True)
