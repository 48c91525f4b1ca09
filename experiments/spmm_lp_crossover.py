"""Lanepack SpMM kernel vs per-column loop across operator sizes and K:
find the size-aware dispatch rule (the K-only rule measured on Poisson
512^2 inverted the block-AMG win — small operators favor the kernel)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.formats.lanepack import plan_lanepack
from sparse_matrix_tpu.ops.spmv import lanepack_device_arrays, spmv_lanepack, _interpret
from sparse_matrix_tpu.ops.spmm import _spmm_lanepack_jit, _pick_b_lp_spmm, pack_rhs
from sparse_matrix_tpu.solvers import poisson_2d_csr

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

def bench_chain(apply_fn, x0, ch=150, reps=5):
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
for n in (16, 40, 72, 128):
    mat = poisson_2d_csr(n, dtype=np.float32)
    plan = plan_lanepack(mat)
    arrs_v = lanepack_device_arrays(plan)
    x = jnp.asarray(rng.standard_normal(mat.cols).astype(np.float32))
    t1 = bench_chain(lambda v: spmv_lanepack(plan, v, device_arrays=arrs_v), x)
    print(f"n={n*n:6d} slabs={plan.num_slabs:5d}: SpMV {t1*1e6:7.1f} us", flush=True)
    for K in (4, 8):
        X = rng.standard_normal((mat.cols, K)).astype(np.float32)
        x3 = pack_rhs(X, mat.cols, guard=plan.kw)
        b = _pick_b_lp_spmm(K, plan.kw)
        arrs = lanepack_device_arrays(plan, b=b)
        st = {kk: v for kk, v in arrs.items() if kk != "b"}
        def ker(v3, st=st, K=K, b=b):
            y3 = _spmm_lanepack_jit(st, v3, rows=plan.rows, kw=plan.kw, b=b,
                                    k=K, nbuf=2, interpret=_interpret(), pack=plan.pack)
            guard = jnp.zeros((v3.shape[0] - y3.shape[0], K, 128), y3.dtype)
            return jnp.concatenate([y3, guard], axis=0)
        tk = bench_chain(ker, x3)
        def loop(v, K=K):
            return jnp.stack([spmv_lanepack(plan, v[:, k2], device_arrays=arrs_v)
                              for k2 in range(K)], axis=1)
        tl = bench_chain(loop, jnp.asarray(X))
        win = "kernel" if tk < tl else "loop"
        print(f"   K={K}: kernel {tk*1e6:8.1f} us | loop {tl*1e6:8.1f} us -> {win}", flush=True)
