import sys, os, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops.spgemm_host import spgemm_hash_host, flops_per_row
from sparse_matrix_tpu.ops.spgemm_block import BlockSpgemm
from sparse_matrix_tpu.bench.runner import bench_host
import scipy.sparse as sp

def make(n, d, seed):
    S = sp.random(n, n, density=d, format="csr", random_state=seed, dtype=np.float32)
    return CsrMatrix(n, n, S.data, S.indices.astype(np.uint32), S.indptr.astype(np.int64), is_sorted=True)

print("backend:", jax.default_backend())
for n, d in [(2048, 0.01), (4096, 0.005), (8192, 0.002)]:
    A = make(n, d, 1)
    flops = int(flops_per_row(A, A).sum())
    r = bench_host(f"native {n}", lambda: spgemm_hash_host(A, A, output_sorted=False), warmup=1, repeats=3)
    print(f"n={n} d={d} nnz={A.nnz()} products={flops}: native C++ {r.millis:.1f} ms ({flops/r.seconds/1e6:.0f} Mprod/s)", flush=True)
    t0 = time.perf_counter()
    eng = BlockSpgemm(A, A)
    t_plan = time.perf_counter()-t0
    t0 = time.perf_counter()
    cb = eng.multiply_device(); cb.block_until_ready()
    t_first = time.perf_counter()-t0
    # steady-state device-only timing (readback of one scalar to force)
    runs = []
    for _ in range(3):
        t0=time.perf_counter()
        cb = eng.multiply_device()
        _ = float(jnp.sum(cb[0]))
        runs.append(time.perf_counter()-t0)
    t_dev = min(runs)
    t0 = time.perf_counter()
    C1 = eng.multiply()
    t_full = time.perf_counter()-t0
    print(f"  block-MXU: plan {t_plan*1e3:.0f}ms, compile+first {t_first:.1f}s, device-only {t_dev*1e3:.1f}ms ({flops/t_dev/1e6:.0f} Mprod/s; pairs={eng.num_pairs}), full+to_csr {t_full*1e3:.0f}ms", flush=True)
    C0 = spgemm_hash_host(A, A, output_sorted=True)
    print(f"  max err: {np.abs(C1.to_dense()-C0.to_dense()).max():.2e}; nnz {C1.nnz()} vs {C0.nnz()}", flush=True)

# bf16 fast mode + CG end-to-end
print("\n-- bf16 fast-mode block SpGEMM --", flush=True)
for n, d in [(4096, 0.005)]:
    A = make(n, d, 1)
    flops = int(flops_per_row(A, A).sum())
    eng = BlockSpgemm(A, A, precision=jax.lax.Precision.DEFAULT)
    cb = eng.multiply_device(); cb.block_until_ready()
    runs=[]
    for _ in range(3):
        t0=time.perf_counter(); cb = eng.multiply_device(); _=float(jnp.sum(cb[0])); runs.append(time.perf_counter()-t0)
    t_dev=min(runs)
    C1 = eng.multiply()
    C0 = spgemm_hash_host(A, A, output_sorted=True)
    rel = np.abs(C1.to_dense()-C0.to_dense()).max()/max(1e-9, np.abs(C0.to_dense()).max())
    print(f"n={n}: bf16 device-only {t_dev*1e3:.1f}ms ({flops/t_dev/1e6:.0f} Mprod/s), rel err {rel:.1e}", flush=True)

print("\n-- CG end-to-end (DIA operator) --", flush=True)
import jax.numpy as jnp
from sparse_matrix_tpu.solvers import poisson_2d_csr, cg_solve
from sparse_matrix_tpu.ops.operator import SpmvOperator
A = poisson_2d_csr(512, dtype=np.float32)
op = SpmvOperator(A)
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal(A.rows).astype(np.float32))
solve = jax.jit(lambda bb: cg_solve(op, bb, tol=1e-5, maxiter=2000))
res = solve(b); jax.block_until_ready(res.x)
t0=time.perf_counter()
res = solve(b)
it = int(res.iterations); rn = float(res.residual_norm)
dt = time.perf_counter()-t0
print(f"CG poisson 512^2 ({op.format}): iters={it} residual={rn:.2e} wall={dt*1e3:.0f} ms", flush=True)
