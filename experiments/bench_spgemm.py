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
