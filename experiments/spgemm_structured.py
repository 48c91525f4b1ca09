import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.bench.corpus import generate_corpus, iter_corpus
from sparse_matrix_tpu.ops.spgemm_host import spgemm_hash_host, flops_per_row
from sparse_matrix_tpu.ops.spgemm_block import BlockSpgemm
from sparse_matrix_tpu.bench.runner import bench_host

generate_corpus()
for name, A in iter_corpus():
    if name not in ("blocked_2k.mtx", "poisson_160.mtx", "poisson_64.mtx"):
        continue
    A32 = A
    fl = int(flops_per_row(A, A).sum())
    r = bench_host(name, lambda: spgemm_hash_host(A32, A32, output_sorted=False), warmup=1, repeats=3)
    t0 = time.perf_counter()
    eng = BlockSpgemm(A32, A32)
    t_plan = time.perf_counter()-t0
    cb = eng.multiply_device(); jax.block_until_ready(cb)
    runs=[]
    for _ in range(3):
        t0=time.perf_counter(); cb = eng.multiply_device(); _=float(jnp.sum(cb[0])); runs.append(time.perf_counter()-t0)
    t_dev = min(runs)
    t0=time.perf_counter(); C1 = eng.multiply(); t_full = time.perf_counter()-t0
    C0 = spgemm_hash_host(A32, A32, output_sorted=True)
    err = np.abs(C1.to_dense()-C0.to_dense()).max()
    print(f"{name}: nnz={A.nnz()} prods={fl} pairs={eng.num_pairs} | native {r.millis:.1f}ms | "
          f"block dev {t_dev*1e3:.1f}ms (plan {t_plan*1e3:.0f}ms, full {t_full*1e3:.0f}ms) | "
          f"speedup dev {r.seconds/t_dev:.1f}x full {r.seconds/t_full:.1f}x | err {err:.1e}", flush=True)
