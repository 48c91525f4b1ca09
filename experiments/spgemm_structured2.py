import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.bench.corpus import generate_corpus, iter_corpus
from sparse_matrix_tpu.ops.spgemm_host import spgemm_hash_host, flops_per_row
from sparse_matrix_tpu.ops.spgemm_block import BlockSpgemm
from sparse_matrix_tpu.bench.runner import bench_host

generate_corpus()
f0 = jax.jit(lambda s: s+1.0); _=float(f0(jnp.float32(0)))
def lat():
    ls=[]
    for _ in range(5):
        t0=time.perf_counter(); _=float(f0(jnp.float32(0))); ls.append(time.perf_counter()-t0)
    return min(ls)

for name, A in iter_corpus():
    if name not in ("blocked_2k.mtx", "poisson_160.mtx"):
        continue
    fl = int(flops_per_row(A, A).sum())
    r = bench_host(name, lambda: spgemm_hash_host(A, A, output_sorted=False), warmup=1, repeats=3)
    eng = BlockSpgemm(A, A)
    cb = eng.multiply_device(); jax.block_until_ready(cb)
    K = 50
    l0 = lat()
    best=1e9
    for _ in range(3):
        t0=time.perf_counter()
        acc = None
        for _k in range(K):
            cb = eng.multiply_device()
        _=float(jnp.sum(cb[0]))
        best=min(best, (time.perf_counter()-t0-l0)/K)
    print(f"{name}: prods={fl} pairs={eng.num_pairs} | native {r.millis:.2f}ms | block dev {best*1e3:.2f}ms | speedup {r.seconds/best:.1f}x", flush=True)
