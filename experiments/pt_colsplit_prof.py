"""Profile the fine-level restriction operator planning at 2048^2:
Pt is 699392 x 4194304 (10.5M nnz) -> colsplit into two aligned shards.

Usage: python experiments/pt_colsplit_prof.py
"""
import cProfile, pstats, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.amg import amg_coarsen
from sparse_matrix_tpu.ops.operator import SpmvOperator

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
a = poisson_2d_csr(n, dtype=np.float32)
t0 = time.perf_counter()
levels, coarse = amg_coarsen(a)
print(f"coarsen {time.perf_counter()-t0:.2f}s", flush=True)
p0 = levels[0][1]
t0 = time.perf_counter()
pt0 = p0.transpose()
print(f"transpose {time.perf_counter()-t0:.2f}s  Pt {pt0.rows}x{pt0.cols} nnz={pt0.nnz()}", flush=True)

pr = cProfile.Profile()
pr.enable()
t0 = time.perf_counter()
op = SpmvOperator(pt0)
dt = time.perf_counter() - t0
pr.disable()
print(f"SpmvOperator(Pt) {dt:.2f}s format={op.format}", flush=True)
pstats.Stats(pr).sort_stats("tottime").print_stats(22)
