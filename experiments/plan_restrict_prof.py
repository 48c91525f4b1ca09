"""cProfile plan_aligned on restriction-shaped matrices (the AMG setup
planning hotspot): level-1 Pt (78596x699392, 2.2M nnz) and a fine-level
colsplit shard shape (699392x2097152, 5.2M nnz).

Usage: python experiments/plan_restrict_prof.py
"""
import cProfile, pstats, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.amg import amg_coarsen
from sparse_matrix_tpu.formats.aligned import plan_aligned

a = poisson_2d_csr(1024, dtype=np.float32)  # 1/4 scale: same shapes, faster
t0 = time.perf_counter()
levels, coarse = amg_coarsen(a)
print(f"coarsen(1024^2) {time.perf_counter()-t0:.2f}s", flush=True)

# level-1 restriction: the observed 3.13 s planning case at 2048^2 scale
p1 = levels[1][1]
pt1 = p1.transpose()
print(f"Pt1: {pt1.rows}x{pt1.cols} nnz={pt1.nnz()}", flush=True)

pr = cProfile.Profile()
pr.enable()
plan = plan_aligned(pt1)
pr.disable()
print(f"fill={plan.fill:.2f} slabs={plan.num_slabs} spill={plan.spill.nnz if plan.spill else 0}")
pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
