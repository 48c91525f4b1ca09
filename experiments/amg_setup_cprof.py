"""cProfile of AMG setup (coarsen + plan) at n^2 — finds host hotspots the
phase timers miss. Usage: python experiments/amg_setup_cprof.py [n]
"""
import sys, cProfile, pstats, io, time
sys.path.insert(0, "/root/repo")
import os
import numpy as np
import jax
if os.environ.get("SPMX_PROF_CPU"):
    jax.config.update("jax_platforms", "cpu")

import sparse_matrix_tpu.solvers.amg as amg
from sparse_matrix_tpu.solvers import poisson_2d_csr

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
a = poisson_2d_csr(n, dtype=np.float32)
print(f"backend={jax.default_backend()} n={n}^2 rows={a.rows} nnz={a.nnz()}", flush=True)

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
hier = amg.amg_setup(a, dtype=np.float32)
pr.disable()
print(f"setup total {time.time()-t0:.1f}s", flush=True)
print(hier)

s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(45)
print(s.getvalue())
pr.dump_stats("/tmp/amg_prof.pstats")
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
ps.print_stats(35)
print(s.getvalue())
