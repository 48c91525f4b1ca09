"""End-to-end amg_setup wall time at 2048^2 and 4096^2 (VERDICT r2 item 2:
<=5 s and <=70 s). Clean timing, no instrumentation.

Usage: python experiments/amg_setup_scale_r3b.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.amg import amg_setup

for n in (2048, 2048, 4096):
    a = poisson_2d_csr(n, dtype=np.float32)
    t0 = time.perf_counter()
    h = amg_setup(a)
    print(f"{n} setup {time.perf_counter()-t0:.1f}s", flush=True)
    print(h, flush=True)
