"""Host-side AmgRefresh plan vs full amg_setup, CPU backend (round 5).

The VERDICT r4 #2 bar is plan <= 1x setup. The tunnel-side record
(amg_refresh_bench_r5b.out) carries the full numbers incl. device push;
this ablation isolates the HOST cost (plan build vs setup) with zero
tunnel involvement — the part the round-5 native planners attacked.
min-of-2, 1-core container.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
  experiments/amg_plan_cpu_r5.py > experiments/amg_plan_cpu_r5.out 2>&1
"""
import time

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def min_of(f, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = f()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main():
    from sparse_matrix_tpu.solvers import (
        AmgRefresh, amg_coarsen, amg_setup, poisson_2d_csr)

    for n in (1024, 2048):
        a = poisson_2d_csr(n, dtype=np.float32)
        t_setup, _ = min_of(lambda: amg_setup(a))
        print(f"poisson_{n}^2: full amg_setup {t_setup:.2f} s", flush=True)
        t_coars, coars = min_of(lambda: amg_coarsen(a))
        t_plan, ref = min_of(lambda: AmgRefresh(a))
        print(f"poisson_{n}^2: AmgRefresh plan {t_plan:.2f} s "
              f"({ref.num_levels} levels; coarsening alone {t_coars:.2f} s) "
              f"-> plan/setup = {t_plan/t_setup:.2f}x", flush=True)


if __name__ == "__main__":
    main()
