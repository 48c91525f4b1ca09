"""SPA vs hash SpGEMM on the AMG product shapes and the corpus classes.

Usage: python experiments/spa_spgemm.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import sparse_matrix_tpu.native.loader as L
from sparse_matrix_tpu.native import spgemm_hash_native
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.amg import amg_coarsen
from sparse_matrix_tpu.ops.spgemm_host import flops_per_row
from sparse_matrix_tpu.formats.csr import CsrMatrix

def run(a, b, name, sort=True):
    fl = int(flops_per_row(a, b).sum())
    t0 = time.perf_counter()
    c1 = spgemm_hash_native(a, b, output_sorted=sort)
    t_spa = time.perf_counter() - t0
    saved = L._SPA_COLS_LIMIT
    L._SPA_COLS_LIMIT = 0
    try:
        t0 = time.perf_counter()
        c2 = spgemm_hash_native(a, b, output_sorted=sort)
        t_hash = time.perf_counter() - t0
    finally:
        L._SPA_COLS_LIMIT = saved
    ok = (
        np.array_equal(c1.offsets, c2.offsets)
        and (np.array_equal(c1.indices, c2.indices) if sort else True)
        and (np.allclose(np.sort(c1.vals), np.sort(c2.vals)) if not sort else np.allclose(c1.vals, c2.vals))
    )
    print(f"{name:34s} {fl/1e6:8.1f}Mprod  spa {t_spa:6.3f}s ({fl/t_spa/1e6:6.1f}M/s)  "
          f"hash {t_hash:6.3f}s ({fl/t_hash/1e6:6.1f}M/s)  x{t_hash/max(t_spa,1e-9):4.2f} "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)

a = poisson_2d_csr(2048, dtype=np.float32)
levels, _ = amg_coarsen(a)
a0, p0 = levels[0][0], levels[0][1]
run(a0, p0, "A@P fine 2048^2", sort=False)
ap = spgemm_hash_native(a0, p0, output_sorted=False)
run(p0.transpose(), ap, "Pt@(AP) fine", sort=True)

rng = np.random.default_rng(0)
for n, dens in ((2048, 0.01), (4096, 0.005)):
    nnz = int(n * n * dens)
    r = rng.integers(0, n, nnz); c = rng.integers(0, n, nnz)
    m = CsrMatrix.from_coo(n, n, r, c, rng.standard_normal(nnz))
    run(m, m, f"uniform {n} {dens*100:.1f}%", sort=True)

# powerlaw
n = 2048
deg = np.minimum((rng.pareto(1.2, n) + 1).astype(np.int64) * 4, 500)
r = np.repeat(np.arange(n), deg); c = rng.integers(0, n, len(r))
m = CsrMatrix.from_coo(n, n, r, c, rng.standard_normal(len(r)))
run(m, m, "powerlaw 2k", sort=True)
