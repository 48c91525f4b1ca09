"""Parity + speed check of the native lanepack planner vs the numpy path.

Usage: python experiments/lanepack_native_check.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.amg import amg_coarsen
from sparse_matrix_tpu.formats import lanepack as lp

def compare(m, name, kw=None):
    t0 = time.perf_counter()
    a = lp.plan_lanepack(m, kw=kw)
    t_nat = time.perf_counter() - t0
    import sparse_matrix_tpu.native.loader as L
    saved, savedT = L._LIB, L._TRIED
    L._LIB, L._TRIED = None, True
    try:
        t0 = time.perf_counter()
        b = lp.plan_lanepack(m, kw=kw)
        t_np = time.perf_counter() - t0
    finally:
        L._LIB, L._TRIED = saved, savedT
    same = True
    for f in ("vals", "lane", "ends", "starts", "rb_a", "rb_b", "split",
              "chunk_rb", "col_off", "rb_mask"):
        xa, xb = getattr(a, f), getattr(b, f)
        if xa.shape != xb.shape or not np.array_equal(xa, xb):
            same = False
            d = (np.asarray(xa) != np.asarray(xb)).sum() if xa.shape == xb.shape else -1
            print(f"  MISMATCH {f}: shapes {xa.shape} vs {xb.shape}, ndiff={d}")
    assert a.kw == b.kw and a.pack == b.pack, (a.kw, b.kw, a.pack, b.pack)
    print(f"{name:30s} nnz={m.nnz():9d} kw={a.kw} pack={a.pack} "
          f"native {t_nat:6.3f}s numpy {t_np:6.3f}s x{t_np/max(t_nat,1e-9):5.1f} "
          f"{'OK' if same else 'FAIL'}", flush=True)
    return same

ok = True
a = poisson_2d_csr(512, dtype=np.float32)
ok &= compare(a, "poisson 512^2")

rng = np.random.default_rng(0)
from sparse_matrix_tpu.formats.csr import CsrMatrix
# random local
n, deg = 100_000, 9
r = np.repeat(np.arange(n), deg)
c = (r + rng.integers(-4000, 4000, len(r))) % n
order = np.lexsort((c, r))
r, c = r[order], c[order]
keep = np.r_[True, (r[1:] != r[:-1]) | (c[1:] != c[:-1])]
r, c = r[keep], c[keep]
offs = np.zeros(n + 1, np.int64); offs[1:] = np.bincount(r, minlength=n); np.cumsum(offs, out=offs)
m = CsrMatrix(n, n, rng.standard_normal(len(c)).astype(np.float32), c.astype(np.uint32), offs, is_sorted=True)
ok &= compare(m, "randlocal 100k")

# restriction shapes from a real coarsening
b = poisson_2d_csr(1024, dtype=np.float32)
levels, _ = amg_coarsen(b)
p0 = levels[0][1]
pt0 = p0.transpose()
ok &= compare(pt0, f"Pt0 {pt0.rows}x{pt0.cols}")
ok &= compare(p0, f"P0 {p0.rows}x{p0.cols}")
# f64 vals -> f32 plan and f64 plan
m64 = CsrMatrix(m.rows, m.cols, m.vals.astype(np.float64), m.indices, m.offsets, is_sorted=True)
ok &= compare(m64, "randlocal f64 vals")
print("ALL OK" if ok else "FAILURES")
