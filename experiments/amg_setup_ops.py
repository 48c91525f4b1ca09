"""Log every SpmvOperator planned during amg_setup(2048^2): shape, nnz,
chosen format, wall time — plus per-phase amg_coarsen timing.

Usage: python experiments/amg_setup_ops.py [n]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers import amg as amg_mod
from sparse_matrix_tpu.ops import operator as op_mod

orig_init = op_mod.SpmvOperator.__init__
depth = [0]

def timed_init(self, m, **kw):
    t0 = time.perf_counter()
    depth[0] += 1
    try:
        orig_init(self, m, **kw)
    finally:
        depth[0] -= 1
    dt = time.perf_counter() - t0
    if depth[0] == 0:
        print(f"  op {m.rows}x{m.cols} nnz={m.nnz()} -> {self.format:10s} {dt:6.2f}s", flush=True)

op_mod.SpmvOperator.__init__ = timed_init

import sparse_matrix_tpu.formats.aligned as al
orig_plan = al.plan_aligned
def timed_plan(m, **kw):
    t0 = time.perf_counter()
    r = orig_plan(m, **kw)
    print(f"    plan_aligned {m.rows}x{m.cols} nnz={m.nnz()} {time.perf_counter()-t0:6.2f}s fill={r.fill:.2f}", flush=True)
    return r
al.plan_aligned = timed_plan

from sparse_matrix_tpu.ops.spgemm_block import spgemm_auto as orig_sp
import sparse_matrix_tpu.ops.spgemm_block as spb
def timed_sp(a, b, **kw):
    t0 = time.perf_counter()
    r = orig_sp(a, b, **kw)
    print(f"    spgemm {a.rows}x{a.cols}({a.nnz()}) @ {b.rows}x{b.cols}({b.nnz()}) -> nnz={r.nnz()} {time.perf_counter()-t0:6.2f}s", flush=True)
    return r
spb.spgemm_auto = timed_sp
amg_mod.spgemm_auto = None  # amg imports it inside functions

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
a = poisson_2d_csr(n, dtype=np.float32)
print(f"n={n}^2 rows={a.rows} nnz={a.nnz()}", flush=True)

t0 = time.perf_counter()
levels, coarse = amg_mod.amg_coarsen(a)
t_coarsen = time.perf_counter() - t0
print(f"amg_coarsen {t_coarsen:.2f}s", flush=True)
for i, (cur_l, p, dinv, lam) in enumerate(levels):
    print(f"  level {i}: A {cur_l.rows} nnz={cur_l.nnz()}  P nnz={p.nnz()}", flush=True)

t0 = time.perf_counter()
h = amg_mod.amg_setup(a, coarsening=(levels, coarse))
print(f"operator planning {time.perf_counter()-t0:.2f}s  total {t_coarsen + time.perf_counter()-t0:.2f}s", flush=True)
