"""Phase-profiled AMG setup (VERDICT r2 item 2: <=5 s @2048^2, <=70 s
@4096^2). Wraps the coarsening/planning phases with wall timers to find
what remains after the round-3 native sweeps.

Usage: python experiments/amg_setup_prof.py [n]
"""
import sys, time, collections
sys.path.insert(0, "/root/repo")
import numpy as np, jax

import sparse_matrix_tpu.solvers.amg as amg
import sparse_matrix_tpu.ops.spgemm_block as sgb
import sparse_matrix_tpu.native as native
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.ops import operator as opmod
from sparse_matrix_tpu.solvers import poisson_2d_csr

acc = collections.Counter()
cnt = collections.Counter()

def timed(mod, name, key=None):
    fn = getattr(mod, name)
    k = key or name
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        r = fn(*a, **kw)
        acc[k] += time.perf_counter() - t0
        cnt[k] += 1
        return r
    setattr(mod, name, wrap)

# amg.py resolves these lazily via `from ..native import ...` inside the
# function bodies -> patch the package attr, not the amg module
timed(native, "amg_strength_native")
timed(native, "aggregate_pass_native")
timed(amg, "aggregate_strong")
timed(amg, "tentative_prolongator")
timed(amg, "_scale_rows")
timed(sgb, "spgemm_auto")
timed(opmod, "try_dia_from_csr")

import sparse_matrix_tpu.formats.bell as bellmod
import sparse_matrix_tpu.formats.aligned as alimod
import sparse_matrix_tpu.formats.lanepack as lpmod
import importlib
sbmod = importlib.import_module("sparse_matrix_tpu.ops.spmv_bell")
svmod = importlib.import_module("sparse_matrix_tpu.ops.spmv")
timed(bellmod, "estimate_bell")
timed(bellmod, "plan_bell")
timed(alimod, "plan_aligned")
timed(alimod, "_chunk_keys")
timed(lpmod, "plan_lanepack")
timed(lpmod, "_count_slabs")
timed(sbmod, "bell_device_arrays")
timed(svmod, "aligned_device_arrays")
timed(svmod, "lanepack_device_arrays")
timed(CsrMatrix, "transpose")
timed(CsrMatrix, "__sub__", key="csr_sub")
timed(CsrMatrix, "__matmul__", key="csr_matmul")
_orig_op = opmod.SpmvOperator.__init__
def op_init(self, *a, **kw):
    t0 = time.perf_counter()
    _orig_op(self, *a, **kw)
    acc["SpmvOperator_plan"] += time.perf_counter() - t0
    cnt["SpmvOperator_plan"] += 1
opmod.SpmvOperator.__init__ = op_init
amg.SpmvOperator = opmod.SpmvOperator

# _galerkin calls spgemm_auto from ops.spgemm_block directly
amg_galerkin = amg._galerkin

print("backend:", jax.default_backend(), flush=True)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
a = poisson_2d_csr(n, dtype=np.float32)
print(f"n={n}^2 rows={a.rows} nnz={a.nnz()}", flush=True)

t0 = time.time()
t1 = time.time()
levels, coarse = amg.amg_coarsen(a)
t_coarsen = time.time() - t1
t1 = time.time()
hier = amg.amg_setup(a, coarsening=(levels, coarse), dtype=np.float32)
t_plan = time.time() - t1
total = time.time() - t0
print(f"setup total {total:.1f}s  (coarsen {t_coarsen:.1f}s, plan+device {t_plan:.1f}s)")
print(hier)
print("\nphase breakdown (s, calls):")
for k, v in acc.most_common():
    print(f"  {k:24s} {v:8.2f}  x{cnt[k]}")
