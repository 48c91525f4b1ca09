"""Line-level timing of plan_aligned on a 2048^2 Poisson operator and on a
1-nnz-per-row prolongator-shaped matrix (the two AMG planning shapes).

Usage: python experiments/plan_aligned_prof.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.formats import aligned as al
from sparse_matrix_tpu.formats.lanepack import LANES, SUBLANES

def timed(label, fn, *a, **kw):
    t0 = time.perf_counter()
    r = fn(*a, **kw)
    print(f"  {label:28s} {time.perf_counter()-t0:7.3f}s", flush=True)
    return r

def profile_one(m, name):
    print(f"== {name}: rows={m.rows} nnz={m.nnz()}")
    t0 = time.perf_counter()
    order, r_s, c_s, ck = timed("_chunk_keys", al._chunk_keys, m)
    v_s = timed("vals[order]", lambda: m.vals[order].astype(np.float32))
    uniq = timed("np.unique(ck)", lambda: np.unique(ck, return_inverse=True, return_counts=True))
    _, inv, cnt = uniq
    spill_mask = timed("spill mask", lambda: cnt[inv] < al.SPILL_K)
    keep = ~spill_mask
    r, c, v, ck2 = timed("keep-filter", lambda: (r_s[keep], c_s[keep], v_s[keep], ck[keep]))
    o2 = timed("argsort(ck)", lambda: np.argsort(ck2, kind="stable"))
    r, c, v, ck3 = timed("reorder", lambda: (r[o2], c[o2], v[o2], ck2[o2]))
    rb, dst = r // LANES, r % LANES
    w, xl = c // LANES, c % LANES
    new_chunk = np.r_[True, ck3[1:] != ck3[:-1]]
    chunk_id = np.cumsum(new_chunk) - 1
    head = np.nonzero(new_chunk)[0]
    print(f"  ... chunks={len(head)} spill={int(spill_mask.sum())}")
    t_rest0 = time.perf_counter()
    plan = al.plan_aligned(m)
    print(f"  full plan_aligned            {time.perf_counter()-t_rest0:7.3f}s  slabs={plan.num_slabs}")
    print(f"  total probe {time.perf_counter()-t0:.3f}s")

a = poisson_2d_csr(2048, dtype=np.float32)
profile_one(a, "poisson 2048^2")

# prolongator shape: 4.2M rows, 700K cols, 1 nnz/row, locally clustered cols
rng = np.random.default_rng(0)
rows_n = 4_194_304
cols_n = 699_392
cidx = np.minimum((np.arange(rows_n) // 6) + rng.integers(-2, 3, rows_n), cols_n - 1)
cidx = np.maximum(cidx, 0).astype(np.uint32)
offs = np.arange(rows_n + 1, dtype=np.int64)
p = CsrMatrix(rows_n, cols_n, np.ones(rows_n, np.float32), cidx, offs, is_sorted=True)
profile_one(p, "prolongator 4.2M x 700K")
