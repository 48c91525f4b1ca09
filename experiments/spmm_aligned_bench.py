"""Aligned multi-RHS SpMM vs K repeated aligned SpMVs (v5e).

The aligned SpMV per-slab floor is dominated by the 8 dynamic x-window
loads (docs/PERF.md); the packed SpMM amortizes those loads K-fold while
the lane gather+multiply scales. Expectation from the cost split
(~8.5 load + ~10 scale of 18.5 ns): speedup -> 2-4x at K=8-16.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.solvers import poisson_2d_csr, cg_solve_multi
from sparse_matrix_tpu.formats.aligned import plan_aligned
from sparse_matrix_tpu.ops.spmv import spmv_aligned, aligned_device_arrays, _spmv_aligned_jit
from sparse_matrix_tpu.ops.spmm import (
    aligned_matvec_multi, pack_rhs, unpack_rhs, spmm_aligned_packed, _pick_b_spmm,
)


def lat():
    x = jnp.zeros((8, 128), jnp.float32)
    t0 = time.perf_counter(); _ = float(jnp.sum(x)); return time.perf_counter() - t0


def bench(fn, x0, iters=500):
    @jax.jit
    def loop(v):
        return jax.lax.fori_loop(0, iters, lambda i, u: fn(u) * 0.2, v)
    t0 = time.perf_counter(); _ = float(jnp.sum(loop(x0))); comp = time.perf_counter() - t0
    l0 = lat(); runs = []
    for _ in range(3):
        t0 = time.perf_counter(); _ = float(jnp.sum(loop(x0))); runs.append(time.perf_counter() - t0)
    return (min(runs) - min(l0, lat())) / iters, comp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    m = poisson_2d_csr(n, dtype=np.float32)
    nnz = m.nnz()
    plan = plan_aligned(m)
    rng = np.random.default_rng(0)
    print(f"=== poisson {n}^2: nnz={nnz} slabs={plan.num_slabs} fill={plan.fill:.2f}", flush=True)

    # baseline: single-RHS aligned SpMV
    arrs1 = aligned_device_arrays(plan)
    x1 = jnp.asarray(rng.standard_normal(m.cols).astype(np.float32))
    st1 = {k: v for k, v in arrs1.items() if k not in ("b", "spill")}
    mv1 = lambda v: _spmv_aligned_jit(st1, v, rows=m.rows, cols=m.cols,
                                      b=arrs1["b"], nbuf=2, interpret=False)
    per1, comp1 = bench(mv1, x1)
    print(f"spmv x1: compile {comp1:.0f}s {per1*1e3:.4f} ms -> {nnz/per1/1e9:.1f} Gnnz/s", flush=True)

    for k in (8, 16):
        mvk = aligned_matvec_multi(plan, k)
        xk = pack_rhs(rng.standard_normal((m.cols, k)).astype(np.float32), m.cols)
        perk, compk = bench(mvk, xk, iters=300)
        eq = nnz * k / perk / 1e9
        print(f"spmm K={k} (b={_pick_b_spmm(k)}): compile {compk:.0f}s {perk*1e3:.4f} ms"
              f" -> {eq:.1f} Gnnz*K/s = {eq/ (nnz/per1/1e9):.2f}x of {k} spmvs"
              f" ({perk/per1:.2f}x one spmv)", flush=True)

    # end-to-end: multi-RHS CG, K=8
    k = 8
    b = rng.standard_normal((m.rows, k)).astype(np.float32)
    mv = aligned_matvec_multi(plan, k)
    t0 = time.perf_counter()
    res = cg_solve_multi(mv, pack_rhs(b, m.cols), tol=1e-5, maxiter=4000, rhs_axis=1)
    _ = float(res.residual_norm.max()); tfirst = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = cg_solve_multi(mv, pack_rhs(b, m.cols), tol=1e-5, maxiter=4000, rhs_axis=1)
    _ = float(res.residual_norm.max()); tsolve = time.perf_counter() - t0
    x = np.asarray(unpack_rhs(res.x, m.rows))
    r = m.to_scipy() @ x - b
    rel = np.linalg.norm(r, axis=0) / np.linalg.norm(b, axis=0)
    print(f"CG multi K={k}: iters={int(res.iterations)} solve {tsolve*1e3:.0f} ms "
          f"(first {tfirst:.0f}s) max true rel resid {rel.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
