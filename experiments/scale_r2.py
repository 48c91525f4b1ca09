"""Round-2 scale validation: aligned general path + DIA + CG at 1M-4M rows.

2048^2 Poisson = 4.2M rows, 20.9M nnz: aligned plan ~21K slabs (SMEM
scalar-prefetch ~680KB, inside the 1MB budget), y buffers 2 x 32K x 128 f32
= 33MB HBM-resident... (y stays VMEM-resident per kernel contract: r128 =
32768 rows x 128 x 4B x 2 buffers = 33 MB > VMEM!) -- expect the VMEM guard
or compile failure at 2048; record whichever happens (the honest scale
ceiling of the VMEM-resident-y design).
"""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.solvers import poisson_2d_csr, cg_solve
from sparse_matrix_tpu.ops.operator import SpmvOperator
from aligned_spmv import lat, f0


def bench_op(op, x, nnz, iters=2000):
    @jax.jit
    def loop(v):
        return jax.lax.fori_loop(0, iters, lambda i, u: op(u) * 0.2, v)
    t0 = time.perf_counter(); _ = float(jnp.sum(loop(x))); comp = time.perf_counter() - t0
    l0 = lat(); runs = []
    for _ in range(3):
        t0 = time.perf_counter(); _ = float(jnp.sum(loop(x))); runs.append(time.perf_counter() - t0)
    per = (min(runs) - min(l0, lat())) / iters
    return per, comp


def main():
    for n in (1024, 2048):
        A = poisson_2d_csr(n, dtype=np.float32)
        nnz = A.nnz()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(A.rows).astype(np.float32))
        print(f"=== poisson {n}^2: rows={A.rows} nnz={nnz}", flush=True)
        for force in ("dia", "aligned"):
            try:
                t0 = time.perf_counter()
                op = SpmvOperator(A, force=force)
                plan_s = time.perf_counter() - t0
                per, comp = bench_op(op, x, nnz)
                print(f"{force}: plan {plan_s:.1f}s compile {comp:.0f}s "
                      f"{per*1e3:.4f} ms -> {nnz/per/1e9:.1f} Gnnz/s", flush=True)
            except Exception as e:
                print(f"{force}: {type(e).__name__}: {str(e)[:200]}", flush=True)
        # CG end-to-end via auto operator
        op = SpmvOperator(A)
        b = jnp.asarray(rng.standard_normal(A.rows).astype(np.float32))
        t0 = time.perf_counter()
        res = jax.block_until_ready(cg_solve(op, b, tol=1e-5, maxiter=4000))
        _ = float(res.residual_norm)
        t1 = time.perf_counter() - t0  # includes compile
        t0 = time.perf_counter()
        res = cg_solve(op, b, tol=1e-5, maxiter=4000)
        _ = float(res.residual_norm)
        t2 = time.perf_counter() - t0
        print(f"CG ({op.format}): iters={int(res.iterations)} "
              f"solve {t2*1e3:.0f} ms (first incl compile {t1:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
