"""Probe the aligned-SpMM kernel's b (slab batch) sensitivity at K=8/16
and the packed multi-RHS CG per-iteration cost breakdown."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.formats.aligned import plan_aligned
from sparse_matrix_tpu.ops.spmv import aligned_device_arrays
from sparse_matrix_tpu.ops.spmm import _spmm_aligned_jit, pack_rhs


def lat():
    x = jnp.zeros((8, 128), jnp.float32)
    t0 = time.perf_counter(); _ = float(jnp.sum(x)); return time.perf_counter() - t0


def bench(fn, x0, iters=2000):
    @jax.jit
    def loop(v):
        return jax.lax.fori_loop(0, iters, lambda i, u: fn(u) * 0.2 + 0.1, v)
    t0 = time.perf_counter(); _ = float(jnp.sum(loop(x0))); comp = time.perf_counter() - t0
    l0 = lat(); runs = []
    for _ in range(3):
        t0 = time.perf_counter(); _ = float(jnp.sum(loop(x0))); runs.append(time.perf_counter() - t0)
    return (min(runs) - min(l0, lat())) / iters, comp


def main():
    m = poisson_2d_csr(512, dtype=np.float32)
    plan = plan_aligned(m)
    nnz = m.nnz()
    rng = np.random.default_rng(0)
    for k in (8, 16):
        x3 = pack_rhs(rng.standard_normal((m.cols, k)).astype(np.float32), m.cols)
        for b in (16, 32, 64):
            arrs = aligned_device_arrays(plan, b=b)
            st = {kk: v for kk, v in arrs.items() if kk not in ("b", "spill")}
            fn = lambda v: jnp.concatenate(
                [_spmm_aligned_jit(st, v, rows=m.rows, b=b, k=k, nbuf=2,
                                   interpret=False),
                 jnp.zeros((1, k, 128), v.dtype)], axis=0)
            per, comp = bench(fn, x3, iters=1000)
            eq = nnz * k / per / 1e9
            print(f"K={k} b={b}: compile {comp:.0f}s {per*1e3:.4f} ms -> "
                  f"{eq:.1f} Gnnz*K/s", flush=True)


if __name__ == "__main__":
    main()
