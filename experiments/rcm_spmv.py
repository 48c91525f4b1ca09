"""RCM payoff measurement: SpMV on shuffled structured matrices, before vs
after reverse Cuthill-McKee reordering (formats/reorder.py).

The locality-dependent fast paths (DIA detection, aligned windows) see a
randomly-renumbered Poisson/FEM matrix as the documented no-locality corner
(docs/PERF.md): the planner falls back to the gather-bound lanepack path.
RCM restores the band, so the same operator auto-dispatch lands back on the
fast paths. Also records the honest negative: randlocal (uniform in a
+/-4096 band = an expander) gets a *worse* bandwidth from RCM.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.formats.reorder import rcm_reordered, permute_symmetric, bandwidth
from sparse_matrix_tpu.core.matrix_market import load_matrix_market_csr
from sparse_matrix_tpu.formats.csr import CsrMatrix


def lat():
    x = jnp.zeros((8, 128), jnp.float32)
    t0 = time.perf_counter(); _ = float(jnp.sum(x)); return time.perf_counter() - t0


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


def f32(m):
    return CsrMatrix(m.rows, m.cols, m.vals.astype(np.float32), m.indices,
                     m.offsets, is_sorted=m.is_sorted)


def run_case(name, m):
    rng = np.random.default_rng(0)
    shuffled = permute_symmetric(m, rng.permutation(m.rows))
    t0 = time.perf_counter()
    reordered, _p = rcm_reordered(shuffled)
    t_rcm = time.perf_counter() - t0
    print(f"=== {name}: nnz={m.nnz()} bw orig={bandwidth(m)} "
          f"shuffled={bandwidth(shuffled)} rcm={bandwidth(reordered)} "
          f"(rcm {t_rcm:.1f}s)", flush=True)
    for label, mm in (("shuffled", shuffled), ("rcm", reordered), ("orig", m)):
        mm = f32(mm)
        x = jnp.asarray(np.random.default_rng(1).standard_normal(mm.cols).astype(np.float32))
        t0 = time.perf_counter()
        op = SpmvOperator(mm)
        plan_s = time.perf_counter() - t0
        per, comp = bench_op(op, x, mm.nnz())
        print(f"{label}: format={op.format} plan {plan_s:.1f}s compile {comp:.0f}s "
              f"{per*1e3:.4f} ms -> {mm.nnz()/per/1e9:.1f} Gnnz/s", flush=True)


def main():
    run_case("poisson_512", poisson_2d_csr(512, dtype=np.float32))
    try:
        fem = load_matrix_market_csr("/root/repo/matrices/femlike_262k.mtx")
        run_case("femlike_262k", fem)
    except FileNotFoundError:
        print("femlike_262k.mtx missing (run corpus --generate)", flush=True)
    # the honest negative: randlocal is an expander inside its band
    try:
        rl = load_matrix_market_csr("/root/repo/matrices/randlocal_262k.mtx")
        t0 = time.perf_counter()
        r2, _ = rcm_reordered(rl)
        print(f"randlocal_262k: bw {bandwidth(rl)} -> rcm {bandwidth(r2)} "
              f"({time.perf_counter()-t0:.1f}s) — RCM does not help expanders;"
              " callers should compare bandwidth before/after", flush=True)
    except FileNotFoundError:
        pass


if __name__ == "__main__":
    main()
