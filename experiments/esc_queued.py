"""Queued-dispatch (amortized) rate of the device ESC SpGEMM vs the block
engine and the host hash engine.

docs/PERF.md round-1 recorded ESC only one-shot (0.6 Mprod/s — dominated by
the ~25-50 ms tunnel sync). Iterative pipelines amortize that away: this
measures the kernel-only rate by chaining iterations inside one jit with a
data dependency (bench methodology of bench/runner.py).

If the amortized ESC rate beats the host hash engine in the unstructured
mid-sparse regime, the spgemm_auto cost model gains an ESC term.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.ops.device_sorted import expand_plan, _esc_impl
from sparse_matrix_tpu.ops.spgemm_host import spgemm_hash_host, flops_per_row
from sparse_matrix_tpu.ops.spgemm_block import BlockSpgemm


def lat():
    x = jnp.zeros((8, 128), jnp.float32)
    t0 = time.perf_counter(); _ = float(jnp.sum(x)); return time.perf_counter() - t0


def bench_jit(fn, iters=30):
    """fn(s: scalar) -> scalar, chained; returns per-iter seconds."""
    @jax.jit
    def loop(s):
        return jax.lax.fori_loop(0, iters, lambda i, u: fn(u), s)
    s0 = jnp.float32(1.0)
    t0 = time.perf_counter(); _ = float(loop(s0)); comp = time.perf_counter() - t0
    l0 = lat(); runs = []
    for _ in range(3):
        t0 = time.perf_counter(); _ = float(loop(s0)); runs.append(time.perf_counter() - t0)
    return (min(runs) - min(l0, lat())) / iters, comp


def uniform(rng, n, density):
    nnz = int(n * n * density)
    return CsrMatrix.from_coo(n, n, rng.integers(0, n, nnz), rng.integers(0, n, nnz),
                              rng.standard_normal(nnz).astype(np.float32))


def powerlaw(rng, n, avg):
    lens = np.minimum((rng.pareto(1.5, n) + 1) * avg / 3, n).astype(np.int64)
    r = np.repeat(np.arange(n), lens)
    c = rng.integers(0, n, len(r))
    return CsrMatrix.from_coo(n, n, r, c, rng.standard_normal(len(r)).astype(np.float32))


def run_case(name, m):
    prods = int(flops_per_row(m, m).sum())
    print(f"=== {name}: n={m.rows} nnz={m.nnz()} products={prods}", flush=True)
    # host hash engine (1 core here)
    t0 = time.perf_counter(); _ = spgemm_hash_host(m, m, output_sorted=False)
    th = time.perf_counter() - t0
    print(f"host hash: {th*1e3:.1f} ms = {prods/th/1e6:.1f} Mprod/s", flush=True)
    # device ESC, queued
    t0 = time.perf_counter()
    src, q, out_r = expand_plan(m, m)
    tplan = time.perf_counter() - t0
    lv = jnp.asarray(m.vals.astype(np.float32))
    rv = lv
    ri = jnp.asarray(m.indices.astype(np.int32))
    srcj, qj, orj = jnp.asarray(src), jnp.asarray(q), jnp.asarray(out_r)
    rows, cols = m.rows, m.cols

    def step(s):
        row, col, val, nnz = _esc_impl(lv * s, rv, ri, srcj, qj, orj, rows=rows, cols=cols)
        return (jnp.sum(val) * 1e-30 + 1.0).astype(jnp.float32)

    per, comp = bench_jit(step)
    print(f"device ESC queued: plan {tplan*1e3:.0f} ms, compile {comp:.0f}s, "
          f"{per*1e3:.2f} ms = {prods/per/1e6:.1f} Mprod/s", flush=True)
    # block engine, queued
    try:
        bsg = BlockSpgemm(m, m)
        def bstep(s):
            c = bsg.multiply_device()
            return (jnp.sum(c) * 1e-30 + 1.0).astype(jnp.float32)
        perb, compb = bench_jit(bstep, iters=10)
        print(f"block MXU queued: pairs={bsg.num_pairs}, compile {compb:.0f}s, "
              f"{perb*1e3:.2f} ms = {prods/perb/1e6:.1f} Mprod/s", flush=True)
    except Exception as e:
        print(f"block MXU: {type(e).__name__}: {str(e)[:150]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    run_case("uniform_2048_1pct", uniform(rng, 2048, 0.01))
    run_case("uniform_4096_05pct", uniform(rng, 4096, 0.005))
    run_case("uniform_8192_02pct", uniform(rng, 8192, 0.002))
    run_case("powerlaw_2k", powerlaw(rng, 2048, 16))
    run_case("powerlaw_16k_hyper", uniform(rng, 16384, 0.00015))


if __name__ == "__main__":
    main()
