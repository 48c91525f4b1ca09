"""Measure TPU throughput of the primitives that decide the sparse kernel design:
gather, scatter-add/segment_sum, sort, and raw HBM copy bandwidth.

Run on the real chip: python experiments/tpu_primitives_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # 0) HBM copy bandwidth baseline
    for mb in (64, 256):
        n = mb * 1024 * 1024 // 4
        x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
        f = jax.jit(lambda a: a * 1.000001)
        dt = timeit(f, x)
        print(f"copy-ish {mb}MB: {dt*1e3:.3f} ms -> {2*n*4/dt/1e9:.1f} GB/s (r+w)")

    N = 262144  # 512^2
    for nnz in (1 << 20, 1 << 22):
        x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, nnz), dtype=jnp.int32)
        sorted_idx = jnp.sort(idx)
        vals = jnp.asarray(rng.standard_normal(nnz), dtype=jnp.float32)
        rows_sorted = jnp.asarray(np.sort(rng.integers(0, N, nnz)).astype(np.int32))

        # 1) gather
        g = jax.jit(lambda x, i: x[i])
        dt = timeit(g, x, idx)
        print(f"gather random nnz={nnz}: {dt*1e3:.3f} ms -> {nnz*8/dt/1e9:.1f} GB/s eff")
        dt = timeit(g, x, sorted_idx)
        print(f"gather sorted nnz={nnz}: {dt*1e3:.3f} ms -> {nnz*8/dt/1e9:.1f} GB/s eff")

        # 2) segment_sum (sorted ids)
        ss = jax.jit(lambda v, r: jax.ops.segment_sum(v, r, num_segments=N, indices_are_sorted=True))
        dt = timeit(ss, vals, rows_sorted)
        print(f"segment_sum sorted nnz={nnz}: {dt*1e3:.3f} ms -> {nnz*8/dt/1e9:.1f} GB/s eff")

        ssu = jax.jit(lambda v, r: jax.ops.segment_sum(v, r, num_segments=N))
        dt = timeit(ssu, vals, rows_sorted)
        print(f"segment_sum unsorted-flag nnz={nnz}: {dt*1e3:.3f} ms")

        # 3) sort by key (u32) + 4) sort kv
        srt = jax.jit(lambda k: jnp.sort(k))
        dt = timeit(srt, idx)
        print(f"sort u32 nnz={nnz}: {dt*1e3:.3f} ms -> {nnz/dt/1e6:.0f} Melem/s")
        srtkv = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        dt = timeit(srtkv, idx, vals)
        print(f"sort kv nnz={nnz}: {dt*1e3:.3f} ms -> {nnz/dt/1e6:.0f} Melem/s")

        # 5) cumsum (for compress/scan phases)
        cs = jax.jit(lambda v: jnp.cumsum(v))
        dt = timeit(cs, vals)
        print(f"cumsum nnz={nnz}: {dt*1e3:.3f} ms -> {nnz*8/dt/1e9:.1f} GB/s eff")

        # 6) 2D ELL-style gather+reduce: rows=N/8? use (nnz/W, W) layout
        W = 32
        rowsE = nnz // W
        cols2d = jnp.asarray(rng.integers(0, N, (rowsE, W)), dtype=jnp.int32)
        vals2d = jnp.asarray(rng.standard_normal((rowsE, W)), dtype=jnp.float32)
        ell = jax.jit(lambda x, c, v: (v * x[c]).sum(axis=1))
        dt = timeit(ell, x, cols2d, vals2d)
        print(f"ELL gather+reduce ({rowsE}x{W}): {dt*1e3:.3f} ms -> {nnz*8/dt/1e9:.1f} GB/s eff")
        print()


if __name__ == "__main__":
    main()
