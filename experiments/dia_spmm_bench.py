"""Streaming DIA SpMM: K RHS in one pass over the band planes, vs the
per-column streaming-SpMV loop and the XLA shifted-slice spmm_dia, at
Poisson 2048^2 (streaming regime), f32 and bf16 planes.

Also the first hardware compile of the 3-D element-indexed x window
(pl.Element(win_rows), pl.Element(k), pl.Element(128)).
"""
import faulthandler, sys, time
sys.path.insert(0, "/root/repo")
faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)
import numpy as np, jax, jax.numpy as jnp

from sparse_matrix_tpu.formats.dia import try_dia_from_csr
from sparse_matrix_tpu.ops.spmv_dia import (
    dia_device_arrays, spmv_dia, spmm_dia_stream)
from sparse_matrix_tpu.ops.spmm import spmm_dia
from sparse_matrix_tpu.solvers import poisson_2d_csr


def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)


def bench_chain(apply_fn, x0, ch=40, reps=4):
    @jax.jit
    def chain(v):
        def body(_, vv):
            return apply_fn(vv) * 1e-6
        return jax.lax.fori_loop(0, ch, body, v)
    out = chain(x0); jax.block_until_ready(out)
    lat = probe_latency(); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = chain(x0)
        _ = float(out.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return max(1e-9, min(ts) - lat) / ch


n = 2048
a = poisson_2d_csr(n, dtype=np.float32)
dia = try_dia_from_csr(a)
nnz = dia.nnz()
rng = np.random.default_rng(0)
K = 8
xs = jnp.asarray(rng.standard_normal((a.cols, K)).astype(np.float32))
print(f"poisson {n}^2, nnz={nnz}, K={K}", flush=True)

for tag, vdt in (("f32", None), ("bf16", jnp.bfloat16)):
    arrs = dia_device_arrays(dia, values_dtype=vdt)
    # parity first (vs per-column SpMV through the same arrays)
    y = spmm_dia_stream(dia, xs, device_arrays=arrs)
    jax.block_until_ready(y)
    ycol = jnp.stack([spmv_dia(dia, xs[:, j], device_arrays=arrs)
                      for j in range(K)], axis=1)
    d = float(jnp.abs(y - ycol).max() / jnp.abs(ycol).max())
    print(f"  {tag} packed-vs-loop max rel diff: {d:.2e}", flush=True)
    assert d < 1e-5

    t = bench_chain(lambda v: spmm_dia_stream(dia, v, device_arrays=arrs), xs)
    print(f"  spmm_dia_stream {tag}: {t*1e6:.1f} us  "
          f"{K*nnz/t/1e9:.1f} Gnnz/s", flush=True)
    tl = bench_chain(
        lambda v: jnp.stack([spmv_dia(dia, v[:, j], device_arrays=arrs)
                             for j in range(K)], axis=1), xs, ch=20)
    print(f"  per-column loop {tag}: {tl*1e6:.1f} us  "
          f"{K*nnz/tl/1e9:.1f} Gnnz/s  (packed {tl/t:.2f}x)", flush=True)

# XLA shifted-slice baseline (f32)
tx = bench_chain(lambda v: spmm_dia(dia, v), xs, ch=20)
print(f"  spmm_dia XLA f32: {tx*1e6:.1f} us  {K*nnz/tx/1e9:.1f} Gnnz/s",
      flush=True)
print("DONE", flush=True)
