"""bf16 value-plane ablation: DIA streaming kernel + BELL SpMV/SpMM.

The value planes are the dominant HBM stream of both kernels (DIA: the
ONLY operator stream, 4 B/nnz; BELL: 4 of 5 B/slot). bf16 storage halves
them; kernels widen per block and accumulate f32. Expected ceilings:
DIA ~2x Gnnz/s (stream is pure values), BELL ~5/3x (i8 lanes stay).

Chained-jit timing per CLAUDE.md (fori_loop + scalar readback - RTT).
"""
import faulthandler, sys, time
sys.path.insert(0, "/root/repo")
faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)
import numpy as np, jax, jax.numpy as jnp

from sparse_matrix_tpu.formats.bell import plan_bell
from sparse_matrix_tpu.formats.dia import try_dia_from_csr
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.ops.spmv_bell import spmv_bell, bell_device_arrays
from sparse_matrix_tpu.ops.spmv_dia import (
    dia_device_arrays, spmv_dia, _dia_pallas_blocked_data)
from sparse_matrix_tpu.ops.spmm import spmm_bell
from sparse_matrix_tpu.solvers import poisson_2d_csr


def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)


def bench_chain(apply_fn, x0, ch=60, reps=4):
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


def fem_like(rng, n_side, jitter=2):
    n = n_side * n_side
    offs = np.array([-n_side - 1, -n_side, -n_side + 1, -1, 0, 1,
                     n_side - 1, n_side, n_side + 1], dtype=np.int64)
    r = np.repeat(np.arange(n, dtype=np.int64), len(offs))
    c = r + np.tile(offs, n) + rng.integers(-jitter, jitter + 1, size=len(r))
    keep = (c >= 0) & (c < n)
    r, c = r[keep], c[keep]
    return CsrMatrix.from_coo(n, n, r, c, rng.standard_normal(len(r)))


rng = np.random.default_rng(0)

# ---- DIA streaming kernel, Poisson 2048^2 (84 MB f32 band data) ----------
for n in (1024, 2048):
    a = poisson_2d_csr(n, dtype=np.float32)
    dia = try_dia_from_csr(a)
    nnz = dia.nnz()
    x = jnp.asarray(rng.standard_normal(a.cols).astype(np.float32))
    for tag, vdt in (("f32", None), ("bf16", jnp.bfloat16)):
        arrs = dia_device_arrays(dia, values_dtype=vdt)
        y = spmv_dia(dia, x, device_arrays=arrs)  # build blocked cache
        jax.block_until_ready(y)
        t = bench_chain(lambda v: spmv_dia(dia, v, device_arrays=arrs), x)
        vb = 2 if vdt is not None else 4
        eff = (dia.data.size * vb + 2 * a.rows * 4) / t / 1e9
        print(f"dia poisson_{n}^2 {tag}: {t*1e6:.1f} us  "
              f"{nnz/t/1e9:.1f} Gnnz/s  ~{eff:.0f} GB/s streamed",
              flush=True)

# ---- BELL, femlike 262k ---------------------------------------------------
a = fem_like(rng, 512)
plan = plan_bell(a)
print(f"femlike_262k: nnz={a.nnz()} layers={plan.num_layers} "
      f"spill={'y' if plan.spill is not None else 'n'}", flush=True)
x = jnp.asarray(rng.standard_normal(a.cols).astype(np.float32))
xs = jnp.asarray(rng.standard_normal((a.cols, 8)).astype(np.float32))
for tag, vdt in (("f32", None), ("bf16", jnp.bfloat16)):
    arrs = bell_device_arrays(plan, values_dtype=vdt)
    y = spmv_bell(plan, x, device_arrays=arrs); jax.block_until_ready(y)
    t = bench_chain(lambda v: spmv_bell(plan, v, device_arrays=arrs), x, ch=120)
    print(f"bell femlike spmv {tag}: {t*1e6:.1f} us  {a.nnz()/t/1e9:.1f} Gnnz/s",
          flush=True)
    ym = spmm_bell(plan, xs, device_arrays=arrs); jax.block_until_ready(ym)
    tm = bench_chain(lambda v: spmm_bell(plan, v, device_arrays=arrs), xs, ch=40)
    print(f"bell femlike spmm K=8 {tag}: {tm*1e6:.1f} us  "
          f"{8*a.nnz()/tm/1e9:.1f} Gnnz/s", flush=True)

# parity spot-check (bf16-grade)
arrs16 = bell_device_arrays(plan, values_dtype=jnp.bfloat16)
y16 = np.asarray(spmv_bell(plan, x, device_arrays=arrs16))
y32 = np.asarray(spmv_bell(plan, x, device_arrays=bell_device_arrays(plan)))
s = max(1.0, np.abs(y32).max())
print("bell bf16 vs f32 max scaled diff:", np.abs(y16 - y32).max() / s, flush=True)
print("DONE", flush=True)
