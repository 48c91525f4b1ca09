"""Block CG on the packed-persistent streaming DIA matvec at 2048^2:
K=8 systems in lockstep (band planes read once per iteration for all 8)
vs 8 sequential chained CG solves; f32 and bf16 planes.

Also times the one-shot spmm_dia_stream wrapper vs the packed core to
quantify the relayout share it avoids.
"""
import faulthandler, sys, time
sys.path.insert(0, "/root/repo")
faulthandler.dump_traceback_later(900, repeat=True, file=sys.stderr)
import numpy as np, jax, jax.numpy as jnp

from sparse_matrix_tpu.formats.dia import try_dia_from_csr
from sparse_matrix_tpu.ops.spmv_dia import (
    dia_device_arrays, dia_matvec_multi, dia_pack_rhs, dia_unpack_rhs,
    spmv_dia)
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import cg_solve, cg_solve_multi


def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)


n = 2048
K = 8
a = poisson_2d_csr(n, dtype=np.float32)
dia = try_dia_from_csr(a)
rng = np.random.default_rng(0)
b = rng.standard_normal((a.rows, K)).astype(np.float32)
bj = jnp.asarray(b)
print(f"poisson {n}^2 K={K}", flush=True)

for tag, vdt in (("f32", None), ("bf16", jnp.bfloat16)):
    arrs = dia_device_arrays(dia, values_dtype=vdt)
    mv = dia_matvec_multi(dia, K, device_arrays=arrs)
    b3 = dia_pack_rhs(dia, bj)

    # packed-core per-apply time (vs the one-shot wrapper measured in
    # dia_spmm_bench.out: 1463 us f32 — the delta is the relayout share)
    @jax.jit
    def chain(v):
        return jax.lax.fori_loop(0, 40, lambda _, vv: mv(vv) * 1e-6, v)
    out = chain(b3); jax.block_until_ready(out)
    lat = probe_latency(); ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = chain(b3)
        _ = float(out.reshape(-1)[0]); ts.append(time.perf_counter() - t0)
    t_core = (min(ts) - lat) / 40
    print(f"  packed core {tag}: {t_core*1e6:.1f} us  "
          f"{K*dia.nnz()/t_core/1e9:.1f} Gnnz/s", flush=True)

    # block CG (one compiled while_loop over all 8 systems)
    sol = jax.jit(lambda bb: cg_solve_multi(mv, bb, tol=1e-5, maxiter=8000,
                                            rhs_axis=1))
    r = sol(b3); _ = float(r.residual_norm[0])
    lat = probe_latency(); ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = sol(b3); _ = float(r.residual_norm[0])
        ts.append(time.perf_counter() - t0)
    t_blk = min(ts) - lat
    x = np.asarray(dia_unpack_rhs(dia, r.x))
    print(f"  block CG {tag}: {t_blk*1e3:.1f} ms for {K} systems "
          f"({t_blk/K*1e3:.1f} ms/rhs, {int(r.iterations)} it)", flush=True)

    # sequential baseline: 8 chained single CG solves in one jit
    op_arrs = dict(arrs)
    sol1 = jax.jit(lambda bb: cg_solve(
        lambda v: spmv_dia(dia, v, device_arrays=op_arrs), bb,
        tol=1e-5, maxiter=8000))
    @jax.jit
    def seq(bb):
        def body(j, acc):
            res = sol1(jax.lax.dynamic_slice_in_dim(bb, j, 1, 1)[:, 0])
            return acc + res.residual_norm
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    _ = float(seq(bj))
    lat = probe_latency(); ts = []
    for _ in range(2):
        t0 = time.perf_counter(); _ = float(seq(bj))
        ts.append(time.perf_counter() - t0)
    t_seq = min(ts) - lat
    print(f"  sequential {tag}: {t_seq*1e3:.1f} ms for {K} "
          f"({t_seq/K*1e3:.1f} ms/rhs)  block speedup {t_seq/t_blk:.2f}x",
          flush=True)

    # correctness: residuals against the f64 oracle on one column
    from sparse_matrix_tpu.ops.spmv import spmv_oracle
    tr = np.linalg.norm(
        b[:, 0].astype(np.float64) - spmv_oracle(a, x[:, 0].astype(np.float64))
    ) / np.linalg.norm(b[:, 0])
    print(f"  col-0 true rel residual: {tr:.2e}", flush=True)
print("DONE", flush=True)
