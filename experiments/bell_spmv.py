"""BELL streaming SpMV (round-3 third kernel family) vs the aligned and
general LanePack kernels, on the general-path corpus classes.

Chained-jit timing (fori_loop data dependency + scalar readback - tunnel
latency), per CLAUDE.md methodology. All operands passed as jit arguments.
"""
import faulthandler, sys, time
sys.path.insert(0, "/root/repo")
faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)
import numpy as np, jax, jax.numpy as jnp

from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.formats.bell import plan_bell, estimate_bell
from sparse_matrix_tpu.formats.aligned import plan_aligned
from sparse_matrix_tpu.ops.spmv_bell import spmv_bell, bell_device_arrays
from sparse_matrix_tpu.ops.spmv import spmv_aligned, aligned_device_arrays


def fast_oracle(m, x):
    # vectorized f64 CSR oracle (the row-loop spmv_oracle is minutes at 4M nnz)
    return np.bincount(
        m.row_ids(),
        weights=m.vals.astype(np.float64) * x.astype(np.float64)[m.indices.astype(np.int64)],
        minlength=m.rows,
    )
from sparse_matrix_tpu.bench.roofline import spmv_ideal_bytes, V5E
from sparse_matrix_tpu.solvers import poisson_2d_csr


def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)


def bench_chain(apply_fn, x0, ch=200, reps=4):
    @jax.jit
    def chain(v):
        def body(_, vv):
            return apply_fn(vv) * 1e-6  # keep magnitudes bounded
        return jax.lax.fori_loop(0, ch, body, v)
    out = chain(x0); jax.block_until_ready(out)
    lat = probe_latency(); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = chain(x0); _ = float(out[0])
        ts.append(time.perf_counter() - t0)
    return max(1e-9, min(ts) - lat) / ch


def fem_like(rng, n_side, jitter):
    n = n_side * n_side
    offs = np.array([-n_side - 1, -n_side, -n_side + 1, -1, 0, 1,
                     n_side - 1, n_side, n_side + 1], dtype=np.int64)
    r = np.repeat(np.arange(n, dtype=np.int64), len(offs))
    c = r + np.tile(offs, n) + rng.integers(-jitter, jitter + 1, size=len(r))
    keep = (c >= 0) & (c < n)
    r, c = r[keep], c[keep]
    return CsrMatrix.from_coo(n, n, r, c, rng.standard_normal(len(r)))


def rand_local(rng, n, per_row, bandwidth):
    r = np.repeat(np.arange(n, dtype=np.int64), per_row)
    c = np.clip(r + rng.integers(-bandwidth, bandwidth + 1, size=len(r)), 0, n - 1)
    return CsrMatrix.from_coo(n, n, r, c, rng.standard_normal(len(r)))


print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

cases = {
    "poisson_512": poisson_2d_csr(512, dtype=np.float32),
    "femlike_262k": fem_like(rng, 512, 2),
    "randlocal_262k": rand_local(rng, 1 << 18, 16, 4096),
}

for name, m in cases.items():
    nnz = m.nnz()
    ideal = spmv_ideal_bytes(nnz, m.rows, m.cols)
    xh = rng.standard_normal(m.cols).astype(np.float32)
    yo = fast_oracle(m, xh).astype(np.float32)
    print(f"[{name}] oracle done", flush=True)
    x = jnp.asarray(xh)

    est = estimate_bell(m)
    print(f"\n== {name}: nnz={nnz} est={est}", flush=True)

    bp = plan_bell(m)
    barrs = bell_device_arrays(bp)
    print(f"  bell: L={bp.num_layers} ds={bp.ds[:20]}{'...' if len(bp.ds)>20 else ''} "
          f"fill={bp.fill:.3f} spill={(bp.spill.nnz if bp.spill else 0)} "
          f"bytes={bp.slot_bytes()/1e6:.1f}MB br={barrs['br']}", flush=True)
    yb = np.asarray(spmv_bell(bp, x, device_arrays=barrs))
    err = np.abs(yb - yo).max() / max(1.0, np.abs(yo).max())
    print(f"  bell parity: {err:.2e}", flush=True)
    t = bench_chain(lambda v: spmv_bell(bp, v, device_arrays=barrs), x)
    gnnz = nnz / t / 1e9
    eff = (bp.slot_bytes() + (m.rows + m.cols) * 4) / t / 1e9
    print(f"  bell: {t*1e6:.1f} us, {gnnz:.1f} Gnnz/s, streamed {eff:.0f} GB/s, "
          f"{ideal/t/1e9/V5E.hbm_gbps*100:.1f}% of ideal-CSR roofline", flush=True)

    ap = plan_aligned(m)
    aarrs = aligned_device_arrays(ap)
    t2 = bench_chain(lambda v: spmv_aligned(ap, v, device_arrays=aarrs), x)
    gnnz2 = nnz / t2 / 1e9
    print(f"  aligned: {t2*1e6:.1f} us, {gnnz2:.1f} Gnnz/s, "
          f"{ideal/t2/1e9/V5E.hbm_gbps*100:.1f}% of ideal-CSR roofline", flush=True)
