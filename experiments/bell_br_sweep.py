"""BELL br (rows-per-grid-step) sweep with RTT-proof timing.

Round-3's first bell_spmv.out numbers used 200-iteration chains (2-15 ms)
against a ~25 ms tunnel RTT — noise. This sweep uses the auto-scaled
bench_device_loop (chain >= 0.4 s) and also re-times the aligned kernel
the same way, so the BELL-vs-aligned dispatch constants can be trusted.

pick_br's 10 MB VMEM budget forced femlike to br=256 and randlocal to 128;
v5e has 128 MB VMEM, so br in {256, 512, 1024} is the lever to test.
"""
import faulthandler, sys
sys.path.insert(0, "/root/repo")
faulthandler.dump_traceback_later(400, repeat=True, file=sys.stderr)
import numpy as np, jax, jax.numpy as jnp

from sparse_matrix_tpu.bench.corpus import _fem_like, _random_local
from sparse_matrix_tpu.bench.roofline import spmv_ideal_bytes, V5E
from sparse_matrix_tpu.bench.runner import bench_device_loop
from sparse_matrix_tpu.formats.bell import plan_bell
from sparse_matrix_tpu.formats.aligned import plan_aligned
from sparse_matrix_tpu.ops.spmv_bell import spmv_bell, bell_device_arrays
from sparse_matrix_tpu.ops.spmv import spmv_aligned, aligned_device_arrays
from sparse_matrix_tpu.solvers import poisson_2d_csr


def fast_oracle(m, x):
    return np.bincount(
        m.row_ids(),
        weights=m.vals.astype(np.float64) * x.astype(np.float64)[m.indices.astype(np.int64)],
        minlength=m.rows,
    )


print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

cases = {
    "poisson_512": (poisson_2d_csr(512, dtype=np.float32), (512,)),
    "femlike_262k": (_fem_like(rng, 512, 2), (256, 512)),
    "randlocal_262k": (_random_local(rng, 1 << 18, 16, 4096), (128, 512)),
}

for name, (m, brs) in cases.items():
    nnz = m.nnz()
    ideal = spmv_ideal_bytes(nnz, m.rows, m.cols)
    xh = rng.standard_normal(m.cols).astype(np.float32)
    yo = fast_oracle(m, xh).astype(np.float32)
    x = jnp.asarray(xh)
    bp = plan_bell(m)
    print(f"\n== {name}: nnz={nnz} L={bp.num_layers} fill={bp.fill:.3f} "
          f"spill={(bp.spill.nnz if bp.spill else 0)}", flush=True)
    for br in brs:
        barrs = bell_device_arrays(bp, br=br)
        yb = np.asarray(spmv_bell(bp, x, device_arrays=barrs))
        err = np.abs(yb - yo).max() / max(1.0, np.abs(yo).max())
        r = bench_device_loop(
            f"bell_br{br}",
            lambda v: spmv_bell(bp, v, device_arrays=barrs) * 1e-6,
            x,
        )
        t = r.seconds
        chunks = bp.num_layers * barrs["vals"].shape[1] // 128
        st = r.stats()
        print(f"  bell br={br}: {t*1e6:.1f} us, {nnz/t/1e9:.1f} Gnnz/s, "
              f"{ideal/t/1e9/V5E.hbm_gbps*100:.1f}% roofline, "
              f"{t*1e9/max(chunks,1):.2f} ns/chunk, parity {err:.1e}, "
              f"iters={r.iters} med/min={st['median']/st['min']:.3f}", flush=True)
    ap = plan_aligned(m)
    aarrs = aligned_device_arrays(ap)
    r = bench_device_loop(
        "aligned", lambda v: spmv_aligned(ap, v, device_arrays=aarrs) * 1e-6, x
    )
    t = r.seconds
    print(f"  aligned: {t*1e6:.1f} us, {nnz/t/1e9:.1f} Gnnz/s, "
          f"{ideal/t/1e9/V5E.hbm_gbps*100:.1f}% roofline, iters={r.iters}", flush=True)
