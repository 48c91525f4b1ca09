"""Stripe SELECT-mode hardware sweep (no scan, no starts, 1 gather/level;
collision spill via LanePack). Compares against the scan-mode numbers in
stripe_bench_v2.out.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/stripe_bench_v3.py > experiments/stripe_bench_v3.out 2>&1 &
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    from sparse_matrix_tpu.bench.corpus import _power_law_rows, _random_local
    from sparse_matrix_tpu.bench.runner import bench_device_loop
    from sparse_matrix_tpu.formats.stripe import plan_stripe
    from sparse_matrix_tpu.ops.spmv import spmv_stripe, stripe_device_arrays

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    cases = [
        ("randlocal_262k", _random_local(rng, 1 << 18, 16, 4096),
         [("select", 4, 8), ("scan", 2, 2)]),
        ("powerlaw_262k", _power_law_rows(rng, 1 << 18, 16),
         [("select", 8, 16), ("select", 8, 32)]),
    ]
    for name, m, grid in cases:
        nnz = m.nnz()
        x = jnp.asarray(rng.standard_normal(m.cols).astype(np.float32))
        xh = np.asarray(x)
        idx = rng.choice(m.rows, 128, replace=False)
        ref = {int(i): float(
            m.vals[m.offsets[i]:m.offsets[i + 1]].astype(np.float64)
            @ xh[m.indices[m.offsets[i]:m.offsets[i + 1]].astype(np.int64)])
            for i in idx}
        log(f"--- {name}: nnz={nnz}")
        for (mode, L, KW) in grid:
            t0 = time.time()
            plan = plan_stripe(m, levels=L, kw=KW, mode=mode)
            arrs = stripe_device_arrays(plan)
            plan_t = time.time() - t0
            y = np.asarray(spmv_stripe(plan, x, device_arrays=arrs))
            bad = [(i, float(y[i]), r0) for i, r0 in ref.items()
                   if abs(float(y[i]) - r0) > 1e-2 * max(1.0, abs(r0))]
            if bad:
                log(f"{name} {mode} L={L} KW={KW}: FAIL {bad[:3]}")
                continue
            r = bench_device_loop(
                "stripe",
                lambda v: spmv_stripe(plan, v, device_arrays=arrs) * 0.2,
                x, iters=600)
            ns_slab = r.seconds * 1e9 / plan.num_slabs
            spn = plan.spill.nnz if plan.spill is not None else 0
            log(f"{name} {mode} L={L} KW={KW} (kw_g={plan.kw}): "
                f"{r.seconds*1e6:.1f} us -> {nnz/r.seconds/1e9:.2f} Gnnz/s  "
                f"fill={plan.fill:.2f} slabs={plan.num_slabs} "
                f"ns/slab={ns_slab:.1f} spill={spn} "
                f"({100.0*spn/max(nnz,1):.1f}%) plan={plan_t:.1f}s "
                f"iters={r.iters}")


if __name__ == "__main__":
    main()
