"""Trimmed claimed-vs-shipped rerun (VERDICT r4 #3), pass b.

Pass a (skew_dispatch_r5.out, partial — killed to free the tunnel for the
AmgRefresh scale bench) measured the full randlocal scan grid + select
L=2: auto dispatch (scan 2,2 at 253-255 us = 16.3-16.5 Gnnz/s) matches
the scan grid argmin, and the select cost model OVERPRICES measured
select configs ~30% (L=2 KW=1: model 337 vs measured 256 us). This pass
measures exactly the r4 claimed winners against auto:

  randlocal: select(4,8) [claimed 17.9 Gnnz/s], select(4,1), select(8,8)
  powerlaw:  scan(8,16) [claimed 4.7], scan(8,8), scan(4,16), auto,
             forced lanepack (r3 baseline 1.1 via rowsplit)

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/skew_dispatch_r5b.py > experiments/skew_dispatch_r5b.out 2>&1 &
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def bench_one(name, m, x, fn, ref):
    from sparse_matrix_tpu.bench.runner import bench_device_loop

    y = np.asarray(fn(x))
    bad = [(i, float(y[i]), r0) for i, r0 in ref.items()
           if abs(float(y[i]) - r0) > 1e-2 * max(1.0, abs(r0))]
    if bad:
        log(f"{name}: FAIL {bad[:2]}")
        return None
    r = bench_device_loop(name, lambda v: fn(v) * 0.2, x, iters=600)
    nnz = m.nnz()
    log(f"{name}: {r.seconds*1e6:.1f} us -> {nnz/r.seconds/1e9:.2f} Gnnz/s "
        f"(iters={r.iters})")
    return r.seconds


def main():
    from sparse_matrix_tpu.bench.corpus import _power_law_rows, _random_local
    from sparse_matrix_tpu.formats.stripe import plan_stripe
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.ops.spmv import spmv_stripe, stripe_device_arrays

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    cases = [
        ("randlocal_262k", _random_local(rng, 1 << 18, 16, 4096),
         [("select", 4, 8), ("select", 4, 1), ("select", 8, 8)],
         (None,)),
        ("powerlaw_262k", _power_law_rows(rng, 1 << 18, 16),
         [("scan", 8, 16), ("scan", 8, 8), ("scan", 4, 16)],
         (None, "lanepack")),
    ]
    for name, m, grid, forces in cases:
        nnz = m.nnz()
        x = jnp.asarray(rng.standard_normal(m.cols).astype(np.float32))
        xh = np.asarray(x)
        idx = rng.choice(m.rows, 64, replace=False)
        ref = {int(i): float(
            m.vals[m.offsets[i]:m.offsets[i + 1]].astype(np.float64)
            @ xh[m.indices[m.offsets[i]:m.offsets[i + 1]].astype(np.int64)])
            for i in idx}
        log(f"--- {name}: nnz={nnz} rows={m.rows}")
        for force in forces:
            try:
                t0 = time.time()
                op = SpmvOperator(m, force=force)
                pt = time.time() - t0
                log(f"{name} force={force} -> {op.format} "
                    f"cfg={getattr(op, '_stripe_cfg', None)} plan={pt:.1f}s")
                bench_one(f"{name}-auto-{force}", m, x, op, ref)
            except Exception as ex:
                log(f"{name} force={force} failed: {ex!r}")
        for mode, L, KW in grid:
            try:
                t0 = time.time()
                plan = plan_stripe(m, levels=L, kw=KW, mode=mode)
                arrs = stripe_device_arrays(plan)
                pt = time.time() - t0
                spn = plan.spill.nnz if plan.spill is not None else 0
                log(f"{name} stripe {mode}({L},{KW}): slabs={plan.num_slabs} "
                    f"fill={plan.fill:.2f} kw_g={plan.kw} "
                    f"spill={100.0*spn/max(nnz,1):.1f}% plan={pt:.1f}s")
                bench_one(
                    f"{name}-{mode}{L},{KW}", m, x,
                    lambda v, p=plan, a=arrs: spmv_stripe(
                        p, v, device_arrays=a), ref)
            except Exception as ex:
                log(f"{name} stripe {mode}({L},{KW}) failed: {ex!r}")


if __name__ == "__main__":
    main()
