"""Close the claimed-vs-shipped gap on the scatter/skew classes
(VERDICT r4 weak #3 / next #3): the driver bench lands powerlaw_262k at
1.28 ms where the stripe family's own grid argmin was claimed ~820-870 us,
and randlocal_262k at 16.2 Gnnz/s vs the claimed 17.9 select-mode win.

This run decides WHICH is wrong:
  1. the auto-dispatched operator (exactly bench.py's path) end to end;
  2. the full stripe (mode, L, KW) measured grid with the cost model's
     prediction per config alongside (model drift is visible directly);
  3. forced lanepack / aligned / ell routes.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/skew_dispatch_r5.py > experiments/skew_dispatch_r5.out 2>&1 &
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
    from sparse_matrix_tpu.formats.stripe import (
        _cost_constants, _mode_cost, plan_stripe,
    )
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.ops.spmv import spmv_stripe, stripe_device_arrays

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    cases = [
        ("randlocal_262k", _random_local(rng, 1 << 18, 16, 4096)),
        ("powerlaw_262k", _power_law_rows(rng, 1 << 18, 16)),
    ]
    for name, m in cases:
        nnz = m.nnz()
        x = jnp.asarray(rng.standard_normal(m.cols).astype(np.float32))
        xh = np.asarray(x)
        idx = rng.choice(m.rows, 64, replace=False)
        ref = {int(i): float(
            m.vals[m.offsets[i]:m.offsets[i + 1]].astype(np.float64)
            @ xh[m.indices[m.offsets[i]:m.offsets[i + 1]].astype(np.int64)])
            for i in idx}

        def check(y):
            return [(i, float(y[i]), r0) for i, r0 in ref.items()
                    if abs(float(y[i]) - r0) > 1e-2 * max(1.0, abs(r0))]

        log(f"--- {name}: nnz={nnz} rows={m.rows}")

        # 1. the shipped auto dispatch (bench.py's exact route)
        for force in (None, "lanepack", "aligned", "ell"):
            try:
                t0 = time.time()
                op = SpmvOperator(m, force=force)
                pt = time.time() - t0
                y = np.asarray(op(x))
                bad = check(y)
                if bad:
                    log(f"{name} force={force}: FAIL {bad[:2]}")
                    continue
                r = bench_device_loop(
                    f"{name}-{force}", lambda v: op(v) * 0.2, x, iters=600)
                log(f"{name} force={force} -> {op.format}: "
                    f"{r.seconds*1e6:.1f} us -> {nnz/r.seconds/1e9:.2f} "
                    f"Gnnz/s (plan {pt:.1f}s, iters={r.iters})")
            except Exception as ex:
                log(f"{name} force={force} failed: {ex!r}")

        # 2. stripe measured grid vs model prediction
        consts = _cost_constants()
        best = (None, None)
        for mode in ("scan", "select"):
            for L in (2, 4, 8):
                for KW in (1, 2, 4, 8, 16):
                    if KW > 1 and (KW // 2) * 128 > m.cols + 128:
                        continue
                    try:
                        pred = _mode_cost(m, mode, L, KW, nnz, consts)
                        t0 = time.time()
                        plan = plan_stripe(m, levels=L, kw=KW, mode=mode)
                        arrs = stripe_device_arrays(plan)
                        pt = time.time() - t0
                        y = np.asarray(
                            spmv_stripe(plan, x, device_arrays=arrs))
                        bad = check(y)
                        if bad:
                            log(f"{name} stripe {mode} L={L} KW={KW}: "
                                f"FAIL {bad[:2]}")
                            continue
                        r = bench_device_loop(
                            "stripe",
                            lambda v: spmv_stripe(
                                plan, v, device_arrays=arrs) * 0.2,
                            x, iters=600)
                        us = r.seconds * 1e6
                        spn = plan.spill.nnz if plan.spill is not None else 0
                        log(f"{name} stripe {mode} L={L} KW={KW}: "
                            f"{us:.1f} us (model {pred/1e3:.1f} us) -> "
                            f"{nnz/r.seconds/1e9:.2f} Gnnz/s "
                            f"slabs={plan.num_slabs} fill={plan.fill:.2f} "
                            f"spill={100.0*spn/max(nnz,1):.1f}% "
                            f"plan={pt:.1f}s")
                        if best[0] is None or r.seconds < best[0]:
                            best = (r.seconds, (mode, L, KW))
                    except Exception as ex:
                        log(f"{name} stripe {mode} L={L} KW={KW} failed: "
                            f"{ex!r}")
        if best[0] is not None:
            log(f"{name} stripe grid argmin: {best[1]} at "
                f"{best[0]*1e6:.1f} us -> {nnz/best[0]/1e9:.2f} Gnnz/s")


if __name__ == "__main__":
    main()
