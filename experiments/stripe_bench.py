"""Stripe kernel hardware sweep (VERDICT r3 #1): randlocal_262k and
powerlaw_262k across (L, KW) candidates vs the shipped dispatch.

Chained-jit timing (bench/runner.py). Run:
  nohup python experiments/stripe_bench.py > experiments/stripe_bench.out 2>&1 &
"""

import sys
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
    from sparse_matrix_tpu.ops.spmv import (
        spmv_stripe, spmv_oracle, stripe_device_arrays,
    )
    from sparse_matrix_tpu.ops.operator import SpmvOperator

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    cases = [
        ("randlocal_262k", _random_local(rng, 1 << 18, 16, 4096),
         [(2, 4), (4, 2), (4, 4), (2, 8), (4, 8)]),
        ("powerlaw_262k", _power_law_rows(rng, 1 << 18, 16),
         [(8, 16), (8, 8), (4, 16), (8, 32)]),
    ]
    for name, m, grid in cases:
        nnz = m.nnz()
        x = jnp.asarray(rng.standard_normal(m.cols).astype(np.float32))
        xh = np.asarray(x)
        ref = None
        log(f"--- {name}: nnz={nnz}")
        # current operator dispatch for comparison
        try:
            op = SpmvOperator(m)
            r = bench_device_loop("cur", lambda v: op(v) * 0.2, x, iters=600)
            log(f"{name} CURRENT ({op.format}): {r.seconds*1e6:.1f} us -> "
                f"{nnz/r.seconds/1e9:.2f} Gnnz/s (iters={r.iters})")
        except Exception as e:
            log(f"{name} current dispatch failed: {e!r}")
        for (L, KW) in grid:
            t0 = time.time()
            plan = plan_stripe(m, levels=L, kw=KW)
            arrs = stripe_device_arrays(plan)
            plan_t = time.time() - t0
            y = np.asarray(spmv_stripe(plan, x, device_arrays=arrs))
            if ref is None:
                idx = rng.choice(m.rows, 128, replace=False)
                ref = {int(i): float(
                    m.vals[m.offsets[i]:m.offsets[i + 1]].astype(np.float64)
                    @ xh[m.indices[m.offsets[i]:m.offsets[i + 1]].astype(np.int64)])
                    for i in idx}
            bad = [(i, float(y[i]), r0) for i, r0 in ref.items()
                   if abs(float(y[i]) - r0) > 1e-2 * max(1.0, abs(r0))]
            if bad:
                log(f"{name} L={L} KW={KW}: CORRECTNESS FAIL {bad[:3]}")
                continue
            r = bench_device_loop(
                "stripe",
                lambda v: spmv_stripe(plan, v, device_arrays=arrs) * 0.2,
                x, iters=600)
            ns_slab = r.seconds * 1e9 / plan.num_slabs
            log(f"{name} stripe L={L} KW={KW}: {r.seconds*1e6:.1f} us -> "
                f"{nnz/r.seconds/1e9:.2f} Gnnz/s  fill={plan.fill:.2f} "
                f"slabs={plan.num_slabs} ns/slab={ns_slab:.1f} "
                f"bytes/nnz={plan.slot_bytes()/nnz:.1f} plan={plan_t:.1f}s "
                f"iters={r.iters}")


if __name__ == "__main__":
    main()
