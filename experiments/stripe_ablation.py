"""Staged-core ablation of the stripe kernel (VERDICT r3 #1's floor-proof
format): progressively enable kernel stages on the best randlocal/powerlaw
configs so each stage's per-slab cost is measured, PERF.md-aligned-table
style. Stages:

  A  x-window loads only (b*8 dynamic (kw,128) slices, summed)
  B  + lane gather(s) + multiply
  C  + MXU prefix scan
  D  + level boundary gathers + sublane sums (no y accumulate)
  E  full kernel (+ per-slab (lvl,128) dynamic accumulates)

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/stripe_ablation.py > experiments/stripe_ablation.out 2>&1 &
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def make_staged_kernel(b, lvl, kw, stage, nbuf=2):
    from jax.experimental import pallas as pl

    from sparse_matrix_tpu.formats.lanepack import LANES, SUBLANES
    from sparse_matrix_tpu.ops.spmv import _lane_cumsum_mxu

    def kernel(stripe_rb_ref, col_off_ref, x_ref, vals_ref, lane_ref,
               ends_ref, starts_ref, y_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        base = i * b * SUBLANES
        xw = jnp.concatenate(
            [x_ref[pl.ds(col_off_ref[base + j], kw), :]
             for j in range(b * SUBLANES)],
            axis=0,
        ).reshape(b * SUBLANES, kw, LANES)
        if stage == "A":
            y_ref[0, pl.ds(stripe_rb_ref[i * b], lvl), :] += jnp.sum(
                xw, axis=(0, 1), keepdims=False)[None, :] * 1e-30
            return
        lane = lane_ref[...].reshape(b * SUBLANES, LANES).astype(jnp.int32)
        v = vals_ref[...].reshape(b * SUBLANES, LANES)
        if kw == 1:
            xg = jnp.take_along_axis(xw[:, 0, :], lane, axis=1)
        else:
            sub = jax.lax.shift_right_logical(lane, 7)
            l = jax.lax.bitwise_and(lane, 127)
            xg = jnp.zeros_like(v)
            for k in range(kw):
                g = jnp.take_along_axis(xw[:, k, :], l, axis=1)
                xg = xg + jnp.where(sub == k, g, 0.0)
        p = v * xg
        if stage == "B":
            y_ref[0, pl.ds(stripe_rb_ref[i * b], lvl), :] += jnp.sum(
                p, axis=0, keepdims=True) * 1e-30
            return
        c = _lane_cumsum_mxu(p)
        if stage == "C":
            y_ref[0, pl.ds(stripe_rb_ref[i * b], lvl), :] += jnp.sum(
                c, axis=0, keepdims=True) * 1e-30
            return
        levels = []
        for l in range(lvl):
            ends = ends_ref[:, l].reshape(b * SUBLANES, LANES).astype(
                jnp.int32)
            starts = starts_ref[:, l].reshape(b * SUBLANES, LANES).astype(
                jnp.int32)
            g_end = jnp.take_along_axis(c, ends, axis=1)
            g_start = jnp.where(
                starts < 0, 0.0,
                jnp.take_along_axis(c, jnp.maximum(starts, 0), axis=1))
            levels.append(jnp.sum(
                (g_end - g_start).reshape(b, SUBLANES, LANES), axis=1))
        contrib_all = jnp.stack(levels, axis=1)  # (b, lvl, 128)
        if stage == "D":
            y_ref[0, pl.ds(stripe_rb_ref[i * b], lvl), :] += jnp.sum(
                contrib_all, axis=0) * 1e-30
            return
        for bb in range(b):
            buf = bb % nbuf
            y_ref[buf, pl.ds(stripe_rb_ref[i * b + bb], lvl), :] += (
                contrib_all[bb])

    return kernel


def run_stage(plan, arrs, x, stage):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sparse_matrix_tpu.bench.runner import bench_device_loop
    from sparse_matrix_tpu.formats.lanepack import LANES, SUBLANES

    b = arrs["b"]
    lvl, kw = plan.levels, plan.kw
    c128 = -(-plan.cols // LANES)
    num_slabs = arrs["vals"].shape[0]
    r128p = arrs["rb_mask"].shape[0]

    @functools.partial(jax.jit, static_argnames=("stage",))
    def apply(xv, *, stage):
        xpad = jnp.zeros((c128 + kw) * LANES, xv.dtype).at[
            : xv.shape[0]].set(xv)
        x2d = xpad.reshape(c128 + kw, LANES)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_slabs // b,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((b, SUBLANES, LANES),
                            lambda i, *r: (i, 0, 0))] * 2
            + [pl.BlockSpec((b, lvl, SUBLANES, LANES),
                            lambda i, *r: (i, 0, 0, 0))] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        y = pl.pallas_call(
            make_staged_kernel(b, lvl, kw, stage),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, r128p, LANES), xv.dtype),
        )(arrs["stripe_rb"], arrs["col_off"], x2d, arrs["vals"],
          arrs["lane"], arrs["ends"], arrs["starts"])
        return jnp.sum(y, axis=0).reshape(-1)[: plan.rows]

    r = bench_device_loop(
        f"stage{stage}", lambda v: apply(v, stage=stage) * 0.2 + v * 0.8,
        x, iters=600)
    return r


def main():
    from sparse_matrix_tpu.bench.corpus import _power_law_rows, _random_local
    from sparse_matrix_tpu.formats.stripe import plan_stripe
    from sparse_matrix_tpu.ops.spmv import stripe_device_arrays

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    cases = [
        ("randlocal_262k", _random_local(rng, 1 << 18, 16, 4096), 2, 4),
        ("powerlaw_262k", _power_law_rows(rng, 1 << 18, 16), 8, 16),
    ]
    for name, m, L, KW in cases:
        plan = plan_stripe(m, levels=L, kw=KW)
        arrs = stripe_device_arrays(plan)
        x = jnp.asarray(rng.standard_normal(m.cols).astype(np.float32))
        log(f"--- {name} L={L} KW={KW}: slabs={plan.num_slabs} "
            f"fill={plan.fill:.2f}")
        prev = 0.0
        for stage in ("A", "B", "C", "D", "E"):
            try:
                r = run_stage(plan, arrs, x, stage)
                ns = r.seconds * 1e9 / plan.num_slabs
                log(f"{name} stage {stage}: {r.seconds*1e6:8.1f} us  "
                    f"{ns:6.1f} ns/slab  (+{ns - prev:5.1f})")
                prev = ns
            except Exception as e:
                log(f"{name} stage {stage} failed: {e!r}")


if __name__ == "__main__":
    main()
