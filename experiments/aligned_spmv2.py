"""Decompose the aligned-kernel per-slab cost and test split-sum variants.

  alip   staged, write raw p block (loads+gather+mul+stream only)
  alint  staged, total sublane-sum only (adds the 8->1 reduce)
  ali2   reference: full two-target masked split, 2 y buffers (42.4 G)
  alimxu MXU segmented split: one SegMat matmul per step computes all
         2b partial sums; kernel RMWs partial rows into y (2 buffers)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.formats.lanepack import SUBLANES, LANES
sys.path.insert(0, "/root/repo/experiments")
from aligned_spmv import plan_aligned, aligned_device_arrays, lat, f0

A = poisson_2d_csr(512)
nnz = A.nnz()
rng = np.random.default_rng(0)
xj = jnp.asarray(rng.standard_normal(A.cols).astype(np.float32))
apl = plan_aligned(A)
S0 = apl["S"]
print(f"S={S0}", flush=True)


def make_kernel(b, mode):
    def kernel(rb_a_ref, rb_b_ref, split_ref, col_off_ref, x_ref, vals_ref, lane_ref, *rest):
        if mode == "mxu":
            seg_ref, y_ref = rest
        else:
            (y_ref,) = rest
        i = pl.program_id(0)
        if mode in ("ali2", "mxu"):
            @pl.when(i == 0)
            def _():
                y_ref[...] = jnp.zeros_like(y_ref)
        base = i * b * SUBLANES
        xw = jnp.concatenate(
            [x_ref[pl.ds(col_off_ref[base + j], 1), :] for j in range(b * SUBLANES)], axis=0
        )
        lane = lane_ref[...].reshape(b * SUBLANES, LANES).astype(jnp.int32)
        p = vals_ref[...].reshape(b * SUBLANES, LANES) * jnp.take_along_axis(xw, lane, axis=1)
        if mode == "p":
            y_ref[...] = p.reshape(b, SUBLANES, LANES)
            return
        if mode == "t":
            y_ref[...] = jnp.sum(p.reshape(b, SUBLANES, LANES), axis=1)
            return
        if mode == "mxu":
            # seg id per chunk (2 per slab: below/at-or-above split);
            # SegMat (2b, b*8) = onehot(seg); partials = SegMat @ p
            seg = seg_ref[0, :].astype(jnp.int32)  # (b*8,)
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (2 * b, b * SUBLANES), 0)
            segm = jnp.where(rows_i == seg[None, :], 1.0, 0.0)
            partials = jnp.dot(
                segm, p, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (2b, 128)
            for bb in range(b):
                buf = bb % 2
                y_ref[buf, pl.ds(rb_a_ref[i * b + bb], 1), :] += partials[2 * bb : 2 * bb + 1]
                y_ref[buf, pl.ds(rb_b_ref[i * b + bb], 1), :] += partials[2 * bb + 1 : 2 * bb + 2]
            return
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
        for bb in range(b):
            c8 = p[bb * SUBLANES:(bb + 1) * SUBLANES]
            total = jnp.sum(c8, axis=0, keepdims=True)
            sp = split_ref[i * b + bb]
            pa = jnp.sum(jnp.where(sub_iota < sp, c8, 0.0), axis=0, keepdims=True)
            buf = bb % 2
            y_ref[buf, pl.ds(rb_a_ref[i * b + bb], 1), :] += pa
            y_ref[buf, pl.ds(rb_b_ref[i * b + bb], 1), :] += total - pa
    return kernel


def run(mode, b, iters=3000):
    arrs = aligned_device_arrays(apl, b)
    S = arrs["vals"].shape[0]
    r128 = -(-A.rows // LANES); c128 = -(-A.cols // LANES)
    xpad = jnp.zeros((c128 + 1) * LANES, jnp.float32).at[: A.cols].set(xj)
    x2d = xpad.reshape(c128 + 1, LANES)
    n_in = 2
    extra_in = []
    if mode == "mxu":
        # per-chunk segment ids as a VMEM stream: (steps, b*8) int32
        split_h = np.asarray(arrs["split"])
        seg = np.zeros((S // b, b * SUBLANES), np.int32)
        for step in range(S // b):
            for bb in range(b):
                sp = split_h[step * b + bb]
                for s in range(SUBLANES):
                    seg[step, bb * SUBLANES + s] = 2 * bb + (1 if s >= sp else 0)
        extra_in = [jnp.asarray(seg)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] + [
        pl.BlockSpec((b, SUBLANES, LANES), lambda i, *r: (i, 0, 0))
    ] * 2
    if mode == "mxu":
        in_specs.append(pl.BlockSpec((1, b * SUBLANES), lambda i, *r: (i, 0)))
    if mode == "p":
        out_spec = pl.BlockSpec((b, SUBLANES, LANES), lambda i, *r: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((S, SUBLANES, LANES), jnp.float32)
    elif mode == "t":
        out_spec = pl.BlockSpec((b, LANES), lambda i, *r: (i, 0))
        out_shape = jax.ShapeDtypeStruct((S, LANES), jnp.float32)
    else:
        out_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2, r128, LANES), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(S // b,), in_specs=in_specs, out_specs=out_spec
    )
    kern = pl.pallas_call(make_kernel(b, mode), grid_spec=grid_spec, out_shape=out_shape)

    def apply(x_):
        xp = jnp.zeros((c128 + 1) * LANES, jnp.float32).at[: A.cols].set(x_)
        out = kern(arrs["rb_a"], arrs["rb_b"], arrs["split"], arrs["col_off"],
                   xp.reshape(c128 + 1, LANES), arrs["vals"], arrs["lane"], *extra_in)
        if mode in ("p", "t"):
            return jnp.sum(out) * 1e-30 + x_ * 0.0 + x_
        y = jnp.sum(out, axis=0)
        y = jnp.where(arrs["rb_mask"][:, None] > 0, y, 0.0)
        return y.reshape(-1)[: A.rows]

    if mode in ("ali2", "mxu"):
        # correctness
        from sparse_matrix_tpu.ops.spmv import spmv_oracle
        y = np.asarray(apply(xj))
        yr = spmv_oracle(A, np.asarray(xj))
        err = np.max(np.abs(y - yr)) / max(1.0, np.max(np.abs(yr)))
        print(f"{mode}-b{b} rel-max-err {err:.2e}", flush=True)

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: apply(v) * 0.2 if mode not in ("p", "t") else apply(v), x)
    t0 = time.perf_counter(); _ = float(jnp.sum(loop(xj))); comp = time.perf_counter() - t0
    l0 = lat(); runs = []
    for _ in range(4):
        t0 = time.perf_counter(); _ = float(jnp.sum(loop(xj))); runs.append(time.perf_counter() - t0)
    l0 = min(l0, lat())
    per = (min(runs) - l0) / iters
    print(f"{mode}-b{b}: compile={comp:.0f}s {per*1e3:.4f} ms -> {nnz/per/1e9:.1f} Gnnz/s "
          f"({per/ (S/ b) *1e9/b:.1f} ns/slab)", flush=True)


for mode, b in [("p", 64), ("t", 64), ("ali2", 64), ("mxu", 64)]:
    run(mode, b)
