"""Isolate the BELL kernel's per-chunk cost components (VERDICT r2 item 1:
femlike >= 60% of roofline needs 49.5 -> <=37 us, i.e. ~137-147 ns/chunk
-> <=110).

Variants on a femlike-shaped synthetic (L=21 layers over 9 distinct d,
fill=1, n=2^18 rows, br=256):
  K0  current kernel (i8 lane plane -> astype -> take_along_axis -> fma)
  K1  no gather (acc += vals * a)            : gather + lane-plane cost
  K1b no gather, no lane DMA (DIA-equiv)     : pure streaming upper bound
  K2  lane stored as i32 planes (no astype)  : astype vs extra DMA
  K3  bf16 vals (3 B/slot), gather as K0     : DMA-bound would speed up

ns/chunk = t / (L * r128p / 128). DMA-bound predicts K3 < K0 ~ K2;
VPU-bound predicts K0 ~ K3 and K1 much faster.
"""
import sys

sys.path.insert(0, "/root/repo")
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_matrix_tpu.bench.runner import bench_device_loop

LANES = 128
N = 1 << 18
R128 = N // LANES  # 2048
L = 21
BR = 256
DS = tuple(sorted([-4, -4, -4, -3, -3, -1, -1, -1, 0, 0, 0, 0, 0, 1, 1, 1, 3, 3, 4, 4, 4]))
assert len(DS) == L

rng = np.random.default_rng(0)
vals_f32 = rng.standard_normal((L, R128, LANES)).astype(np.float32)
lane_i8 = rng.integers(0, LANES, (L, R128, LANES)).astype(np.int8)

lo = 4
win = lo + BR + 4
win += (-win) % 8
total = (R128 // BR - 1) * BR + win
hi = total - lo - R128


def x2d_of(x):
    return jnp.concatenate(
        [jnp.zeros((lo, LANES), x.dtype), x.reshape(R128, LANES), jnp.zeros((hi, LANES), x.dtype)],
        axis=0,
    )


def make_call(kernel, lane_arr, vdt):
    specs = [
        pl.BlockSpec((L, BR, LANES), lambda i: (0, i, 0)),
    ]
    args = [vals_f32.astype(vdt)]
    if lane_arr is not None:
        specs.append(pl.BlockSpec((L, BR, LANES), lambda i: (0, i, 0)))
        args.append(lane_arr)
    specs.append(pl.BlockSpec((pl.Element(win), pl.Element(LANES)), lambda i: (i * BR, 0)))
    args = [jnp.asarray(a) for a in args]

    @jax.jit
    def run(x):
        y2 = pl.pallas_call(
            kernel,
            grid=(R128 // BR,),
            in_specs=specs,
            out_specs=pl.BlockSpec((BR, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R128, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(*args, x2d_of(x))
        return y2.reshape(-1)

    return run


def k0(vals_ref, lane_ref, x_ref, y_ref):
    acc = jnp.zeros((BR, LANES), jnp.float32)
    prev_d, a = None, None
    for li, d in enumerate(DS):
        if d != prev_d:
            a = x_ref[pl.ds(lo + d, BR), :]
            prev_d = d
        xg = jnp.take_along_axis(a, lane_ref[li].astype(jnp.int32), axis=1)
        acc = acc + vals_ref[li].astype(jnp.float32) * xg
    y_ref[...] = acc


def k1(vals_ref, lane_ref, x_ref, y_ref):
    acc = jnp.zeros((BR, LANES), jnp.float32)
    prev_d, a = None, None
    for li, d in enumerate(DS):
        if d != prev_d:
            a = x_ref[pl.ds(lo + d, BR), :]
            prev_d = d
        acc = acc + vals_ref[li].astype(jnp.float32) * a
    y_ref[...] = acc


def k1b(vals_ref, x_ref, y_ref):
    acc = jnp.zeros((BR, LANES), jnp.float32)
    prev_d, a = None, None
    for li, d in enumerate(DS):
        if d != prev_d:
            a = x_ref[pl.ds(lo + d, BR), :]
            prev_d = d
        acc = acc + vals_ref[li].astype(jnp.float32) * a
    y_ref[...] = acc


def k2(vals_ref, lane_ref, x_ref, y_ref):
    acc = jnp.zeros((BR, LANES), jnp.float32)
    prev_d, a = None, None
    for li, d in enumerate(DS):
        if d != prev_d:
            a = x_ref[pl.ds(lo + d, BR), :]
            prev_d = d
        xg = jnp.take_along_axis(a, lane_ref[li], axis=1)
        acc = acc + vals_ref[li].astype(jnp.float32) * xg
    y_ref[...] = acc


variants = [
    ("K0_current", k0, lane_i8, np.float32),
    ("K1_nogather", k1, lane_i8, np.float32),
    ("K1b_dia_equiv", k1b, None, np.float32),
    ("K2_lane_i32", k2, lane_i8.astype(np.int32), np.float32),
    ("K3_bf16vals", k0, lane_i8, jnp.bfloat16),
]

print("backend:", jax.default_backend(), flush=True)
chunks = L * R128 / 128
x0 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
for name, kern, lane_arr, vdt in variants:
    run = make_call(kern, lane_arr, vdt)
    r = bench_device_loop(name, lambda v: run(v) * 1e-6, x0)
    t = r.seconds
    slot_b = (4 if vdt == np.float32 else 2) + (0 if lane_arr is None else lane_arr.dtype.itemsize)
    streamed = L * R128 * LANES * slot_b + (R128 // BR) * win * LANES * 4
    print(
        f"{name:16s}: {t*1e6:8.1f} us  {t*1e9/chunks:7.2f} ns/chunk  "
        f"streamed {streamed/t/1e9:6.0f} GB/s  iters={r.iters}",
        flush=True,
    )
