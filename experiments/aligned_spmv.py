"""Round-2 experiment: 'aligned' LanePack variant.

Hypothesis: the general kernel's segmented-reduce machinery (MXU cumsum +
ends/starts boundary gathers, 4 of the 8 stream bytes/slot) is unnecessary
when slots are packed so that slot lane == destination row % 128. Entries of
row r within a 128-col window stack into "layers"; each chunk is
(rb, window, layer) and its products are already per-row contributions.

Variants measured on Poisson 512^2 (structure-friendly: high aligned fill)
and uniform-random 256k x 256k (adversarial: aligned fill collapses, general
path must carry it):

  gen-kwK-bB     current general kernel (baseline / kw sweep)
  ali-bB         aligned two-target accumulation (same accumulate as general)
  ali2-bB        aligned + 2 alternating y buffers (break the RMW chain)
  ali4-bB        aligned + 4 alternating y buffers
  alin-bB        aligned, staged output (no y accumulation at all): lower
                 bound for the compute path + cost of the RMW chain
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.formats.lanepack import plan_lanepack, SUBLANES, LANES
from sparse_matrix_tpu.ops.spmv import lanepack_device_arrays, _spmv_lanepack_jit, spmv_oracle

f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))

def lat():
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)


# --------------------------------------------------------------------------
# aligned planner (prototype)
# --------------------------------------------------------------------------

def plan_aligned(m, dtype=np.float32):
    rows, cols, nnz = m.rows, m.cols, m.nnz()
    r = m.row_ids().astype(np.int64)
    c = m.indices.astype(np.int64)
    v = m.vals.astype(dtype)
    order = np.lexsort((c, r))
    r, c, v = r[order], c[order], v[order]
    rb, dst = r // LANES, r % LANES
    w, xl = c // LANES, c % LANES
    # layer = occurrence index of (row, window)
    new_rw = np.r_[True, (r[1:] != r[:-1]) | (w[1:] != w[:-1])] if nnz else np.zeros(0, bool)
    start_rw = np.maximum.accumulate(np.where(new_rw, np.arange(nnz), 0))
    layer = np.arange(nnz) - start_rw
    Lmax = int(layer.max()) + 1 if nnz else 1
    W = cols // LANES + 2
    ck = (rb * W + w) * Lmax + layer
    o2 = np.argsort(ck, kind="stable")
    ck, rb, dst, w, xl, v = ck[o2], rb[o2], dst[o2], w[o2], xl[o2], v[o2]
    new_chunk = np.r_[True, ck[1:] != ck[:-1]] if nnz else np.zeros(0, bool)
    chunk_id = np.cumsum(new_chunk) - 1 if nnz else np.zeros(0, np.int64)
    head = np.nonzero(new_chunk)[0]
    head_rb = rb[head]
    head_w = w[head]
    num_chunks = len(head)

    # two-target slab packing (same rule as plan_lanepack)
    rb_change = np.r_[True, head_rb[1:] != head_rb[:-1]] if num_chunks else np.zeros(0, bool)
    counts = np.diff(np.append(np.nonzero(rb_change)[0], num_chunks)) if num_chunks else np.zeros(0, np.int64)
    uniq_rbs = head_rb[rb_change] if num_chunks else np.zeros(0, np.int64)
    chunk_slab = np.zeros(num_chunks, np.int64)
    chunk_sub = np.zeros(num_chunks, np.int64)
    meta = []
    cur = 0
    k = 0
    for rbi, cnt in zip(uniq_rbs, counts):
        cnt = int(cnt); placed = 0
        while placed < cnt:
            if cur == 0:
                meta.append([rbi, rbi, SUBLANES])
            elif meta[-1][1] != rbi:
                if meta[-1][0] != meta[-1][1]:
                    cur = 0; meta.append([rbi, rbi, SUBLANES])
                else:
                    meta[-1][1] = rbi; meta[-1][2] = cur
            take = min(cnt - placed, SUBLANES - cur)
            sl = len(meta) - 1
            chunk_slab[k:k + take] = sl
            chunk_sub[k:k + take] = np.arange(cur, cur + take)
            k += take; placed += take; cur = (cur + take) % SUBLANES
    S = len(meta)
    vals_s = np.zeros((S, SUBLANES, LANES), dtype)
    lane_s = np.zeros((S, SUBLANES, LANES), np.int8)
    col_off = np.zeros(max(S, 1) * SUBLANES, np.int32)
    ma = np.asarray(meta, np.int32) if S else np.zeros((0, 3), np.int32)
    rb_a = np.zeros(max(S, 1), np.int32); rb_b = np.zeros(max(S, 1), np.int32)
    split = np.full(max(S, 1), SUBLANES, np.int32)
    if S:
        rb_a[:S], rb_b[:S], split[:S] = ma[:, 0], ma[:, 1], ma[:, 2]
    if nnz:
        so, su = chunk_slab[chunk_id], chunk_sub[chunk_id]
        vals_s[so, su, dst] = v
        lane_s[so, su, dst] = xl.astype(np.int8)
        col_off[chunk_slab * SUBLANES + chunk_sub] = head_w.astype(np.int32)
    r128 = -(-rows // LANES)
    rb_mask = np.zeros(r128, dtype)
    if nnz:
        rb_mask[np.unique(head_rb)] = 1
    return dict(vals=vals_s, lane=lane_s, col_off=col_off, rb_a=rb_a, rb_b=rb_b,
                split=split, rb_mask=rb_mask, rows=rows, cols=cols, nnz=nnz, S=S)


def aligned_device_arrays(plan, b):
    S = plan["S"]
    sp = max(b, -(-S // b) * b)
    def pad(a):
        if a.shape[0] == sp: return jnp.asarray(a)
        out = np.zeros((sp,) + a.shape[1:], a.dtype); out[:a.shape[0]] = a
        return jnp.asarray(out)
    def pad1(a, fill, n):
        out = np.full(n, fill, a.dtype); out[:min(len(a), n)] = a[:n] if len(a) >= n else a
        return jnp.asarray(out)
    return dict(
        vals=pad(plan["vals"]), lane=pad(plan["lane"]),
        rb_a=pad1(plan["rb_a"][:S], 0, sp), rb_b=pad1(plan["rb_b"][:S], 0, sp),
        split=pad1(plan["split"][:S], SUBLANES, sp),
        col_off=pad1(plan["col_off"][:S * SUBLANES], 0, sp * SUBLANES),
        rb_mask=jnp.asarray(plan["rb_mask"]),
    )


def make_aligned_kernel(b, nbuf, staged):
    def kernel(rb_a_ref, rb_b_ref, split_ref, col_off_ref, x_ref, vals_ref, lane_ref, y_ref):
        i = pl.program_id(0)
        if not staged:
            @pl.when(i == 0)
            def _():
                y_ref[...] = jnp.zeros_like(y_ref)
        base = i * b * SUBLANES
        xw = jnp.concatenate(
            [x_ref[pl.ds(col_off_ref[base + j], 1), :] for j in range(b * SUBLANES)], axis=0
        )
        lane = lane_ref[...].reshape(b * SUBLANES, LANES).astype(jnp.int32)
        p = vals_ref[...].reshape(b * SUBLANES, LANES) * jnp.take_along_axis(xw, lane, axis=1)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
        for bb in range(b):
            c8 = p[bb * SUBLANES:(bb + 1) * SUBLANES]
            total = jnp.sum(c8, axis=0, keepdims=True)
            sp = split_ref[i * b + bb]
            pa = jnp.sum(jnp.where(sub_iota < sp, c8, 0.0), axis=0, keepdims=True)
            if staged:
                y_ref[bb, 0:1, :] = pa
                y_ref[bb, 1:2, :] = total - pa
            elif nbuf == 1:
                y_ref[pl.ds(rb_a_ref[i * b + bb], 1), :] += pa
                y_ref[pl.ds(rb_b_ref[i * b + bb], 1), :] += total - pa
            else:
                buf = bb % nbuf
                y_ref[buf, pl.ds(rb_a_ref[i * b + bb], 1), :] += pa
                y_ref[buf, pl.ds(rb_b_ref[i * b + bb], 1), :] += total - pa
    return kernel


def spmv_aligned(arrs, x, rows, cols, b, nbuf=1, staged=False):
    r128 = -(-rows // LANES); c128 = -(-cols // LANES)
    S = arrs["vals"].shape[0]
    xpad = jnp.zeros((c128 + 1) * LANES, x.dtype).at[:x.shape[0]].set(x)
    x2d = xpad.reshape(c128 + 1, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S // b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((b, SUBLANES, LANES), lambda i, *r_: (i, 0, 0))] * 2,
        out_specs=(
            pl.BlockSpec((b, 2, LANES), lambda i, *r_: (i, 0, 0))
            if staged
            else pl.BlockSpec(memory_space=pltpu.VMEM)
        ),
    )
    if staged:
        out_shape = jax.ShapeDtypeStruct((S, 2, LANES), x.dtype)
    elif nbuf == 1:
        out_shape = jax.ShapeDtypeStruct((r128, LANES), x.dtype)
    else:
        out_shape = jax.ShapeDtypeStruct((nbuf, r128, LANES), x.dtype)
    y = pl.pallas_call(
        make_aligned_kernel(b, nbuf, staged), grid_spec=grid_spec, out_shape=out_shape
    )(arrs["rb_a"], arrs["rb_b"], arrs["split"], arrs["col_off"], x2d, arrs["vals"], arrs["lane"])
    if staged:
        return jnp.sum(y[:, 0, :]) + jnp.sum(y[:, 1, :])  # fold elided: lower-bound probe
    if nbuf > 1:
        y = jnp.sum(y, axis=0)
    y = jnp.where(arrs["rb_mask"][:, None] > 0, y, 0.0)
    return y.reshape(-1)[:rows]


def measure(name, fn, xj, nnz, iters=3000, scalar_out=False):
    @jax.jit
    def loop(x):
        if scalar_out:
            # staged probe returns a scalar; keep a data dependency
            return jax.lax.fori_loop(0, iters, lambda i, v: v * 0.0 + fn(xj) * 1e-30, jnp.float32(0))
        return jax.lax.fori_loop(0, iters, lambda i, v: fn(v) * 0.2, x)
    t0 = time.perf_counter()
    _ = float(jnp.sum(loop(xj if not scalar_out else xj)))
    comp = time.perf_counter() - t0
    l0 = lat(); runs = []
    for _ in range(4):
        t0 = time.perf_counter(); _ = float(jnp.sum(loop(xj))); runs.append(time.perf_counter() - t0)
    l0 = min(l0, lat())
    per = (min(runs) - l0) / iters
    print(f"{name}: compile={comp:.0f}s {per*1e3:.4f} ms -> {nnz/per/1e9:.1f} Gnnz/s", flush=True)
    return per


def uniform_csr(n, nnz_per_row, seed=0):
    rng = np.random.default_rng(seed)
    nnz = n * nnz_per_row
    r = np.repeat(np.arange(n, dtype=np.int64), nnz_per_row)
    c = rng.integers(0, n, size=nnz).astype(np.int64)
    # dedupe (r,c)
    key = r * n + c
    key = np.unique(key)
    r, c = key // n, key % n
    v = rng.standard_normal(len(r)).astype(np.float32)
    offs = np.zeros(n + 1, np.int64)
    np.add.at(offs, r + 1, 1)
    np.cumsum(offs, out=offs)
    return CsrMatrix(n, n, v, c.astype(np.uint32), offs, is_sorted=True)


def run_case(tag, A, variants):
    nnz = A.nnz()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.cols).astype(np.float32)
    xj = jnp.asarray(x)
    print(f"=== {tag}: rows={A.rows} nnz={nnz}", flush=True)
    apl = plan_aligned(A)
    afill = nnz / max(1, apl['S']) / 1024
    print(f"aligned plan: S={apl['S']} fill={afill:.3f}", flush=True)
    if afill > 0.3:
        # correctness check of the aligned kernel (nbuf=2)
        arrs = aligned_device_arrays(apl, 8)
        y = np.asarray(spmv_aligned(arrs, xj, A.rows, A.cols, 8, nbuf=2))
        yref = spmv_oracle(A, x)
        err = np.max(np.abs(y - yref)) / max(1.0, np.max(np.abs(yref)))
        print(f"aligned correctness vs oracle: rel-max-err {err:.2e}", flush=True)
    else:
        variants = [v for v in variants if not v[0].startswith("ali")]
    for v in variants:
        kind, b = v
        if kind.startswith("gen"):
            kw = int(kind[6:]) if len(kind) > 6 else None
            plan = plan_lanepack(A, kw=kw)
            ar = lanepack_device_arrays(plan, b=b)
            st = {k: w for k, w in ar.items() if k != "b"}
            fn = lambda x_: _spmv_lanepack_jit(st, x_, rows=A.rows, cols=A.cols, kw=plan.kw, b=b, interpret=False, pack=plan.pack)
            measure(f"{kind}-b{b} (S={plan.num_slabs} fill={plan.fill:.2f} kw={plan.kw})", fn, xj, nnz)
        else:
            nbuf = {"ali": 1, "ali2": 2, "ali4": 4, "alin": 1}[kind]
            staged = kind == "alin"
            ar = aligned_device_arrays(apl, b)
            fn = lambda x_: spmv_aligned(ar, x_, A.rows, A.cols, b, nbuf=nbuf, staged=staged)
            if staged:
                measure(f"{kind}-b{b}", fn, xj, nnz, scalar_out=True)
            else:
                measure(f"{kind}-b{b}", fn, xj, nnz)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "poisson"
    if which == "poisson":
        A = poisson_2d_csr(512)
        run_case("poisson512", A, [
            ("gen-kw1", 64), ("ali", 64), ("ali2", 64), ("ali4", 64), ("alin", 64), ("ali2", 128),
        ])
    else:
        A = uniform_csr(1 << 18, 10)
        run_case("uniform256k", A, [
            ("gen-kw1", 64), ("gen-kw4", 64), ("gen-kw8", 64), ("gen-kw16", 32), ("ali2", 64),
        ])
