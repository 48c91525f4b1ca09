"""Carry-forward-ends LanePack variant: single boundary gather, no starts
array (7B/slot). Chunk capacity 127 (slot 0 is a zero dummy so C[0]=0)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.formats.lanepack import SUBLANES, LANES
from sparse_matrix_tpu.ops.spmv import _lane_cumsum_mxu, ell_from_csr, spmv_ell_xla

CAP = LANES - 1  # products per chunk; slot 0 is the dummy zero
B = 64

def plan_carry(m, kw=1):
    rows, cols = m.rows, m.cols
    nnz = m.nnz()
    r = m.row_ids(); c = m.indices.astype(np.int64); v = m.vals.astype(np.float32)
    rb = r // LANES; dst = (r % LANES).astype(np.int64)
    w = c // (kw * LANES); lane = (c % (kw * LANES)).astype(np.int64)
    order = np.lexsort((dst, w, rb))
    rb, dst, w, lane, v = rb[order], dst[order], w[order], lane[order], v[order]
    gk = rb * (cols // (kw * LANES) + 2) + w
    ng = np.r_[True, gk[1:] != gk[:-1]]
    gs = np.maximum.accumulate(np.where(ng, np.arange(nnz), 0))
    kin = np.arange(nnz) - gs
    pos = kin % CAP + 1          # slots 1..127
    chead = (kin % CAP) == 0
    cid = np.cumsum(chead) - 1
    head_rb = rb[chead]
    nch = len(head_rb)
    # dense two-rb packing (same as production)
    rbch = np.r_[True, head_rb[1:] != head_rb[:-1]] if nch else np.zeros(0, bool)
    counts = np.diff(np.append(np.nonzero(rbch)[0], nch)) if nch else np.zeros(0, np.int64)
    uniq = head_rb[rbch] if nch else np.zeros(0, np.int64)
    chunk_slab = np.zeros(nch, np.int64); chunk_sub = np.zeros(nch, np.int64)
    meta = []; fill = 0; k = 0
    for rbi, cnt in zip(uniq, counts):
        cnt = int(cnt); placed = 0
        while placed < cnt:
            if fill == 0: meta.append([rbi, rbi, SUBLANES])
            elif meta[-1][1] != rbi:
                if meta[-1][0] != meta[-1][1]:
                    fill = 0; meta.append([rbi, rbi, SUBLANES])
                else:
                    meta[-1][1] = rbi; meta[-1][2] = fill
            take = min(cnt - placed, SUBLANES - fill)
            sl = len(meta) - 1
            chunk_slab[k:k+take] = sl
            chunk_sub[k:k+take] = np.arange(fill, fill+take)
            k += take; placed += take; fill = (fill + take) % SUBLANES
    S = len(meta)
    vals = np.zeros((S, SUBLANES, LANES), np.float32)
    lanes_ = np.zeros((S, SUBLANES, LANES), np.int16)
    ends = np.zeros((S, SUBLANES, LANES), np.int8)
    co = np.zeros(S*SUBLANES, np.int32)
    so = chunk_slab[cid]; su = chunk_sub[cid]
    vals[so, su, pos] = v
    lanes_[so, su, pos] = lane.astype(np.int16)
    co[chunk_slab*SUBLANES + chunk_sub] = (w[chead] * kw).astype(np.int32)
    rh = np.r_[True, (dst[1:] != dst[:-1]) | (cid[1:] != cid[:-1])]
    rt = np.r_[rh[1:], True]
    t = np.nonzero(rt)[0]
    ends[so[t], su[t], dst[t]] = pos[t].astype(np.int8)
    ends = np.maximum.accumulate(ends, axis=-1)   # carry forward
    meta = np.asarray(meta, np.int32)
    r128 = -(-rows // LANES)
    rbm = np.zeros(r128, np.float32); rbm[np.unique(head_rb)] = 1
    return dict(vals=vals, lane=lanes_, ends=ends, co=co,
                rb_a=meta[:,0].copy(), rb_b=meta[:,1].copy(), split=meta[:,2].copy(),
                rb_mask=rbm, S=S, r128=r128, c128=-(-cols // LANES))

A = poisson_2d_csr(512)
P = plan_carry(A)
S = P["S"]; Sp = -(-S // B) * B
def padS(a, fill=0):
    out = np.full((Sp,)+a.shape[1:], fill, a.dtype); out[:a.shape[0]] = a; return out
vals = jnp.asarray(padS(P["vals"])); lane = jnp.asarray(padS(P["lane"]))
ends = jnp.asarray(padS(P["ends"]))
rb_a = jnp.asarray(np.r_[P["rb_a"], np.zeros(Sp-S, np.int32)].astype(np.int32))
rb_b = jnp.asarray(np.r_[P["rb_b"], np.zeros(Sp-S, np.int32)].astype(np.int32))
split = jnp.asarray(np.r_[P["split"], np.full(Sp-S, 8, np.int32)].astype(np.int32))
co = jnp.asarray(np.r_[P["co"], np.zeros((Sp-S)*8, np.int32)].astype(np.int32))
r128, c128 = P["r128"], P["c128"]

def kernel(rb_a_ref, rb_b_ref, split_ref, co_ref, x_ref, vals_ref, lane_ref, ends_ref, y_ref):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)
    base = i*B*SUBLANES
    xw = jnp.concatenate([x_ref[pl.ds(co_ref[base+j],1),:] for j in range(B*SUBLANES)], axis=0)
    ln = lane_ref[...].reshape(B*SUBLANES, LANES).astype(jnp.int32)
    v = vals_ref[...].reshape(B*SUBLANES, LANES)
    p = v*jnp.take_along_axis(xw, ln, axis=1)
    csum = _lane_cumsum_mxu(p)
    e = ends_ref[...].reshape(B*SUBLANES, LANES).astype(jnp.int32)
    E = jnp.take_along_axis(csum, e, axis=1)
    li = jax.lax.broadcasted_iota(jnp.int32, E.shape, 1)
    contrib = E - jnp.where(li == 0, 0.0, pltpu.roll(E, 1, axis=1))
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
    for bb in range(B):
        c8 = contrib[bb*SUBLANES:(bb+1)*SUBLANES]
        total = jnp.sum(c8, axis=0, keepdims=True)
        sp = split_ref[i*B+bb]
        part_a = jnp.sum(jnp.where(sub_iota < sp, c8, 0.0), axis=0, keepdims=True)
        y_ref[pl.ds(rb_a_ref[i*B+bb],1), :] += part_a
        y_ref[pl.ds(rb_b_ref[i*B+bb],1), :] += total - part_a

@jax.jit
def spmv(x):
    xpad = jnp.zeros((c128+1)*LANES, x.dtype).at[:x.shape[0]].set(x)
    x2d = xpad.reshape(c128+1, LANES)
    gs = pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=4, grid=(Sp//B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [pl.BlockSpec((B,SUBLANES,LANES), lambda i,*r:(i,0,0))]*3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    y = pl.pallas_call(kernel, grid_spec=gs, out_shape=jax.ShapeDtypeStruct((r128, LANES), jnp.float32))(
        rb_a, rb_b, split, co, x2d, vals, lane, ends)
    y = jnp.where(jnp.asarray(P["rb_mask"])[:, None] > 0, y, 0.0)
    return y.reshape(-1)[:A.rows]

rng = np.random.default_rng(0)
xj = jnp.asarray(rng.standard_normal(A.cols).astype(np.float32))
y = np.asarray(spmv(xj))
ev, ec = ell_from_csr(A)
y_ref = np.asarray(spmv_ell_xla(jnp.asarray(ev), jnp.asarray(ec), xj))
err = np.abs(y-y_ref).max()
f0 = jax.jit(lambda s: s+1.0); _=float(f0(jnp.float32(0)))
def lat():
    ls=[]
    for _ in range(5):
        t0=time.perf_counter(); _=float(f0(jnp.float32(0))); ls.append(time.perf_counter()-t0)
    return min(ls)
iters=3000
@jax.jit
def loop(x):
    return jax.lax.fori_loop(0, iters, lambda i,v: spmv(v)*0.2, x)
_=float(jnp.sum(loop(xj)))
l0=lat()
runs=[]
for _ in range(4):
    t0=time.perf_counter(); _=float(jnp.sum(loop(xj))); runs.append(time.perf_counter()-t0)
l0=min(l0,lat())
per=(min(runs)-l0)/iters
print(f"carry-ends B={B}: slabs={S} err={err:.1e} {per*1e3:.4f} ms -> {A.nnz()/per/1e9:.1f} Gnnz/s", flush=True)
