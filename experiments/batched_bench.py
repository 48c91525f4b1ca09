"""Batched same-pattern small systems on real TPU: one-hot MXU apply and
batched CG vs the one-at-a-time operator path (docs/PERF.md 'small
matrices are grid-overhead bound' — this is the fix).

Methodology: solver/apply jitted, min over repeats minus tunnel latency.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.ops import BatchedEllOperator, batched_cg_solve
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import cg_solve

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

def timed_scalar(fn, reps=5):
    out = fn(); jax.block_until_ready(out)
    lat = probe_latency(); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(); _ = float(jnp.ravel(out)[0])
        ts.append(time.perf_counter() - t0)
    return max(0.0, min(ts) - lat)

print("backend:", jax.default_backend(), flush=True)
p = poisson_2d_csr(16, dtype=np.float32)  # 256 unknowns, 1216 nnz
rng = np.random.default_rng(0)
print(f"pattern: {p.rows}x{p.cols}, nnz={p.nnz()}", flush=True)

# single-system baseline (the documented grid-overhead regime)
op1 = SpmvOperator(p, dtype=np.float32)
x1 = jnp.asarray(rng.standard_normal(p.cols).astype(np.float32))
CH = 100  # chain applies in one jit to avoid measuring only dispatch
@jax.jit
def chain_single(x):
    def body(_, v): return op1(v) * 1e-3
    return jax.lax.fori_loop(0, CH, body, x)
t1 = timed_scalar(lambda: chain_single(x1)) / CH
print(f"single operator ({op1.format}): {t1*1e6:7.2f} us/apply -> {p.nnz()/t1/1e9:.2f} Gnnz/s", flush=True)

for B in (64, 512, 4096):
    vals = np.stack([p.vals * s for s in (0.5 + rng.random(B))]).astype(np.float32)
    bop = BatchedEllOperator(p, vals, dtype=np.float32)
    X = jnp.asarray(rng.standard_normal((B, p.cols)).astype(np.float32))
    @jax.jit
    def chain_b(x):
        def body(_, v): return bop(v) * 1e-3
        return jax.lax.fori_loop(0, CH, body, x)
    t = timed_scalar(lambda: chain_b(X)) / CH
    g = B * p.nnz() / t / 1e9
    print(f"B={B:5d} batched apply (onehot={bop.use_onehot}): {t*1e6:8.2f} us/apply -> {g:7.1f} Gnnz/s ({g/(p.nnz()/t1/1e9):6.1f}x single)", flush=True)

# batched CG vs sequential CG loop
B = 512
vals = np.stack([p.vals * s for s in (0.5 + rng.random(B))]).astype(np.float32)
bop = BatchedEllOperator(p, vals, dtype=np.float32)
Brhs = jnp.asarray(rng.standard_normal((B, p.rows)).astype(np.float32))
jb = jax.jit(lambda bb: batched_cg_solve(bop, bb, tol=1e-5, maxiter=400))
res = jb(Brhs); jax.block_until_ready(res.x)
lat = probe_latency()
ts = []
for _ in range(4):
    t0 = time.perf_counter(); res = jb(Brhs); _ = float(jnp.max(res.residual_norm))
    ts.append(time.perf_counter() - t0)
tb = max(0.0, min(ts) - lat)
it_max = int(jnp.max(res.iterations))
# sequential: one representative solve x B
js = jax.jit(lambda bb: cg_solve(op1, bb, tol=1e-5, maxiter=400))
r1 = js(x1); jax.block_until_ready(r1.x)
ts = []
for _ in range(4):
    t0 = time.perf_counter(); r1 = js(x1); _ = float(r1.residual_norm)
    ts.append(time.perf_counter() - t0)
t_one = max(0.0, min(ts) - lat)
print(f"batched CG B={B}: {tb*1e3:.2f} ms total ({tb/B*1e6:.1f} us/system, max iters {it_max})", flush=True)
print(f"sequential estimate: {t_one*1e3:.2f} ms/system x {B} = {t_one*B*1e3:.0f} ms -> {t_one*B/tb:.0f}x", flush=True)
# correctness spot-check lane 7
dense = None
from sparse_matrix_tpu.formats import CsrMatrix
m7 = CsrMatrix(p.rows, p.cols, np.asarray(vals[7]), p.indices, p.offsets, is_sorted=True)
r7 = np.linalg.norm(m7.to_dense() @ np.asarray(res.x)[7] - np.asarray(Brhs)[7])
print(f"lane-7 residual {r7:.2e} (|b| {np.linalg.norm(np.asarray(Brhs)[7]):.2f})", flush=True)
