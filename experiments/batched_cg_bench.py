import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.ops import BatchedEllOperator, batched_cg_solve
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import poisson_2d_csr
from sparse_matrix_tpu.solvers.cg import cg_solve
from sparse_matrix_tpu.formats import CsrMatrix

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

print("backend:", jax.default_backend(), flush=True)
p = poisson_2d_csr(16, dtype=np.float32)
rng = np.random.default_rng(0)
B = 512
vals = np.stack([p.vals * s for s in (0.5 + rng.random(B))]).astype(np.float32)
bop = BatchedEllOperator(p, vals, dtype=np.float32)
Brhs = jnp.asarray(rng.standard_normal((B, p.rows)).astype(np.float32))
# chain R independent batched solves inside one jit for a resolvable time
R = 20
@jax.jit
def chained(bb):
    def body(i, acc):
        res = batched_cg_solve(bop, bb + acc * 1e-6, tol=1e-5, maxiter=400)
        return acc + jnp.max(res.residual_norm)
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))
out = chained(Brhs); _ = float(out)
lat = probe_latency(); ts = []
for _ in range(4):
    t0 = time.perf_counter(); _ = float(chained(Brhs)); ts.append(time.perf_counter() - t0)
tb = max(0.0, min(ts) - lat) / R
res = jax.jit(lambda bb: batched_cg_solve(bop, bb, tol=1e-5, maxiter=400))(Brhs)
it_max = int(jnp.max(res.iterations))
print(f"batched CG B={B}: {tb*1e3:.3f} ms/solve-of-512 ({tb/B*1e6:.2f} us/system, max iters {it_max})", flush=True)

op1 = SpmvOperator(p, dtype=np.float32)
x1 = jnp.asarray(np.asarray(Brhs)[0])
@jax.jit
def chained1(bb):
    def body(i, acc):
        r = cg_solve(op1, bb + acc * 1e-6, tol=1e-5, maxiter=400)
        return acc + r.residual_norm
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))
_ = float(chained1(x1))
ts = []
for _ in range(4):
    t0 = time.perf_counter(); _ = float(chained1(x1)); ts.append(time.perf_counter() - t0)
t1 = max(0.0, min(ts) - lat) / R
print(f"single CG: {t1*1e3:.3f} ms/system -> sequential 512 = {t1*512*1e3:.0f} ms -> {t1*512/tb:.0f}x", flush=True)
m7 = CsrMatrix(p.rows, p.cols, np.asarray(vals[7]), p.indices, p.offsets, is_sorted=True)
r7 = np.linalg.norm(m7.to_dense() @ np.asarray(res.x)[7] - np.asarray(Brhs)[7])
print(f"lane-7 residual {r7:.2e} (tol*|b| {1e-5*np.linalg.norm(np.asarray(Brhs)[7]):.2e})", flush=True)
