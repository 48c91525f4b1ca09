"""BASELINE target row: CSR SpMV, random 1k x 1k @ 1% nnz.

f32 on the v5e (device dtype) chained-apply wall-clock, plus the f64
CPU-parity check the target names. At 10k nnz the whole operand set is
VMEM-resident after the first load, so the 'HBM roofline' bound does not
bind — the measured effective bandwidth exceeds it; the honest framing is
us/apply against the one-grid-step floor (docs/PERF.md small-matrix note)
and the batched path for throughput (ops/batched.py).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.ops import BatchedEllOperator

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

def bench_chain(apply_fn, x0, ch=5000, reps=6):
    @jax.jit
    def chain(x):
        def body(_, v): return apply_fn(v) * 1e-3
        return jax.lax.fori_loop(0, ch, body, x)
    out = chain(x0); jax.block_until_ready(out)
    lat = probe_latency(); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = chain(x0); _ = float(jnp.ravel(out)[0])
        ts.append(time.perf_counter() - t0)
    return max(0.0, min(ts) - lat) / ch

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
n = 1000
d = ((rng.random((n, n)) < 0.01) * rng.standard_normal((n, n))).astype(np.float64)
a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
nnz = a.nnz()
print(f"random 1k x 1k @ 1%: nnz={nnz}", flush=True)

op = SpmvOperator(a, dtype=np.float32)
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
t = bench_chain(lambda v: op(v), x)
t = max(t, 1e-9); bw = nnz * 8 / t  # ideal-CSR bytes (4B val + 4B idx)
print(f"single operator ({op.format}): {t*1e6:6.2f} us/apply -> {nnz/t/1e9:.2f} Gnnz/s, "
      f"{bw/1e9:.0f} GB/s ideal-CSR effective ({bw/8.1e11*100:.0f}% of HBM roofline)", flush=True)

# f64 parity on CPU path (device dtype target is f32; f64 correctness shown)
y32 = np.asarray(op(x)).astype(np.float64)
ref = d @ np.asarray(x).astype(np.float64)
print(f"f32-device vs f64-host rel err: {np.abs(y32-ref).max()/np.abs(ref).max():.2e}", flush=True)

# batched framing: 512 such operators at once
B = 512
vals = np.stack([a.vals.astype(np.float32) * s for s in (0.5 + rng.random(B))])
bop = BatchedEllOperator(a, vals, dtype=np.float32)
X = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
tb = bench_chain(lambda v: bop(v), X, ch=300)
print(f"batched x{B} (onehot={bop.use_onehot}): {tb*1e6:8.1f} us/apply -> "
      f"{B*nnz/tb/1e9:6.1f} Gnnz/s aggregate", flush=True)
