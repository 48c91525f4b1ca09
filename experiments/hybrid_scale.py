import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.ops.operator import SpmvOperator
# 1M-row tridiagonal + random noise: hybrid at scale
n = 1_000_000
rng = np.random.default_rng(0)
i = np.arange(n)
rows = np.concatenate([i, i[:-1], i[1:], rng.integers(0, n, n//2)])
cols = np.concatenate([i, i[:-1]+1, i[1:]-1, rng.integers(0, n, n//2)])
vals = np.concatenate([np.full(n, 4.0), np.full(n-1, -1.0), np.full(n-1, -1.0),
                       rng.standard_normal(n//2)*0.01]).astype(np.float32)
A = CsrMatrix.from_coo(n, n, rows, cols, vals)
t0=time.time()
op = SpmvOperator(A)
print(f"hybrid-scale: nnz={A.nnz()} format={op.format} plan {time.time()-t0:.0f}s", flush=True)
x = rng.standard_normal(n).astype(np.float32)
y = np.asarray(op(x))
bad = 0
for j in rng.integers(0, n, 20):
    lo, hi = int(A.offsets[j]), int(A.offsets[j+1])
    ref = float(A.vals[lo:hi].astype(np.float64) @ x[A.indices[lo:hi].astype(np.int64)])
    if abs(float(y[j])-ref) > 1e-2 + 1e-3*abs(ref): bad += 1
print(f"spot check: {20-bad}/20 rows OK", flush=True)
