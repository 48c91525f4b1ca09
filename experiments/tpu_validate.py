"""Validate on the real TPU the paths that tests only exercise via CPU
reference implementations: LanePack v2 kernel, BCSR SpMM kernel, hybrid
operator, block SpGEMM segmentation."""

import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.formats.bcsr import BsrMatrix
from sparse_matrix_tpu.ops.spmm import spmm_bcsr, spmm_dia
from sparse_matrix_tpu.ops.operator import SpmvOperator
from sparse_matrix_tpu.solvers import poisson_2d_csr

# 1) LanePack two-target kernel on an unstructured matrix
a = (rng.random((1000, 1400)) < 0.01) * rng.standard_normal((1000, 1400))
A = CsrMatrix.from_dok(DokMatrix.from_dense(a.astype(np.float32)))
op = SpmvOperator(A, force="lanepack")
x = rng.standard_normal(1400).astype(np.float32)
y = np.asarray(op(x))
err = np.abs(y - a.astype(np.float32) @ x).max()
print(f"1. lanepack v2 rect: err={err:.2e} {'OK' if err < 1e-3 else 'FAIL'}", flush=True)

# 2) hybrid operator on banded+noise
n = 2000
d = np.zeros((n, n), np.float64)
i = np.arange(n)
d[i, i] = 4; d[i[:-1], i[:-1]+1] = -1; d[i[:-1]+1, i[:-1]] = -1
noise = (rng.random((n, n)) < 0.002) * rng.standard_normal((n, n)) * 0.1
h = (d + noise).astype(np.float32)
H = CsrMatrix.from_dok(DokMatrix.from_dense(h))
oph = SpmvOperator(H)
xh = rng.standard_normal(n).astype(np.float32)
errh = np.abs(np.asarray(oph(xh)) - h @ xh).max()
print(f"2. hybrid ({oph.format}): err={errh:.2e} {'OK' if errh < 1e-2 else 'FAIL'}", flush=True)

# 3) BCSR SpMM kernel
B = BsrMatrix.from_csr(A, 128)
X = rng.standard_normal((1400, 64)).astype(np.float32)
Y = np.asarray(spmm_bcsr(B, X))
errm = np.abs(Y - a.astype(np.float32) @ X).max()
print(f"3. bcsr spmm: err={errm:.2e} {'OK' if errm < 1e-2 else 'FAIL'}", flush=True)

# 4) DIA SpMM + timing
P = poisson_2d_csr(512, dtype=np.float32)
from sparse_matrix_tpu.formats.dia import try_dia_from_csr
dia = try_dia_from_csr(P)
XP = rng.standard_normal((P.cols, 32)).astype(np.float32)
t0 = time.perf_counter()
YP = np.asarray(spmm_dia(dia, XP))
t1 = time.perf_counter() - t0
i0 = rng.integers(0, P.rows, 20)
ref_rows = np.stack([
    P.vals[P.offsets[j]:P.offsets[j+1]].astype(np.float64) @ XP[P.indices[P.offsets[j]:P.offsets[j+1]].astype(np.int64)]
    for j in i0
])
errp = np.abs(YP[i0] - ref_rows).max()
print(f"4. dia spmm 512^2 x 32 rhs: err={errp:.2e} first-run {t1:.1f}s {'OK' if errp < 1e-2 else 'FAIL'}", flush=True)

# 5) segmented block SpGEMM at n=8192 (previously SMEM OOM)
import scipy.sparse as sp
S = sp.random(8192, 8192, density=0.002, format="csr", random_state=3, dtype=np.float32)
A8 = CsrMatrix(8192, 8192, S.data, S.indices.astype(np.uint32), S.indptr.astype(np.int64), is_sorted=True)
from sparse_matrix_tpu.ops.spgemm_block import BlockSpgemm
t0 = time.perf_counter()
eng = BlockSpgemm(A8, A8)
cb = eng.multiply_device()
jax.block_until_ready(cb)
t_all = time.perf_counter() - t0
runs = []
for _ in range(2):
    t0 = time.perf_counter()
    cb = eng.multiply_device()
    _ = float(jnp.sum(cb[0]))
    runs.append(time.perf_counter() - t0)
from sparse_matrix_tpu.ops.spgemm_host import flops_per_row
fl = int(flops_per_row(A8, A8).sum())
print(f"5. block spgemm 8192 segmented: compile+first {t_all:.0f}s, steady {min(runs)*1e3:.0f} ms ({fl/min(runs)/1e6:.0f} Mprod/s)", flush=True)
print("DONE", flush=True)
