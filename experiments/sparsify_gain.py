import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import scipy.sparse as sp
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.ops.spgemm_block import BlockSpgemm
S = sp.random(4096, 4096, density=0.005, format="csr", random_state=1, dtype=np.float32)
A = CsrMatrix(4096, 4096, S.data, S.indices.astype(np.uint32), S.indptr.astype(np.int64), is_sorted=True)
eng = BlockSpgemm(A, A)
cb = eng.multiply_device(); jax.block_until_ready(cb)
t0=time.perf_counter(); C = eng.multiply(); t_full = time.perf_counter()-t0
print(f"full multiply+to_csr with native sparsifier: {t_full*1e3:.0f} ms (was ~4000-4800 ms), nnz={C.nnz()}")
