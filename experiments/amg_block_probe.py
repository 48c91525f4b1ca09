"""Per-level, per-operator matmat timing inside the block AMG V-cycle:
which operator causes the K>4 degradation (experiments/amg_block.out)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.solvers import amg_setup, poisson_2d_csr

def probe_latency():
    f0 = jax.jit(lambda s: s + 1.0); _ = float(f0(jnp.float32(0)))
    ls = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(f0(jnp.float32(0))); ls.append(time.perf_counter() - t0)
    return min(ls)

def timed(fn, arg, reps=6):
    r = fn(arg); jax.block_until_ready(r)
    lat = probe_latency()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = fn(arg); _ = float(jnp.sum(r) * 0 + jnp.ravel(r)[0]); ts.append(time.perf_counter() - t0)
    return max(0.0, min(ts) - lat)

a = poisson_2d_csr(512, dtype=np.float32)
hier = amg_setup(a, coarse_size=400, dtype=np.float32)
rng = np.random.default_rng(0)
print("backend:", jax.default_backend(), flush=True)
for li, lv in enumerate(hier.levels):
    for name, op, ncols in (("a", lv.a_op, lv.n), ("p", lv.p_op, None), ("pt", lv.pt_op, None)):
        cols = op.cols
        for K in (4, 8, 16):
            X = jnp.asarray(rng.standard_normal((cols, K)).astype(np.float32))
            f = jax.jit(lambda xx, op=op: op.matmat(xx))
            t = timed(f, X)
            print(f"level {li} {name:2s} fmt={op.format:8s} cols={cols:7d} K={K:2d}: {t*1e6:9.1f} us ({t/K*1e6:7.1f} us/rhs)", flush=True)
