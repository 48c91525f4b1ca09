"""bf16 block storage for the block-MXU SpGEMM: measure the DMA halving.

Round-1 found the engine DMA-bound (~128-192 KB/pair); storing A/B blocks
in bfloat16 halves that. Queued-dispatch timing (amortized regime), uniform
matrices where every block is populated.
"""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import numpy as np, jax, jax.numpy as jnp
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.ops.spgemm_block import BlockSpgemm
from aligned_spmv import lat, f0


def uniform(rng, n, density):
    nnz = int(n * n * density)
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz)
    return CsrMatrix.from_coo(n, n, r, c, v)


def measure(eng, tag, iters=50):
    dev = eng.multiply_device()  # compile + warm
    jax.block_until_ready(dev)

    @jax.jit
    def loop(s):
        def body(i, carry):
            out = eng.multiply_device()
            return carry + jnp.sum(out) * 1e-30
        return jax.lax.fori_loop(0, iters, body, s)

    _ = float(loop(jnp.float32(0)))
    l0 = lat()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(jnp.float32(0)))
        runs.append(time.perf_counter() - t0)
    per = (min(runs) - min(l0, lat())) / iters
    print(f"{tag}: {per*1e3:.3f} ms/multiply ({eng.num_pairs} pairs, "
          f"{per/max(1,eng.num_pairs)*1e9:.0f} ns/pair)", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    for n, dens in [(2048, 0.01), (4096, 0.005)]:
        A = uniform(rng, n, dens)
        print(f"=== uniform {n} @ {dens*100}%: nnz={A.nnz()}", flush=True)
        e32 = BlockSpgemm(A, A)
        p32 = measure(e32, "f32 blocks (HIGHEST)")
        ebf = BlockSpgemm(A, A, storage="bf16")
        pbf = measure(ebf, "bf16 blocks (DEFAULT)")
        print(f"speedup: {p32/pbf:.2f}x", flush=True)
        # accuracy of the bf16 path vs f32 path
        c32 = np.asarray(e32.multiply_device())
        cbf = np.asarray(ebf.multiply_device())
        scale = max(1.0, np.abs(c32).max())
        print(f"bf16 rel-max-err vs f32: {np.abs(c32-cbf).max()/scale:.2e}", flush=True)


if __name__ == "__main__":
    main()
