"""Block-SpGEMM pair-ordering experiment (TODO round-3: C-block supernode /
A-B reuse ordering).

The production kernel (ops/spgemm_block.py) sorts pairs by C block and
detects "first visit" by adjacency — so C blocks must be CONTIGUOUS in the
stream, and the Mosaic pipeline holds C resident across its run (C traffic
amortized to ~128KB per C block). A/B blocks change every pair: 128 KB/pair
f32 DMA, the measured bottleneck.

Alternative ordering: A-major — sort pairs by (A block, C block); every run
of pairs shares one A block (the pipeline skips its re-fetch), but C blocks
revisit NON-consecutively, so "first visit" must come from a host-computed
flag, and correctness depends on Mosaic's write-back/re-fetch ordering for
revisited output blocks. This experiment (a) checks that correctness on
hardware, (b) times both orderings.

Traffic arithmetic (uniform nb x nb block grid, all blocks present):
  C-major: per pair A(64K) + B(64K) + C amortized 128K/g  (g = pairs/C block)
  A-major: per pair B(64K) + C(128K: in+out) + A amortized 64K/g
A-major trades a 64K read for a 128K read+write — it should LOSE whenever C
revisit runs are as long as A runs (uniform case), and win only when A runs
are much longer than C runs (tall-skinny B). Measure, don't guess.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sparse_matrix_tpu.formats.bcsr import BsrMatrix
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.ops.spgemm_block import block_pairs_plan, BlockSpgemm


def lat():
    x = jnp.zeros((8, 128), jnp.float32)
    t0 = time.perf_counter(); _ = float(jnp.sum(x)); return time.perf_counter() - t0


def _kernel_flag(pair_a_ref, pair_b_ref, pair_c_ref, first_ref, a_ref, b_ref, c_ref):
    i = pl.program_id(0)
    prod = jnp.dot(a_ref[0], b_ref[0], preferred_element_type=c_ref.dtype,
                   precision=jax.lax.Precision.HIGHEST)
    prev = jnp.where(first_ref[i] != 0, jnp.zeros_like(c_ref[0]), c_ref[0])
    c_ref[0] = prev + prod


@functools.partial(jax.jit, static_argnames=("num_c", "bs"))
def numeric_flag(a_blocks, b_blocks, pair_a, pair_b, pair_c, first, *, num_c, bs):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(pair_a.shape[0],),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda i, pa, pb, pc, fi: (pa[i], 0, 0)),
            pl.BlockSpec((1, bs, bs), lambda i, pa, pb, pc, fi: (pb[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, bs), lambda i, pa, pb, pc, fi: (pc[i], 0, 0)),
    )
    return pl.pallas_call(
        _kernel_flag,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_c, bs, bs), a_blocks.dtype),
    )(pair_a, pair_b, pair_c, first, a_blocks, b_blocks)


def first_flags(pair_c):
    seen = {}
    f = np.zeros(len(pair_c), np.int32)
    for i, c in enumerate(pair_c):
        if c not in seen:
            f[i] = 1
            seen[c] = True
    return f


def bench(fn, iters=10):
    @jax.jit
    def loop(s):
        return jax.lax.fori_loop(0, iters, lambda i, u: (jnp.sum(fn(u)) * 1e-30 + 1.0).astype(jnp.float32), s)
    t0 = time.perf_counter(); _ = float(loop(jnp.float32(1.0))); comp = time.perf_counter() - t0
    l0 = lat(); runs = []
    for _ in range(3):
        t0 = time.perf_counter(); _ = float(loop(jnp.float32(1.0))); runs.append(time.perf_counter() - t0)
    return (min(runs) - min(l0, lat())) / iters, comp


def run_case(name, m, bs=128):
    a = BsrMatrix.from_csr(m, bs, dtype=np.float32)
    pair_a, pair_b, pair_c, c_keys = block_pairs_plan(a, a)
    n = len(pair_a)
    if n > (1 << 16):
        print(f"{name}: {n} pairs > SMEM segment limit, skipping"); return
    ab = jnp.asarray(a.blocks)
    print(f"=== {name}: nnzb={a.nnzb} pairs={n} c_blocks={len(c_keys)}", flush=True)

    # C-major (production order) via flag kernel for apples-to-apples
    f_c = first_flags(np.asarray(pair_c))
    run = lambda pa, pb, pc, fi: (lambda s: numeric_flag(
        ab * s, ab, pa, pb, pc, fi, num_c=len(c_keys), bs=bs))
    pa_j, pb_j, pc_j = jnp.asarray(pair_a), jnp.asarray(pair_b), jnp.asarray(pair_c)
    c_cmaj = np.asarray(numeric_flag(ab, ab, pa_j, pb_j, pc_j, jnp.asarray(f_c),
                                     num_c=len(c_keys), bs=bs))
    per_c, comp_c = bench(run(pa_j, pb_j, pc_j, jnp.asarray(f_c)))
    print(f"C-major: compile {comp_c:.0f}s {per_c*1e3:.2f} ms "
          f"({per_c/n*1e9:.0f} ns/pair)", flush=True)

    # A-major: sort by (a_block, c_block)
    order = np.lexsort((np.asarray(pair_c), np.asarray(pair_a)))
    pa2, pb2, pc2 = (np.asarray(x)[order] for x in (pair_a, pair_b, pair_c))
    f_a = first_flags(pc2)
    pa2j, pb2j, pc2j = jnp.asarray(pa2), jnp.asarray(pb2), jnp.asarray(pc2)
    c_amaj = np.asarray(numeric_flag(ab, ab, pa2j, pb2j, pc2j, jnp.asarray(f_a),
                                     num_c=len(c_keys), bs=bs))
    err = np.abs(c_amaj - c_cmaj).max() / max(1e-12, np.abs(c_cmaj).max())
    print(f"A-major rel err vs C-major: {err:.2e} "
          f"{'(CORRECT: non-consecutive revisit works)' if err < 1e-5 else '(WRONG: revisit hazard!)'}",
          flush=True)
    per_a, comp_a = bench(run(pa2j, pb2j, pc2j, jnp.asarray(f_a)))
    print(f"A-major: compile {comp_a:.0f}s {per_a*1e3:.2f} ms "
          f"({per_a/n*1e9:.0f} ns/pair)", flush=True)


def blocked(rng, n, block, density_in_block):
    nb = n // block
    rows, cols, vals = [], [], []
    for bi in range(nb):
        for bj in (bi - 1, bi, bi + 1):
            if 0 <= bj < nb:
                k = int(block * block * density_in_block)
                rows.append(bi * block + rng.integers(0, block, k))
                cols.append(bj * block + rng.integers(0, block, k))
                vals.append(rng.standard_normal(k).astype(np.float32))
    return CsrMatrix.from_coo(n, n, np.concatenate(rows), np.concatenate(cols),
                              np.concatenate(vals))


def uniform(rng, n, density):
    nnz = int(n * n * density)
    return CsrMatrix.from_coo(n, n, rng.integers(0, n, nnz), rng.integers(0, n, nnz),
                              rng.standard_normal(nnz).astype(np.float32))


def main():
    rng = np.random.default_rng(0)
    run_case("blocked_2k", blocked(rng, 2048, 128, 0.05))
    run_case("uniform_2048_1pct", uniform(rng, 2048, 0.01))
    run_case("uniform_4096_05pct", uniform(rng, 4096, 0.005))


if __name__ == "__main__":
    main()
