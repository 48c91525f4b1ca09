"""BELL SpMM kernel: hardware parity + K-sweep vs the per-column loop.

Run on the v5e:  python experiments/bell_spmm_bench.py

Measures spmm_bell (packed, one streamed pass over slot planes for all K)
against K launches of spmv_bell, chained-jit timing (bench/runner.py), on
the two classes BELL wins: poisson_512 (5-pt stencil, plane-pure) and
femlike_262k (quantized-offset windows, fill 0.86).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sparse_matrix_tpu.bench.runner import bench_device_loop  # noqa: E402
from sparse_matrix_tpu.core.matrix_market import load_matrix_market_csr  # noqa: E402
from sparse_matrix_tpu.formats.bell import plan_bell  # noqa: E402
from sparse_matrix_tpu.ops.spmm import bell_spmm_viable, spmm_bell  # noqa: E402
from sparse_matrix_tpu.ops.spmv import spmv_oracle  # noqa: E402
from sparse_matrix_tpu.ops.spmv_bell import bell_device_arrays, spmv_bell  # noqa: E402
from sparse_matrix_tpu.solvers import poisson_2d_csr  # noqa: E402


def run_case(name, m, ks=(2, 4, 8, 16)):
    plan = plan_bell(m)
    if plan.num_layers == 0:
        print(f"{name}: all spill, skipping")
        return
    arrs = bell_device_arrays(plan)
    rng = np.random.default_rng(0)

    # hardware parity first (K=8)
    x = rng.standard_normal((m.cols, 8)).astype(np.float32)
    y = np.asarray(spmm_bell(plan, x, device_arrays=arrs))
    y_ref = np.stack(
        [spmv_oracle(m, x[:, j].astype(np.float64)) for j in range(8)],
        axis=1,
    ).astype(np.float32)
    scale = max(1.0, np.abs(y_ref).max())
    err = np.abs(y / scale - y_ref / scale).max()
    print(f"{name}: parity max err {err:.2e} (K=8)", flush=True)
    assert err < 2e-4

    nnz = m.nnz()
    for k in ks:
        if not bell_spmm_viable(plan, k):
            print(f"{name} K={k}: gate off, skipped")
            continue
        xk = jnp.asarray(rng.standard_normal((m.cols, k)).astype(np.float32))

        def step_packed(v):
            y = spmm_bell(plan, v, device_arrays=arrs)
            # chain: feed y back (square) or fold to x-shape
            if m.rows == m.cols:
                return y
            return jnp.tile(jnp.sum(y, axis=0) * 1e-9, (m.cols, 1)) + v

        def step_loop(v):
            cols = [
                spmv_bell(plan, v[:, j], device_arrays=arrs)
                for j in range(k)
            ]
            y = jnp.stack(cols, axis=1)
            if m.rows == m.cols:
                return y
            return jnp.tile(jnp.sum(y, axis=0) * 1e-9, (m.cols, 1)) + v

        rp = bench_device_loop(f"{name}_packed_k{k}", step_packed, xk,
                               iters=500)
        rl = bench_device_loop(f"{name}_loop_k{k}", step_loop, xk,
                               iters=200)
        gp = nnz * k / (rp.seconds * 1e9)
        gl = nnz * k / (rl.seconds * 1e9)
        print(
            f"{name} K={k}: packed {rp.millis*1000:.1f} us ({gp:.1f} "
            f"Gnnz/s) vs loop {rl.millis*1000:.1f} us ({gl:.1f}) -> "
            f"{rl.seconds/rp.seconds:.2f}x",
            flush=True,
        )


def main():
    print("backend:", jax.default_backend(), flush=True)
    run_case("poisson_512", poisson_2d_csr(512))
    import os

    fem = "matrices/femlike_262k.mtx"
    if os.path.exists(fem):
        run_case("femlike_262k", load_matrix_market_csr(fem))


if __name__ == "__main__":
    main()
