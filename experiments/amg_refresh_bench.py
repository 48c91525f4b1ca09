"""AmgRefresh at scale: plan once, then device re-Galerkin wall vs a full
host amg_setup when A's values drift on a fixed pattern (Poisson 1024^2 /
2048^2, symmetric diagonal scaling S A S as the drift).

Reports (min-of-N, host wall swings ~2x with co-tenant load):
  - full amg_setup wall (the thing refresh replaces)
  - refresh_coarsening wall (device chain + host pull + dinv/lam)
  - refresh() wall (+ operator re-planning)
  - device-chain-only wall (jitted, chained timing)
  - PCG iteration parity: fresh vs refreshed hierarchy on the new matrix

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/amg_refresh_bench.py > experiments/amg_refresh_bench.out 2>&1 &
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def min_of(f, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = f()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main():
    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import (
        AmgRefresh, amg_setup, pcg_solve, poisson_2d_csr)

    log(f"backend={jax.default_backend()}")
    for n in (1024, 2048, 4096):
        a = poisson_2d_csr(n, dtype=np.float32)
        rng = np.random.default_rng(0)
        s = np.exp(0.2 * rng.standard_normal(a.rows)).astype(np.float64)
        rids = a.row_ids().astype(np.int64)
        new_vals = (a.vals.astype(np.float64) * s[rids]
                    * s[a.indices.astype(np.int64)]).astype(np.float32)
        a_new = CsrMatrix(a.rows, a.cols, new_vals, a.indices, a.offsets,
                          is_sorted=True)

        t_setup, hier_fresh = min_of(lambda: amg_setup(a_new), n=2)
        log(f"poisson_{n}^2: full amg_setup {t_setup:.2f} s")

        from sparse_matrix_tpu.utils.transfer import (
            transfer_bytes, transfer_seconds,
        )

        tr0, tb0 = transfer_seconds(), transfer_bytes()
        t0 = time.perf_counter()
        ref = AmgRefresh(a)
        plan_wall = time.perf_counter() - t0
        tr, tb = transfer_seconds() - tr0, transfer_bytes() - tb0
        log(f"poisson_{n}^2: AmgRefresh plan {plan_wall:.2f} s "
            f"({ref.num_levels} levels; host {plan_wall - tr:.2f} s + "
            f"device push {tr:.2f} s for {tb/1e6:.0f} MB — push wall is "
            f"tunnel-bandwidth-bound, ~2 orders faster on PCIe)")

        # first call compiles; time the steady state
        ref.refresh_values(new_vals)
        t_chain, _ = min_of(
            lambda: jax.block_until_ready(
                [float(v[0]) for v in ref.refresh_values(new_vals)]), n=3)
        log(f"poisson_{n}^2: device chain (w/ host readback) {t_chain*1e3:.1f} ms")

        t_coars, _ = min_of(lambda: ref.refresh_coarsening(new_vals), n=3)
        log(f"poisson_{n}^2: refresh_coarsening {t_coars:.2f} s")
        t_full, hier_ref = min_of(lambda: ref.refresh(new_vals), n=2)
        log(f"poisson_{n}^2: refresh() incl. operator replan {t_full:.2f} s "
            f"-> {t_setup/t_full:.1f}x faster than full setup")

        # round-5 device-resident refresh: no host value pull, no replan
        t0 = time.perf_counter()
        hier_dev = ref.refresh_device(new_vals)  # builds templates+maps
        log(f"poisson_{n}^2: refresh_device first call (incl. template/"
            f"map build) {time.perf_counter()-t0:.2f} s")
        t_dev, hier_dev = min_of(lambda: ref.refresh_device(new_vals), n=3)
        log(f"poisson_{n}^2: refresh_device() {t_dev:.2f} s "
            f"-> {t_setup/t_dev:.1f}x faster than full setup")

        op = SpmvOperator(a_new)
        b = jnp.ones(a.rows, jnp.float32)
        rf = pcg_solve(op, b, hier_fresh.preconditioner(), tol=1e-6,
                       maxiter=300)
        rr = pcg_solve(op, b, hier_ref.preconditioner(), tol=1e-6,
                       maxiter=300)
        log(f"poisson_{n}^2: PCG iters fresh={int(rf.iterations)} "
            f"refreshed={int(rr.iterations)}")


if __name__ == "__main__":
    main()
