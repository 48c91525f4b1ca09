"""ESC SpGEMM phase breakdown on v5e (VERDICT r3 #2 groundwork).

Phases: (1) expansion gathers (lhs_vals[src], rhs_vals[q], rhs_indices[q]),
(2) + two-key sort, (3) + run reduce (scan + compaction sort) = full engine.
Each stage is chained via a scalar carry that perturbs the INPUT values so
XLA cannot hoist the work out of the fori_loop.

Run: nohup python experiments/esc_phases.py > experiments/esc_phases.out 2>&1 &
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def chain_time(f, iters=50, repeats=3):
    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, iters, lambda i, v: f(v), c)

    c0 = jnp.float32(0.001)
    float(loop(c0))  # compile + warm
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(c0))
        runs.append(time.perf_counter() - t0)
    rtt = 0.025
    return max(1e-9, (min(runs) - rtt) / iters)


def main():
    from sparse_matrix_tpu.bench.corpus import _power_law_rows
    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.ops.device_sorted import expand_plan

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)

    def uniform(n, density):
        per = max(1, int(n * density))
        r = np.repeat(np.arange(n, dtype=np.int64), per)
        c = rng.integers(0, n, len(r))
        return CsrMatrix.from_coo(n, n, r, c, rng.standard_normal(len(r)))

    for name, a in [
        ("uniform4096_0.5%", uniform(4096, 0.005)),
        ("powerlaw16k", _power_law_rows(rng, 1 << 14, 8)),
    ]:
        b = a
        src, q, out_r = expand_plan(a, b)
        n = len(src)
        srcj = jnp.asarray(src)
        qj = jnp.asarray(q)
        out_rj = jnp.asarray(out_r)
        lv = jnp.asarray(a.vals.astype(np.float32))
        rv = jnp.asarray(b.vals.astype(np.float32))
        ri = jnp.asarray(b.indices.astype(np.int32))
        rows = a.rows
        log(f"--- {name}: products={n}")

        def gathers(c):
            v = (lv + c)[srcj] * rv[qj]
            oc = ri[qj]
            return c + jnp.sum(v) * 1e-20 + jnp.sum(oc) * 1e-20

        def plus_sort(c):
            v = (lv + c)[srcj] * rv[qj]
            oc = ri[qj]
            r_s, c_s, v_s = jax.lax.sort((out_rj, oc, v), num_keys=2)
            return c + v_s[0] * 1e-20 + jnp.sum(c_s[:8]) * 1e-20

        def full(c):
            from sparse_matrix_tpu.ops.device_sorted import _run_reduce
            v = (lv + c)[srcj] * rv[qj]
            oc = ri[qj]
            r_s, c_s, v_s = jax.lax.sort((out_rj, oc, v), num_keys=2)
            row, col, val, nnz = _run_reduce(r_s, c_s, v_s, rows)
            return c + val[0] * 1e-20 + nnz.astype(jnp.float32) * 1e-20

        # isolated sort on presorted-material (keys already on device)
        rr = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
        cc = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
        vv = jnp.asarray(rng.standard_normal(n).astype(np.float32))

        def sort_only(c):
            r_s, c_s, v_s = jax.lax.sort((rr, cc, vv + c), num_keys=2)
            return c + v_s[0] * 1e-20

        def sort_onekey(c):
            k = rr.astype(jnp.int32) * jnp.int32(rows) + cc
            k_s, v_s = jax.lax.sort((k, vv + c), num_keys=1)
            return c + v_s[0] * 1e-20 + k_s[0].astype(jnp.float32) * 1e-20

        for tag, f in [("gathers", gathers), ("gathers+sort", plus_sort),
                       ("full", full), ("sort_only(2key,3arr)", sort_only),
                       ("sort_only(1key int32,2arr)", sort_onekey)]:
            try:
                t = chain_time(f)
                log(f"{name} {tag}: {t*1e3:.2f} ms -> {n/t/1e6:.1f} Mprod/s")
            except Exception as e:
                log(f"{name} {tag} failed: {e!r}")


if __name__ == "__main__":
    main()
