"""ESC engine v2 (Pallas k-major expansion + packed 1-key sorts) vs the
XLA-gather engine, chained timing. VERDICT r3 #2 target: >=150 Mprod/s
sustained on uniform 4096/8192 + powerlaw.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/esc_v2_bench.py > experiments/esc_v2_bench.out 2>&1 &
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def chain_time(f, iters=40, repeats=3):
    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, iters, lambda i, v: f(v), c)
    c0 = jnp.float32(0.001)
    float(loop(c0))
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(c0))
        runs.append(time.perf_counter() - t0)
    return max(1e-9, (min(runs) - 0.025) / iters)


def main():
    from sparse_matrix_tpu.bench.corpus import _power_law_rows
    from sparse_matrix_tpu.formats.csr import CsrMatrix
    from sparse_matrix_tpu.ops.device_sorted import EscSpgemm

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)

    def uniform(n, density):
        per = max(1, int(n * density))
        r = np.repeat(np.arange(n, dtype=np.int64), per)
        c = rng.integers(0, n, len(r))
        return CsrMatrix.from_coo(n, n, r, c, rng.standard_normal(len(r)))

    for name, a in [
        ("uniform2048_1%", uniform(2048, 0.01)),
        ("uniform4096_0.5%", uniform(4096, 0.005)),
        ("uniform8192_0.2%", uniform(8192, 0.002)),
        ("powerlaw2k", _power_law_rows(rng, 2048, 16)),
        ("powerlaw16k_hs", _power_law_rows(rng, 1 << 14, 8)),
    ]:
        for engine in ("pallas", "xla"):
            try:
                t0 = time.time()
                e = EscSpgemm(a, a, engine=engine)
                plan_t = time.time() - t0
                if engine == "pallas" and e.engine != "pallas":
                    log(f"{name} pallas gated out")
                    continue
                # correctness spot-check once
                c = e.multiply()
                i = int(rng.integers(0, a.rows))
                ref = (a.to_dense()[i] @ a.to_dense()
                       if a.rows <= 4096 else None)
                if ref is not None:
                    got = c.to_dense()[i]
                    assert np.allclose(got, ref, atol=1e-2), name
                n = e.num_products

                def step(cc):
                    r = e.multiply_device(
                        lhs_vals=None,
                        rhs_vals=e.rhs_vals * (1.0 + cc * 1e-9))
                    return cc + r.val[0] * 1e-20 + r.nnz.astype(
                        jnp.float32) * 1e-20

                t = chain_time(step)
                log(f"{name} {e.engine}: {t*1e3:.2f} ms -> "
                    f"{n/t/1e6:.1f} Mprod/s (products={n}, plan {plan_t:.1f}s)")
            except Exception as ex:
                log(f"{name} {engine} failed: {ex!r}")


if __name__ == "__main__":
    main()
