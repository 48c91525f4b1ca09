"""VERDICT r3 #9: bf16 value planes for the BELL packed SpMM (K >= 8).

bf16 planes won 2.33x on the DIA stream exactly where the value stream is
the wall; the K>=8 BELL SpMM streams slot planes too — measure whether
halved planes lift the SpMM rates at bench shapes, or record the negative.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/bell_spmm_bf16.py > experiments/bell_spmm_bf16.out 2>&1 &
"""
import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    from sparse_matrix_tpu.bench.corpus import _fem_like
    from sparse_matrix_tpu.bench.runner import bench_device_loop
    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import poisson_2d_csr

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    cases = [
        ("poisson_512", poisson_2d_csr(512, dtype=np.float32)),
        ("femlike_262k", _fem_like(rng, 512, 2)),
    ]
    for name, m in cases:
        nnz = m.nnz()
        for k in (8, 16):
            X = jnp.asarray(
                rng.standard_normal((m.cols, k)).astype(np.float32))
            base = None
            for tag, vdt in (("f32", None), ("bf16", jnp.bfloat16)):
                try:
                    op = SpmvOperator(m, force="bell", values_dtype=vdt)
                    y = np.asarray(op.matmat(X))
                    # spot-check one column against the CSR row sums
                    i = int(rng.integers(0, m.rows))
                    lo_, hi_ = int(m.offsets[i]), int(m.offsets[i + 1])
                    ref = float(
                        m.vals[lo_:hi_].astype(np.float64)
                        @ np.asarray(X)[m.indices[lo_:hi_].astype(np.int64), 0])
                    tol = 2e-2 if vdt is not None else 1e-3
                    assert abs(y[i, 0] - ref) <= tol * max(1.0, abs(ref)), (
                        y[i, 0], ref)
                    r = bench_device_loop(
                        "spmm", lambda v: op.matmat(v) * 0.2, X, iters=300)
                    rate = nnz * k / r.seconds / 1e9
                    rel = "" if base is None else f"  ({base/r.seconds:.2f}x f32)"
                    if base is None:
                        base = r.seconds
                    log(f"{name} K={k} {tag}: {r.seconds*1e6:8.1f} us -> "
                        f"{rate:7.1f} Gnnz/s{rel}")
                except Exception as e:
                    log(f"{name} K={k} {tag} failed: {e!r}")


if __name__ == "__main__":
    main()
