"""Headline benchmark: SpMV on the 2D Poisson 512^2 operator (f32) through
the library's planned operator (automatic format selection — DIA for
banded), exactly as the CG solver drives it — plus the general-path and
corpus rows the round-2 verdict asked the JSON artifact to carry.

Prints ONE JSON line:
  {"metric": "spmv_effective_bw_pct_hbm_roofline", "value": <pct>,
   "unit": "%", "vs_baseline": <value/70>,
   "general_pct": <forced-general % roofline on the same operator>,
   "general_gnnz": ..., "corpus_geomean_gnnz": <geomean over
   poisson-general/femlike/randlocal on their dispatched formats>,
   "headline_us": {"min":..., "median":..., "max":...}, ...}

"Effective bandwidth" counts the *ideal CSR* working set (8 bytes/nnz: f32
value + int32 column index, plus x and y once) against the wall time, over
the nominal 820 GB/s HBM roofline of v5e. Values above 100% are real: the
DIA path stores no indices and XLA keeps the loop-invariant band data
VMEM-resident across iterations, so per-apply HBM traffic is far below the
ideal-CSR byte count. The 70%-of-roofline target from BASELINE.md is the
``vs_baseline`` denominator. Timing uses the auto-scaled chained-jit loop
(bench/runner.py): the chain grows until one loop takes >= 0.4 s, making
the ~25 ms tunnel round-trip a <5% correction (two earlier headline
numbers died of unchained timing). Diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _wait_for_tpu():
    """Bounded wait for the axon tunnel (it flaps for hours at a time).

    Probes backend init in a SUBPROCESS — an in-process failure poisons
    jax's backend cache, and a hung init ignores SIGTERM (hence ``-k``
    via subprocess timeout + kill). Returns True when a probe succeeds,
    False when the budget (SPMX_BENCH_TUNNEL_WAIT_S, default 1500 s) is
    exhausted; the caller then emits an honest error JSON line instead
    of a stack trace, so the round still records an artifact.
    """
    import subprocess

    budget = float(os.environ.get("SPMX_BENCH_TUNNEL_WAIT_S", "1500"))
    deadline = time.time() + budget
    attempt = 0
    while True:
        attempt += 1
        # a probe never runs longer than the remaining budget (+floor)
        probe_t = min(240.0, max(10.0, deadline - time.time()))
        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_t, capture_output=True,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            log(f"tpu tunnel ok (probe {attempt})")
            return True
        if time.time() >= deadline:
            log(f"tpu tunnel unavailable after {attempt} probes")
            return False
        log(f"tpu tunnel down (probe {attempt}), retrying...")
        time.sleep(min(60.0, max(1.0, deadline - time.time())))


def _bench(op, xj, iters):
    from sparse_matrix_tpu.bench.runner import bench_device_loop

    t0 = time.time()
    if op.bytes_per_apply() > 24 * 2**20:
        # big operators ride as jit ARGUMENTS: closure constants past
        # ~30 MB exceed the remote-compile payload (HTTP 413) — the
        # powerlaw_262k rowsplit/stripe plans are in this regime
        r = bench_device_loop(
            "op", lambda p, v: op.apply(p, v) * 0.2, xj,
            iters=iters, repeats=3, params=op.as_pytree(),
        )
    else:
        r = bench_device_loop(
            "op", lambda v: op(v) * 0.2, xj, iters=iters, repeats=3
        )
    return r, time.time() - t0


def _spot_check(a, op, xj, rng):
    y = np.asarray(op(xj))
    x_h = np.asarray(xj)
    for i in rng.choice(a.rows, size=min(a.rows, 256), replace=False):
        lo, hi = int(a.offsets[i]), int(a.offsets[i + 1])
        ref = float(
            a.vals[lo:hi].astype(np.float64)
            @ x_h[a.indices[lo:hi].astype(np.int64)]
        )
        if abs(float(y[i]) - ref) > 1e-2 * max(1.0, abs(ref)):
            return i, float(y[i]), ref
    return None


def main():
    if not _wait_for_tpu():
        print(json.dumps({
            "metric": "spmv_effective_bw_pct_hbm_roofline",
            "value": 0.0, "unit": "%", "vs_baseline": 0.0,
            "error": "tpu_tunnel_unavailable",
        }))
        return

    import jax
    import jax.numpy as jnp

    from sparse_matrix_tpu.ops.operator import SpmvOperator
    from sparse_matrix_tpu.solvers import poisson_2d_csr

    n = int(os.environ.get("SPMX_BENCH_N", "512"))
    iters = int(os.environ.get("SPMX_BENCH_ITERS", "3000"))
    hbm_gbps = 820.0  # v5e nominal

    t0 = time.time()
    a = poisson_2d_csr(n, dtype=np.float32)
    op = SpmvOperator(a)
    nnz, rows = a.nnz(), a.rows
    log(
        f"operator: poisson {n}^2, nnz={nnz}, format={op.format}, "
        f"bytes/apply={op.bytes_per_apply()}, plan {time.time()-t0:.1f}s, "
        f"backend={jax.default_backend()}"
    )

    rng = np.random.default_rng(0)
    xj = jnp.asarray(rng.standard_normal(rows).astype(np.float32))

    bad = _spot_check(a, op, xj, rng)
    if bad is not None:
        log(f"CORRECTNESS FAIL at row {bad[0]}: {bad[1]} vs {bad[2]}")
        print(json.dumps({
            "metric": "spmv_effective_bw_pct_hbm_roofline",
            "value": 0.0, "unit": "%", "vs_baseline": 0.0,
        }))
        return

    r, wall = _bench(op, xj, iters)
    per = r.seconds
    st = r.stats()
    ideal_bytes = nnz * 8 + rows * 4 * 2
    pct = 100.0 * ideal_bytes / per / 1e9 / hbm_gbps
    log(
        f"best-format ({op.format}): {per*1e3:.4f} ms -> {nnz/per/1e9:.1f} "
        f"Gnnz/s, effective {ideal_bytes/per/1e9:.0f} GB/s ({pct:.1f}%), "
        f"iters={r.iters}, med/min={st['median']/st['min']:.3f}, "
        f"wall {wall:.0f}s"
    )

    out = {
        "metric": "spmv_effective_bw_pct_hbm_roofline",
        "value": round(pct, 2),
        "unit": "%",
        "vs_baseline": round(pct / 70.0, 3),
        "headline_us": {
            k: round(v * 1e6, 3) for k, v in st.items()
        },
        "iters": r.iters,
    }

    # general path (no DIA special-casing) on the same operator — the
    # round-3 BELL streaming family
    if os.environ.get("SPMX_BENCH_SECONDARY", "1") != "0":
        corpus_rates = []
        try:
            op_g = SpmvOperator(a, force="bell")
            bad = _spot_check(a, op_g, xj, rng)
            assert bad is None, f"general-path mismatch: {bad}"
            rg, wall = _bench(op_g, xj, iters)
            gpct = 100.0 * ideal_bytes / rg.seconds / 1e9 / hbm_gbps
            out["general_pct"] = round(gpct, 2)
            out["general_gnnz"] = round(nnz / rg.seconds / 1e9, 2)
            corpus_rates.append(nnz / rg.seconds / 1e9)
            log(
                f"general ({op_g.format}): {rg.seconds*1e3:.4f} ms -> "
                f"{out['general_gnnz']} Gnnz/s ({gpct:.1f}%), "
                f"iters={rg.iters}, wall {wall:.0f}s"
            )
        except Exception as e:  # pragma: no cover - diagnostics only
            log(f"general row failed: {e!r}")

        # corpus: the non-banded bench classes on their dispatched formats,
        # each tagged with its structure class so per-class roofline pct is
        # visible round-over-round (VERDICT r3 #7: the geomean hides tail
        # regressions). banded = the headline DIA row above.
        from sparse_matrix_tpu.bench.corpus import (
            _fem_like, _power_law_rows, _random_local,
        )

        crng = np.random.default_rng(0)
        out["class_banded_pct"] = out["value"]
        for cname, cls_tag, cm in (
            ("femlike_262k", "local", _fem_like(crng, 512, 2)),
            ("randlocal_262k", "scatter",
             _random_local(crng, 1 << 18, 16, 4096)),
            ("powerlaw_262k", "skew", _power_law_rows(crng, 1 << 18, 16)),
        ):
            try:
                cop = SpmvOperator(cm)
                cx = jnp.asarray(
                    crng.standard_normal(cm.cols).astype(np.float32)
                )
                bad = _spot_check(cm, cop, cx, crng)
                assert bad is None, f"{cname} mismatch: {bad}"
                rc, wall = _bench(cop, cx, iters)
                rate = cm.nnz() / rc.seconds / 1e9
                corpus_rates.append(rate)
                cib = cm.nnz() * 8 + (cm.rows + cm.cols) * 4
                cpct = 100.0 * cib / rc.seconds / 1e9 / hbm_gbps
                out[f"class_{cls_tag}_pct"] = round(cpct, 2)
                out[f"class_{cls_tag}_gnnz"] = round(rate, 2)
                log(
                    f"corpus {cname} ({cop.format}): {rc.seconds*1e3:.4f} ms"
                    f" -> {rate:.1f} Gnnz/s ({cpct:.1f}%), "
                    f"iters={rc.iters}, wall {wall:.0f}s"
                )
            except Exception as e:  # pragma: no cover
                log(f"corpus {cname} failed: {e!r}")
        if corpus_rates:
            out["corpus_geomean_gnnz"] = round(
                float(np.exp(np.mean(np.log(corpus_rates)))), 2
            )

        # streaming-regime row: Poisson 2048^2 through the DIA streaming
        # kernel, f32 vs bf16 value planes (the bf16 planes fit the
        # 128 MB VMEM as loop invariants — measured 2.33x, bf16_bench.out)
        try:
            a2 = poisson_2d_csr(2048, dtype=np.float32)
            x2 = jnp.asarray(
                rng.standard_normal(a2.rows).astype(np.float32)
            )
            for tag, vdt in (("f32", None), ("bf16", jnp.bfloat16)):
                op2 = SpmvOperator(a2, force="dia", values_dtype=vdt)
                bad = _spot_check(a2, op2, x2, rng)
                assert bad is None, f"dia2048 {tag} mismatch: {bad}"
                r2, wall = _bench(op2, x2, 400)
                rate = a2.nnz() / r2.seconds / 1e9
                out[f"dia_stream_2048_gnnz_{tag}"] = round(rate, 1)
                log(
                    f"dia-stream 2048^2 {tag}: {r2.seconds*1e6:.1f} us -> "
                    f"{rate:.1f} Gnnz/s, iters={r2.iters}, wall {wall:.0f}s"
                )
        except Exception as e:  # pragma: no cover - diagnostics only
            log(f"dia-stream row failed: {e!r}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
