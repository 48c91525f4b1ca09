"""Criterion-equivalent measurement harness.

Warmup + repeated timed runs + summary stats, with the TPU-tunnel-aware
methodology this environment requires (see ``.claude/skills/verify``): chain
iterations inside one jit so dispatch can't pipeline away, force completion
with a scalar host readback, and subtract the measured round-trip latency.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import numpy as np

__all__ = ["BenchResult", "bench_host", "bench_device_loop", "tunnel_latency"]


@dataclass
class BenchResult:
    name: str
    seconds: float  # best per-iteration time
    all_runs: list
    iters: int = 1  # chain length the runs were divided by

    @property
    def millis(self) -> float:
        return self.seconds * 1e3

    def throughput(self, units: float) -> float:
        return units / self.seconds

    def stats(self) -> Dict[str, float]:
        """min/median/max per-iteration seconds over the recorded runs —
        the criterion-style spread VERDICT r2 asked the JSON artifacts to
        carry (the reference benches with criterion,
        ``spam_csr/benches/mul_hash.rs:4-11``)."""
        runs = np.asarray(self.all_runs, dtype=np.float64) / max(self.iters, 1)
        return {
            "min": float(runs.min()),
            "median": float(np.median(runs)),
            "max": float(runs.max()),
        }

    def __repr__(self):
        return f"BenchResult({self.name}: {self.millis:.4f} ms)"


def bench_host(name: str, f: Callable, *, warmup: int = 2, repeats: int = 5) -> BenchResult:
    """Wall-clock a host-side callable (native SpGEMM, planners, parsers)."""
    for _ in range(warmup):
        f()
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        f()
        runs.append(time.perf_counter() - t0)
    return BenchResult(name, min(runs), runs)


def tunnel_latency() -> float:
    """Measured host<->device round-trip (readback of a trivial op)."""
    import jax
    import jax.numpy as jnp

    f0 = jax.jit(lambda s: s + 1.0)
    _ = float(f0(jnp.float32(0)))
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(f0(jnp.float32(0)))
        runs.append(time.perf_counter() - t0)
    return min(runs)


def bench_device_loop(
    name: str,
    step: Callable,  # x -> x-like (chained dependency)
    x0,
    *,
    iters: int = 2000,
    repeats: int = 3,
    min_loop_seconds: float = 0.4,
    params=None,
) -> BenchResult:
    """Time ``step`` by chaining ``iters`` applications inside one jit.

    The tunnel round-trip (~25 ms) is noisy AND load-dependent; a chain
    that is merely comparable to it measures the tunnel, not the kernel
    (two round-2/3 headline numbers died of this). The chain length is
    auto-scaled until one loop takes >= ``min_loop_seconds`` (~16x the
    RTT), making the residual RTT subtraction a <5% correction. fori_loop
    tracing is O(1) in ``iters``, so rescaling costs one extra compile.

    ``params``: optional pytree passed to ``step(params, x)`` as a jit
    ARGUMENT instead of a closure constant — large operators
    (``SpmvOperator.as_pytree()``) otherwise bake their arrays into the
    compile payload, which the remote-compile tunnel rejects past ~30 MB
    (HTTP 413; docs/PERF.md scaling section).
    """
    import jax
    import jax.numpy as jnp

    def make_loop(n):
        if params is None:
            @jax.jit
            def loop(x):
                return jax.lax.fori_loop(0, n, lambda i, v: step(v), x)

            return lambda x: loop(x)

        @jax.jit
        def loop_p(p, x):
            return jax.lax.fori_loop(0, n, lambda i, v: step(p, v), x)

        return lambda x: loop_p(params, x)

    loop = make_loop(iters)
    _ = float(jnp.sum(loop(x0)))  # compile + warmup
    lat = tunnel_latency()
    t0 = time.perf_counter()
    _ = float(jnp.sum(loop(x0)))
    first = time.perf_counter() - t0
    if first < min_loop_seconds:
        est_per = max(first - lat, first / 100) / iters
        iters = int(min_loop_seconds / max(est_per, 1e-9)) + 1
        loop = make_loop(iters)
        _ = float(jnp.sum(loop(x0)))
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(jnp.sum(loop(x0)))
        runs.append(time.perf_counter() - t0)
    lat = min(lat, tunnel_latency())
    per = (min(runs) - lat) / iters
    per = max(per, min(runs) / iters / 100)  # clamp below-noise results
    return BenchResult(name, per, [r - lat for r in runs], iters=iters)
