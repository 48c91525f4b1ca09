"""Chunked host->device transfers for large arrays.

Measured on the axon-tunneled v5e (2026-08, experiments/transfer_chunks
section of docs/PERF.md): a single 100 MB ``jnp.asarray`` push crawls at
0.5-10 MB/s (the tunnel mishandles large single buffers), while the same
bytes pushed as 8-16 MB chunks and concatenated on device move at
~20-25 MB/s — a 40x same-window difference (194 s vs 4.8 s back to back).
AmgRefresh's selection operators push ~800 MB of plan arrays at 1024^2;
this utility is why planning them costs seconds of transfer, not minutes.

The reshape back to the original shape is folded into the jitted concat
program, so each unique (chunking, dtype, shape) signature costs one
small remote compile (~0.7 s measured) that is cached for the process.
Arrays at or below the threshold, and all CPU-backend arrays, go through
the plain ``jnp.asarray`` path untouched.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["to_device", "transfer_seconds", "transfer_bytes"]

# single-push pathology observed from ~100 MB; stay well below it
_THRESHOLD_BYTES = 32 * 1024 * 1024
_CHUNK_BYTES = 8 * 1024 * 1024

# cumulative wall/bytes spent in to_device pushes — lets benchmarks split
# "host plan work" from "device transfer" honestly (the tunnel's ~20 MB/s
# is environmental; real PCIe moves the same bytes 2 orders faster)
_seconds = 0.0
_bytes = 0


def transfer_seconds() -> float:
    return _seconds


def transfer_bytes() -> int:
    return _bytes


_concat_reshape = None


def _get_concat_reshape():
    global _concat_reshape
    if _concat_reshape is None:
        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("shape",))
        def f(parts, *, shape):
            return jnp.concatenate(parts).reshape(shape)

        _concat_reshape = f
    return _concat_reshape


def to_device(a, dtype=None):
    """``jnp.asarray`` with the large-transfer pathology routed around:
    big host arrays are pushed in ~8 MB chunks and reassembled on device.
    Device arrays and small hosts pass straight through."""
    import time

    import jax
    import jax.numpy as jnp

    global _seconds, _bytes
    if isinstance(a, jax.Array) and dtype is None:
        return a
    a = np.asarray(a) if dtype is None else np.asarray(a, dtype)
    t0 = time.perf_counter()
    try:
        if a.nbytes <= _THRESHOLD_BYTES or jax.default_backend() == "cpu":
            return jnp.asarray(a)
        flat = np.ascontiguousarray(a).reshape(-1)
        ch = max(1, _CHUNK_BYTES // a.dtype.itemsize)
        parts = tuple(
            jnp.asarray(flat[i : i + ch]) for i in range(0, flat.size, ch)
        )
        return _get_concat_reshape()(parts, shape=a.shape)
    finally:
        _seconds += time.perf_counter() - t0
        _bytes += a.nbytes
