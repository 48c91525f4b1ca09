"""Distributed SpMV over a device mesh.

Row-parallel decomposition (the multi-chip generalization of the reference's
FLOP-balanced row chunking, ``spam_csr/src/mul_hash.rs:38-64``): each device
owns a contiguous block of matrix rows in padded-ELL layout; ``x`` is
replicated (gathered over ICI when it arrives sharded); ``y`` comes back
row-sharded. Two implementations:

* :func:`dist_spmv` — ``shard_map`` with explicit collectives
  (``all_gather`` of x over the mesh axis);
* :func:`dist_spmv_gspmd` — sharding-annotated XLA (GSPMD inserts the
  collectives), the idiomatic jit path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.csr import CsrMatrix
from ..ops.spmv import ell_from_csr

__all__ = ["shard_ell", "dist_spmv", "dist_spmv_gspmd"]


def shard_ell(
    m: CsrMatrix, mesh: Mesh, *, dtype=np.float32, axis: str = "rows"
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Build a row-sharded padded-ELL view of ``m`` on the mesh.

    Rows are padded to a multiple of the mesh size so shards are equal.
    Returns (ell_vals, ell_cols, padded_rows), both sharded on rows.
    """
    n = mesh.devices.size
    ev, ec = ell_from_csr(m, dtype=dtype)
    rows_pad = -(-m.rows // n) * n
    if rows_pad != m.rows:
        ev = np.pad(ev, ((0, rows_pad - m.rows), (0, 0)))
        ec = np.pad(ec, ((0, rows_pad - m.rows), (0, 0)))
    sh = NamedSharding(mesh, P(axis, None))
    return jax.device_put(jnp.asarray(ev), sh), jax.device_put(jnp.asarray(ec), sh), rows_pad


def dist_spmv(ell_vals, ell_cols, x, mesh: Mesh, *, axis: str = "rows"):
    """y = A @ x with explicit collectives: x arrives row-sharded, is
    all-gathered over ICI, each device multiplies its row block."""
    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=P(axis),
    )
    def _spmv(ev, ec, x_shard):
        x_full = jax.lax.all_gather(x_shard, axis, tiled=True)
        return jnp.sum(ev * x_full[ec], axis=1)

    return _spmv(ell_vals, ell_cols, x)


def dist_spmv_gspmd(ell_vals, ell_cols, x, mesh: Mesh, *, axis: str = "rows"):
    """Same computation via sharding constraints; XLA/GSPMD inserts the
    all-gather."""
    y = jnp.sum(ell_vals * x[ell_cols], axis=1)
    return jax.lax.with_sharding_constraint(y, NamedSharding(mesh, P(axis)))
