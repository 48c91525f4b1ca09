"""scipy.sparse.csgraph-parity graph algorithms on :class:`CsrMatrix`.

Capability extension beyond the reference (which stops at the matrix /
kernel layer): the sparse matrix IS the graph. The division of labor
follows the framework stance (reference ``spam_csr/src/mul_hash.rs``
keeps its irregular kernels on the host the same way):

* inherently sequential pointer-chasing — union-find components, Tarjan
  SCC, heap Dijkstra, BFS/DFS orders, the Kruskal accept loop — runs in
  the C++ native runtime (``native/src/spmx_native.cpp``), with
  pure-Python fallbacks when the library isn't built;
* regular relaxation sweeps run on device as tropical-semiring SpMV:
  ``(+, *) -> (min, +)`` turns distance relaxation into the same banded
  static-slice recipe that put the DIA SpMV at the HBM roofline
  (:mod:`sparse_matrix_tpu.graph.device`).

Semantics mirror ``scipy.sparse.csgraph`` (differential-tested in
``tests/test_csgraph.py``): explicit zero entries are edges of weight 0,
absent entries are non-edges; ``directed=False`` treats the input as
undirected taking ``min(w_ij, w_ji)`` where both directions are stored.
"""

from __future__ import annotations

import heapq
from typing import Optional, Sequence, Tuple, Union

import numpy as np

from ..formats.csr import CsrMatrix
from ..native import (
    connected_components_native,
    dijkstra_native,
    hopcroft_karp_native,
    kruskal_native,
    maxflow_native,
    traversal_order_native,
)

__all__ = [
    "NegativeCycleError",
    "bellman_ford",
    "breadth_first_order",
    "breadth_first_tree",
    "connected_components",
    "depth_first_order",
    "depth_first_tree",
    "dijkstra",
    "johnson",
    "laplacian",
    "MaximumFlowResult",
    "maximum_bipartite_matching",
    "maximum_flow",
    "min_weight_full_bipartite_matching",
    "minimum_spanning_tree",
    "reverse_cuthill_mckee",
    "shortest_path",
    "structural_rank",
    "yen",
]


class NegativeCycleError(ValueError):
    """Raised when Bellman-Ford detects a negative-weight cycle."""


# ---------------------------------------------------------------------------
# input plumbing
# ---------------------------------------------------------------------------


def _check_square(a: CsrMatrix) -> int:
    if a.rows != a.cols:
        raise ValueError(f"graph adjacency must be square, got {a.rows}x{a.cols}")
    return a.rows


def _coo(a: CsrMatrix):
    r = np.repeat(np.arange(a.rows, dtype=np.int64), np.diff(a.offsets))
    return r, a.indices.astype(np.int64), np.asarray(a.vals, dtype=np.float64)


def _undirected_min(a: CsrMatrix) -> CsrMatrix:
    """Symmetrize taking ``min(w_ij, w_ji)`` where both directions exist
    (the scipy.sparse.csgraph ``directed=False`` convention)."""
    n = _check_square(a)
    r, c, v = _coo(a)
    ri = np.concatenate([r, c])
    ci = np.concatenate([c, r])
    vi = np.concatenate([v, v])
    if len(ri) == 0:
        return CsrMatrix(n, n, vi, ci.astype(np.uint32), np.zeros(n + 1, np.int64), is_sorted=True)
    keys = ri * n + ci
    order = np.argsort(keys, kind="stable")
    keys, ri, ci, vi = keys[order], ri[order], ci[order], vi[order]
    head = np.empty(len(keys), dtype=bool)
    head[0] = True
    np.not_equal(keys[1:], keys[:-1], out=head[1:])
    seg = np.cumsum(head) - 1
    vmin = np.full(int(seg[-1]) + 1, np.inf)
    np.minimum.at(vmin, seg, vi)
    return CsrMatrix.from_coo(n, n, ri[head], ci[head], vmin, sum_duplicates=False)


def _sources(indices, n: int) -> Tuple[np.ndarray, bool]:
    """Normalize the ``indices`` argument; returns (array, was_scalar)."""
    if indices is None:
        return np.arange(n, dtype=np.int64), False
    scalar = np.isscalar(indices) or (
        isinstance(indices, np.ndarray) and indices.ndim == 0
    )
    idx = np.atleast_1d(np.asarray(indices, dtype=np.int64))
    if idx.size and (idx.min() < 0 or idx.max() >= n):
        raise ValueError(f"source index out of range [0, {n})")
    return idx, scalar


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def connected_components(
    a: CsrMatrix,
    directed: bool = True,
    connection: str = "weak",
    return_labels: bool = True,
):
    """Component count (and labels) of the adjacency pattern.

    ``connection="weak"`` (or ``directed=False``) treats every edge as
    undirected; ``"strong"`` computes strongly connected components
    (iterative Tarjan). Labels are numbered by first row occurrence.
    scipy parity: ``scipy.sparse.csgraph.connected_components``.
    """
    n = _check_square(a)
    if connection not in ("weak", "strong"):
        raise ValueError(f"connection must be 'weak' or 'strong', got {connection!r}")
    strong = connection == "strong" and directed
    res = connected_components_native(n, a.offsets, a.indices, strong=strong)
    if res is None:
        res = _components_py(n, a.offsets, a.indices, strong=strong)
    nc, labels = res
    return (nc, labels.astype(np.int32)) if return_labels else nc


def _components_py(n, offsets, indices, *, strong):
    labels = np.full(n, -1, dtype=np.int64)
    if not strong:
        # flood fill over the (virtually) symmetrized pattern
        radj = [[] for _ in range(n)]
        for i in range(n):
            for t in range(int(offsets[i]), int(offsets[i + 1])):
                radj[int(indices[t])].append(i)
        nc = 0
        for s in range(n):
            if labels[s] >= 0:
                continue
            stack = [s]
            labels[s] = nc
            while stack:
                v = stack.pop()
                nbrs = [int(indices[t]) for t in range(int(offsets[v]), int(offsets[v + 1]))]
                for w in nbrs + radj[v]:
                    if labels[w] < 0:
                        labels[w] = nc
                        stack.append(w)
            nc += 1
        return nc, labels
    # iterative Tarjan (same structure as the native version)
    disc = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    onstk = np.zeros(n, dtype=bool)
    stk: list = []
    timer = 0
    nc = 0
    for s in range(n):
        if disc[s] >= 0:
            continue
        callv, calle = [s], [int(offsets[s])]
        disc[s] = low[s] = timer
        timer += 1
        stk.append(s)
        onstk[s] = True
        while callv:
            v = callv[-1]
            if calle[-1] < int(offsets[v + 1]):
                w = int(indices[calle[-1]])
                calle[-1] += 1
                if disc[w] < 0:
                    disc[w] = low[w] = timer
                    timer += 1
                    stk.append(w)
                    onstk[w] = True
                    callv.append(w)
                    calle.append(int(offsets[w]))
                elif onstk[w]:
                    low[v] = min(low[v], disc[w])
            else:
                callv.pop()
                calle.pop()
                if low[v] == disc[v]:
                    while True:
                        w = stk.pop()
                        onstk[w] = False
                        labels[w] = nc
                        if w == v:
                            break
                    nc += 1
                if callv:
                    low[callv[-1]] = min(low[callv[-1]], low[v])
    remap = np.full(nc, -1, dtype=np.int64)
    k = 0
    for i in range(n):
        if remap[labels[i]] < 0:
            remap[labels[i]] = k
            k += 1
        labels[i] = remap[labels[i]]
    return nc, labels


# ---------------------------------------------------------------------------
# shortest paths
# ---------------------------------------------------------------------------


def dijkstra(
    a: CsrMatrix,
    directed: bool = True,
    indices=None,
    return_predecessors: bool = False,
    unweighted: bool = False,
):
    """Dijkstra distances from ``indices`` (all nodes when None).

    Returns a float64 ``(len(indices), n)`` matrix (1-D for a scalar
    index); unreached entries are ``+inf``. Raises ValueError on negative
    weights — route those to :func:`bellman_ford`. scipy parity:
    ``scipy.sparse.csgraph.dijkstra``.
    """
    n = _check_square(a)
    g = a if directed else _undirected_min(a)
    vals = np.ones(g.nnz(), dtype=np.float64) if unweighted else np.asarray(
        g.vals, dtype=np.float64
    )
    if vals.size and vals.min() < 0:
        raise ValueError("dijkstra requires non-negative weights; use bellman_ford")
    src, scalar = _sources(indices, n)
    dist = np.empty((len(src), n), dtype=np.float64)
    pred = np.empty((len(src), n), dtype=np.int64)
    for s, root in enumerate(src):
        res = dijkstra_native(n, g.offsets, g.indices, vals, int(root))
        if res is None:
            res = _dijkstra_py(n, g.offsets, g.indices, vals, int(root))
        dist[s], pred[s] = res
    if scalar:
        dist, pred = dist[0], pred[0]
    return (dist, pred) if return_predecessors else dist


def _dijkstra_py(n, offsets, indices, vals, source):
    dist = np.full(n, np.inf)
    pred = np.full(n, -1, dtype=np.int64)
    dist[source] = 0.0
    pq = [(0.0, source)]
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist[v]:
            continue
        for t in range(int(offsets[v]), int(offsets[v + 1])):
            w = int(indices[t])
            nd = d + float(vals[t])
            if nd < dist[w]:
                dist[w] = nd
                pred[w] = v
                heapq.heappush(pq, (nd, w))
    return dist, pred


def bellman_ford(
    a: CsrMatrix,
    directed: bool = True,
    indices=None,
    return_predecessors: bool = False,
):
    """Bellman-Ford distances (negative weights allowed; raises
    :class:`NegativeCycleError` on a reachable negative cycle).

    Host path: vectorized full-edge relaxation sweeps over numpy COO —
    every sweep is one ``minimum.at`` scatter, converging in (diameter)
    sweeps with an n-1 sweep negative-cycle bound. Banded graphs should
    prefer :func:`sparse_matrix_tpu.graph.device.bellman_ford_device`.
    scipy parity: ``scipy.sparse.csgraph.bellman_ford``.
    """
    n = _check_square(a)
    g = a if directed else _undirected_min(a)
    ei, ej, w = _coo(g)
    src, scalar = _sources(indices, n)
    dist = np.full((len(src), n), np.inf)
    dist[np.arange(len(src)), src] = 0.0
    for _sweep in range(max(1, n - 1)):
        cand = dist[:, ei] + w  # (S, nnz)
        before = dist.copy()
        np.minimum.at(dist, (slice(None), ej), cand)
        if np.array_equal(before, dist):
            break
    else:
        cand = dist[:, ei] + w
        improved = dist.copy()
        np.minimum.at(improved, (slice(None), ej), cand)
        if not np.array_equal(improved, dist):
            raise NegativeCycleError("negative-weight cycle reachable from sources")
    pred = np.full((len(src), n), -1, dtype=np.int64)
    if return_predecessors:
        for s in range(len(src)):
            tight = np.isfinite(dist[s, ej]) & np.isclose(
                dist[s, ei] + w, dist[s, ej]
            ) & (ej != src[s])
            pred[s, ej[tight]] = ei[tight]
    if scalar:
        dist, pred = dist[0], pred[0]
    return (dist, pred) if return_predecessors else dist


def johnson(
    a: CsrMatrix,
    directed: bool = True,
    indices=None,
    return_predecessors: bool = False,
):
    """Johnson all-pairs/multi-source shortest paths with NEGATIVE edge
    weights: one Bellman-Ford potential pass h (virtual source = start
    every node at 0), reweight ``w' = w + h[u] - h[v] >= 0``, then
    Dijkstra per source and unshift. Raises :class:`NegativeCycleError`
    like BF. scipy parity: ``scipy.sparse.csgraph.johnson``."""
    n = _check_square(a)
    gm = a if directed else _undirected_min(a)
    ei, ej, w = _coo(gm)
    # potentials: BF with every node a source (the virtual-source trick)
    h = np.zeros(n)
    for _sweep in range(max(1, n - 1)):
        before = h.copy()
        np.minimum.at(h, ej, h[ei] + w)
        if np.array_equal(before, h):
            break
    else:
        probe = h.copy()
        np.minimum.at(probe, ej, h[ei] + w)
        if not np.array_equal(probe, h):
            raise NegativeCycleError("negative-weight cycle present")
    gw = CsrMatrix(
        n, n, w + h[ei] - h[ej], gm.indices, gm.offsets, is_sorted=gm.is_sorted
    )
    src, scalar = _sources(indices, n)
    out = dijkstra(
        gw, directed=True, indices=src,
        return_predecessors=return_predecessors,
    )
    dist, pred = out if return_predecessors else (out, None)
    dist = dist - h[src][:, None] + h[None, :]
    if scalar:
        dist = dist[0]
        pred = None if pred is None else pred[0]
    return (dist, pred) if return_predecessors else dist


def shortest_path(
    a: CsrMatrix,
    method: str = "auto",
    directed: bool = True,
    indices=None,
    return_predecessors: bool = False,
    unweighted: bool = False,
):
    """One-call shortest paths, dispatching like scipy's:

    * ``"auto"`` — Dijkstra for non-negative weights; device min-plus
      Bellman-Ford when the graph is banded enough for the DIA recipe
      and predecessors aren't requested; host Bellman-Ford for negative
      weights.
    * ``"D"`` / ``"BF"`` / ``"J"`` / ``"FW"`` — force Dijkstra / host
      Bellman-Ford / Johnson (BF-reweighted Dijkstra, the cheaper choice
      for negative weights with many sources) / device Floyd-Warshall
      (all-pairs; ignores ``indices``).
    """
    n = _check_square(a)
    if unweighted:
        a = CsrMatrix(
            n, n, np.ones(a.nnz(), np.float64), a.indices, a.offsets,
            is_sorted=a.is_sorted,
        )
    negative = a.nnz() > 0 and float(np.min(a.vals)) < 0
    if method == "auto":
        if negative:
            method = "BF"
        elif not return_predecessors:
            from .device import banded_graph_plan

            plan = banded_graph_plan(a if directed else _undirected_min(a))
            if plan is not None:
                from .device import bellman_ford_device

                src, scalar = _sources(indices, n)
                dist = bellman_ford_device(plan, src)
                return dist[0] if scalar else dist
            method = "D"
        else:
            method = "D"
    if method == "D":
        return dijkstra(
            a, directed=directed, indices=indices,
            return_predecessors=return_predecessors,
        )
    if method == "BF":
        return bellman_ford(
            a, directed=directed, indices=indices,
            return_predecessors=return_predecessors,
        )
    if method == "J":
        return johnson(
            a, directed=directed, indices=indices,
            return_predecessors=return_predecessors,
        )
    if method == "FW":
        from .device import floyd_warshall_device

        out = floyd_warshall_device(
            a if directed else _undirected_min(a),
            return_predecessors=return_predecessors,
        )
        dist, pred = out if return_predecessors else (out, None)
        if indices is not None:
            src, scalar = _sources(indices, n)
            dist = dist[src]
            if pred is not None:
                pred = pred[src]
                return (dist[0], pred[0]) if scalar else (dist, pred)
            return dist[0] if scalar else dist
        return (dist, pred) if return_predecessors else dist
    raise ValueError(f"unknown method {method!r}")


def floyd_warshall(
    a: CsrMatrix,
    directed: bool = True,
    return_predecessors: bool = False,
    unweighted: bool = False,
):
    """All-pairs shortest paths (scipy.sparse.csgraph.floyd_warshall name):
    the dense (min, +) DP runs on device — n fused rank-1 tropical updates
    in one ``lax.fori_loop`` (:func:`~sparse_matrix_tpu.graph.device.
    floyd_warshall_device`); ``return_predecessors`` carries the int32
    predecessor matrix through the same loop."""
    return shortest_path(
        a, method="FW", directed=directed,
        return_predecessors=return_predecessors, unweighted=unweighted,
    )


def csgraph_to_dense(a: CsrMatrix, null_value: float = 0.0) -> np.ndarray:
    """Dense adjacency with ``null_value`` marking absent edges (scipy
    semantics: stored entries win, including explicit zeros)."""
    n_r, n_c = a.shape
    out = np.full((n_r, n_c), float(null_value), dtype=np.float64)
    out[a.row_ids(), a.indices.astype(np.int64)] = a.vals
    return out


def csgraph_to_masked(a: CsrMatrix) -> np.ma.MaskedArray:
    """Dense masked-array adjacency: absent edges masked, stored entries
    (including explicit zeros) unmasked. scipy parity:
    ``scipy.sparse.csgraph.csgraph_to_masked``."""
    n_r, n_c = a.shape
    data = np.zeros((n_r, n_c), dtype=np.float64)
    mask = np.ones((n_r, n_c), dtype=bool)
    r, c = a.row_ids(), a.indices.astype(np.int64)
    data[r, c] = a.vals
    mask[r, c] = False
    return np.ma.MaskedArray(data, mask=mask)


def csgraph_from_masked(arr) -> CsrMatrix:
    """CSR adjacency from a masked dense array (masked = absent edge).
    scipy parity: ``scipy.sparse.csgraph.csgraph_from_masked``."""
    arr = np.ma.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("csgraph_from_masked expects a 2-D array")
    keep = ~np.ma.getmaskarray(arr)
    r, c = np.nonzero(keep)
    return CsrMatrix.from_coo(
        arr.shape[0], arr.shape[1], r, c,
        np.asarray(arr.data, dtype=np.float64)[r, c],
    )


def csgraph_masked_from_dense(
    arr, null_value=0.0, nan_null: bool = True, infinity_null: bool = True
) -> np.ma.MaskedArray:
    """Masked adjacency from a dense array: entries equal to
    ``null_value`` (and NaN / ±inf when the flags say so) become masked.
    scipy parity: ``scipy.sparse.csgraph.csgraph_masked_from_dense``."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim != 2:
        raise ValueError("csgraph_masked_from_dense expects a 2-D array")
    mask = np.zeros(arr.shape, dtype=bool)
    if null_value is not None:
        mask |= arr == null_value
    if nan_null:
        mask |= np.isnan(arr)
    if infinity_null:
        mask |= np.isinf(arr)
    return np.ma.MaskedArray(arr, mask=mask)


def _edge_weights(g: CsrMatrix, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Weights of edges (u[k], v[k]) from sorted CSR (vectorized
    per-edge binary search; missing edges read 0)."""
    w = np.zeros(len(u), dtype=np.float64)
    off = g.offsets.astype(np.int64)
    cols = g.indices.astype(np.int64)
    for k in range(len(u)):
        lo, hi = off[u[k]], off[u[k] + 1]
        t = lo + np.searchsorted(cols[lo:hi], v[k])
        if t < hi and cols[t] == v[k]:
            w[k] = g.vals[t]
    return w


def reconstruct_path(
    a: CsrMatrix, predecessors: np.ndarray, directed: bool = True
) -> CsrMatrix:
    """Tree CSR from one predecessor vector (edges ``pred[i] -> i`` with
    the graph's weights; negative sentinel = no predecessor). scipy
    parity: ``scipy.sparse.csgraph.reconstruct_path``."""
    n = _check_square(a)
    pred = np.asarray(predecessors, dtype=np.int64).ravel()
    if pred.shape != (n,):
        raise ValueError("predecessors must have one entry per node")
    g = a if directed else _undirected_min(a)
    child = np.nonzero(pred >= 0)[0]
    w = _edge_weights(g, pred[child], child)
    return CsrMatrix.from_coo(n, n, pred[child], child, w)


def construct_dist_matrix(
    a: CsrMatrix,
    predecessors: np.ndarray,
    directed: bool = True,
    null_value: float = np.inf,
) -> np.ndarray:
    """Distance matrix recomputed by walking predecessor trees and
    summing the graph's edge weights (one DP pass per source). scipy
    parity: ``scipy.sparse.csgraph.construct_dist_matrix`` — the
    predecessor matrix must be square (n, n), row ``s`` describing the
    tree rooted at source ``s``: ``dist[s, s] = 0``, nodes with no
    predecessor (and != s) read ``null_value``."""
    n = _check_square(a)
    pred = np.asarray(predecessors, dtype=np.int64)
    if pred.shape != (n, n):
        raise ValueError(
            "predecessors must be a square (n, n) matrix; row s is the "
            "predecessor tree of source s")
    g = a if directed else _undirected_min(a)
    out = np.full(pred.shape, float(null_value), dtype=np.float64)
    for s in range(n):
        p = pred[s]
        child = np.nonzero(p >= 0)[0]
        w = np.zeros(n, dtype=np.float64)
        w[child] = _edge_weights(g, p[child], child)
        dist = np.full(n, np.nan)
        dist[s] = 0.0  # the row's source; other roots are unreachable
        # Propagate down the forest: children become ready once their
        # predecessor's distance is known; a forest has depth <= n.
        pending = child
        while len(pending):
            ready = pending[~np.isnan(dist[p[pending]])]
            if not len(ready):
                break  # unreachable subtree or cycle: leave NaN -> null
            dist[ready] = dist[p[ready]] + w[ready]
            keep = np.ones(n, dtype=bool)
            keep[ready] = False
            pending = pending[keep[pending]]
        have = ~np.isnan(dist)
        out[s, have] = dist[have]
    return out


# ---------------------------------------------------------------------------
# traversals
# ---------------------------------------------------------------------------


def _order(a: CsrMatrix, i_start: int, directed: bool, *, dfs: bool):
    n = _check_square(a)
    if not (0 <= int(i_start) < n):
        raise ValueError(f"start node {i_start} out of range [0, {n})")
    g = a if directed else _undirected_min(a)
    res = traversal_order_native(n, g.offsets, g.indices, int(i_start), dfs=dfs)
    if res is None:
        res = _order_py(n, g.offsets, g.indices, int(i_start), dfs=dfs)
    return res


def _order_py(n, offsets, indices, source, *, dfs):
    vis = np.zeros(n, dtype=bool)
    pred = np.full(n, -1, dtype=np.int64)
    order = [source]
    vis[source] = True
    if not dfs:
        head = 0
        while head < len(order):
            v = order[head]
            head += 1
            for t in range(int(offsets[v]), int(offsets[v + 1])):
                w = int(indices[t])
                if not vis[w]:
                    vis[w] = True
                    pred[w] = v
                    order.append(w)
        return np.asarray(order, dtype=np.int64), pred
    sv, se = [source], [int(offsets[source])]
    while sv:
        v = sv[-1]
        if se[-1] < int(offsets[v + 1]):
            w = int(indices[se[-1]])
            se[-1] += 1
            if not vis[w]:
                vis[w] = True
                pred[w] = v
                order.append(w)
                sv.append(w)
                se.append(int(offsets[w]))
        else:
            sv.pop()
            se.pop()
    return np.asarray(order, dtype=np.int64), pred


def breadth_first_order(
    a: CsrMatrix, i_start: int, directed: bool = True,
    return_predecessors: bool = True,
):
    """BFS visitation order (and parents) from ``i_start``. scipy parity:
    ``scipy.sparse.csgraph.breadth_first_order``."""
    order, pred = _order(a, i_start, directed, dfs=False)
    return (order, pred) if return_predecessors else order


def depth_first_order(
    a: CsrMatrix, i_start: int, directed: bool = True,
    return_predecessors: bool = True,
):
    """DFS preorder (neighbors in ascending-column order) from
    ``i_start``. scipy parity: ``scipy.sparse.csgraph.depth_first_order``."""
    order, pred = _order(a, i_start, directed, dfs=True)
    return (order, pred) if return_predecessors else order


def _tree_from_pred(a: CsrMatrix, g: CsrMatrix, pred: np.ndarray) -> CsrMatrix:
    n = a.rows
    child = np.flatnonzero(pred >= 0)
    parent = pred[child]
    w = np.empty(len(child))
    for k in range(len(child)):  # tree has < n edges; row scan is cheap
        i, j = int(parent[k]), int(child[k])
        lo, hi = int(g.offsets[i]), int(g.offsets[i + 1])
        pos = lo + int(np.searchsorted(g.indices[lo:hi], np.uint32(j)))
        w[k] = g.vals[pos]
    return CsrMatrix.from_coo(n, n, parent, child, w)


def breadth_first_tree(a: CsrMatrix, i_start: int, directed: bool = True) -> CsrMatrix:
    """The BFS spanning tree as a CSR with edge (parent, child) weights."""
    g = a if directed else _undirected_min(a)
    _order_arr, pred = _order(a, i_start, directed, dfs=False)
    return _tree_from_pred(a, g, pred)


def depth_first_tree(a: CsrMatrix, i_start: int, directed: bool = True) -> CsrMatrix:
    """The DFS spanning tree as a CSR with edge (parent, child) weights."""
    g = a if directed else _undirected_min(a)
    _order_arr, pred = _order(a, i_start, directed, dfs=True)
    return _tree_from_pred(a, g, pred)


# ---------------------------------------------------------------------------
# minimum spanning tree / laplacian
# ---------------------------------------------------------------------------


def minimum_spanning_tree(a: CsrMatrix) -> CsrMatrix:
    """Kruskal minimum spanning forest of the undirected graph
    (``min(w_ij, w_ji)`` weights). Edge extraction + weight sort are
    vectorized numpy; the sequential union-find accept loop runs native.
    Kept edges land at their ``(min(i,j), max(i,j))`` position. scipy
    parity: ``scipy.sparse.csgraph.minimum_spanning_tree``."""
    n = _check_square(a)
    g = _undirected_min(a)
    r, c, v = _coo(g)
    keep_upper = r < c
    ei, ej, w = r[keep_upper], c[keep_upper], v[keep_upper]
    order = np.argsort(w, kind="stable")
    mask = kruskal_native(n, ei, ej, order)
    if mask is None:
        mask = _kruskal_py(n, ei, ej, order)
    sel = mask.astype(bool)
    return CsrMatrix.from_coo(n, n, ei[sel], ej[sel], w[sel], sum_duplicates=False)


def _kruskal_py(n, ei, ej, order):
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    keep = np.zeros(len(ei), dtype=np.int64)
    for t in order:
        ra, rb = find(int(ei[t])), find(int(ej[t]))
        if ra != rb:
            parent[rb] = ra
            keep[t] = 1
    return keep


def laplacian(
    a: CsrMatrix,
    normed: bool = False,
    return_diag: bool = False,
    use_out_degree: bool = False,
):
    """Graph Laplacian ``L = D - A`` (input diagonal ignored, scipy
    convention; degree = in-degree column sums unless
    ``use_out_degree``); ``normed=True`` gives ``I - D^-1/2 A D^-1/2``
    with isolated nodes' diagonal left 0. scipy parity:
    ``scipy.sparse.csgraph.laplacian``."""
    n = _check_square(a)
    r, c, v = _coo(a)
    off = r != c
    r, c, v = r[off], c[off], v[off]
    deg = np.zeros(n)
    np.add.at(deg, r if use_out_degree else c, v)
    if not normed:
        ri = np.concatenate([r, np.arange(n, dtype=np.int64)])
        ci = np.concatenate([c, np.arange(n, dtype=np.int64)])
        vi = np.concatenate([-v, deg])
        lap = CsrMatrix.from_coo(n, n, ri, ci, vi)
        return (lap, deg) if return_diag else lap
    # scipy convention: isolated (zero-degree) nodes scale as degree 1 so
    # their off-diagonal entries survive, but their diagonal stays 0
    isolated = deg == 0
    inv_sqrt = 1.0 / np.sqrt(np.where(isolated, 1.0, deg))
    ri = np.concatenate([r, np.arange(n, dtype=np.int64)])
    ci = np.concatenate([c, np.arange(n, dtype=np.int64)])
    vi = np.concatenate([-v * inv_sqrt[r] * inv_sqrt[c], (~isolated).astype(np.float64)])
    lap = CsrMatrix.from_coo(n, n, ri, ci, vi)
    d = np.where(isolated, 0.0, np.sqrt(deg))
    return (lap, d) if return_diag else lap


# ---------------------------------------------------------------------------
# bipartite matching / structural rank / ordering
# ---------------------------------------------------------------------------


def _bipartite_match(a: CsrMatrix):
    res = hopcroft_karp_native(a.rows, a.cols, a.offsets, a.indices)
    if res is not None:
        return res
    # Kuhn fallback (recursion-free): augment from each free row by DFS
    mr = np.full(a.rows, -1, dtype=np.int64)
    mc = np.full(a.cols, -1, dtype=np.int64)
    size = 0
    for s in range(a.rows):
        # BFS-augmenting (simple alternating search, one path per root)
        parent_col = {}
        frontier = [s]
        seen_rows = {s}
        free_col = -1
        while frontier and free_col < 0:
            nxt = []
            for v in frontier:
                for t in range(int(a.offsets[v]), int(a.offsets[v + 1])):
                    j = int(a.indices[t])
                    if j in parent_col:
                        continue
                    parent_col[j] = v
                    w = int(mc[j])
                    if w < 0:
                        free_col = j
                        break
                    if w not in seen_rows:
                        seen_rows.add(w)
                        nxt.append(w)
                if free_col >= 0:
                    break
            frontier = nxt
        if free_col >= 0:
            j = free_col
            while True:
                v = parent_col[j]
                pj = int(mr[v])
                mc[j] = v
                mr[v] = j
                if pj < 0:
                    break
                j = pj
            size += 1
    return size, mr, mc


def maximum_bipartite_matching(a: CsrMatrix, perm_type: str = "row") -> np.ndarray:
    """Maximum bipartite matching of the rows-vs-columns pattern
    (Hopcroft-Karp in the native runtime, O(E sqrt(V))). scipy convention:
    ``perm_type="row"`` returns, for each COLUMN, its matched row (size
    ``cols``); ``"column"`` returns, for each ROW, its matched column
    (size ``rows``); -1 = unmatched. scipy parity:
    ``scipy.sparse.csgraph.maximum_bipartite_matching``."""
    if perm_type not in ("row", "column"):
        raise ValueError(f"perm_type must be 'row' or 'column', got {perm_type!r}")
    _size, mr, mc = _bipartite_match(a)
    return (mc if perm_type == "row" else mr).astype(np.int32)


def structural_rank(a: CsrMatrix) -> int:
    """Maximum rank of ``a`` over all numeric value assignments to its
    pattern = the maximum bipartite matching size. scipy parity:
    ``scipy.sparse.csgraph.structural_rank``."""
    return _bipartite_match(a)[0]


def reverse_cuthill_mckee(a: CsrMatrix, symmetric_mode: bool = False) -> np.ndarray:
    """Bandwidth-reducing RCM permutation; delegates to the library\'s
    existing reordering machinery (``formats/reorder.py``, which
    symmetrizes the pattern — ``symmetric_mode`` is accepted for scipy
    signature parity and ignored). scipy parity:
    ``scipy.sparse.csgraph.reverse_cuthill_mckee``."""
    from ..formats.reorder import rcm_permutation

    del symmetric_mode
    return rcm_permutation(a).astype(np.int32)


# ---------------------------------------------------------------------------
# maximum flow
# ---------------------------------------------------------------------------


class MaximumFlowResult:
    """``flow_value`` plus the antisymmetric ``flow`` CSR (flow[i,j] =
    -flow[j,i] on the input pattern union its transpose), mirroring
    scipy's result object."""

    __slots__ = ("flow_value", "flow")

    def __init__(self, flow_value: int, flow: CsrMatrix):
        self.flow_value = flow_value
        self.flow = flow


def maximum_flow(a: CsrMatrix, source: int, sink: int) -> MaximumFlowResult:
    """Maximum s-t flow on INTEGER edge capacities (Dinic in the native
    runtime, O(V^2 E); Edmonds-Karp Python fallback). scipy parity:
    ``scipy.sparse.csgraph.maximum_flow`` (same integrality requirement).
    """
    n = _check_square(a)
    if not (0 <= source < n and 0 <= sink < n):
        raise ValueError("source/sink out of range")
    if source == sink:
        raise ValueError("source and sink must differ")
    r, c, w = _coo(a)
    cap = np.asarray(a.vals)
    if not np.issubdtype(cap.dtype, np.integer):
        capi = np.asarray(w, dtype=np.int64)
        if not np.array_equal(capi.astype(np.float64), w):
            raise ValueError("maximum_flow requires integer capacities")
    else:
        capi = cap.astype(np.int64)
    if (capi < 0).any():
        raise ValueError("capacities must be non-negative")
    keep = r != c  # self-loops carry no s-t flow
    r, c, capi = r[keep], c[keep], capi[keep]
    res = maxflow_native(n, r, c, capi, source, sink)
    if res is None:
        res = _maxflow_py(n, r, c, capi, source, sink)
    val, flow = res
    # antisymmetric flow matrix on pattern + reverse pattern
    fr = np.concatenate([r, c])
    fc = np.concatenate([c, r])
    fv = np.concatenate([flow, -flow]).astype(np.float64)
    mat = CsrMatrix.from_coo(n, n, fr, fc, fv)  # duplicates (2-cycles) sum
    return MaximumFlowResult(int(val), mat)


# ---------------------------------------------------------------------------
# K-shortest simple paths (Yen)
# ---------------------------------------------------------------------------


def _sp_masked(n, offsets, indices, vals, src, sink, node_block, edge_block,
               negative):
    """Shortest SIMPLE path ``src -> sink`` honoring blocked nodes/edges.

    Returns ``(cost, [src, ..., sink])`` or ``None`` when unreachable.
    Non-negative weights: binary-heap Dijkstra with early exit at the
    sink. Negative weights: SPFA (queue Bellman-Ford) with an n-relax
    negative-cycle bound raising :class:`NegativeCycleError` — without a
    negative cycle BF shortest paths are simple, which is what Yen's spur
    step needs. Masks change on every spur, so this stays in Python
    rather than rebuilding a filtered CSR for the native kernels each
    time (the rebuild costs more than the traversal at spur scale)."""
    INF = np.inf
    dist = np.full(n, INF)
    pred = np.full(n, -1, dtype=np.int64)
    dist[src] = 0.0
    if not negative:
        pq = [(0.0, src)]
        while pq:
            d, v = heapq.heappop(pq)
            if d > dist[v]:
                continue
            if v == sink:
                break
            for t in range(int(offsets[v]), int(offsets[v + 1])):
                w = int(indices[t])
                if edge_block is not None and edge_block[t]:
                    continue
                if node_block is not None and node_block[w]:
                    continue
                nd = d + float(vals[t])
                if nd < dist[w]:
                    dist[w] = nd
                    pred[w] = v
                    heapq.heappush(pq, (nd, w))
    else:
        from collections import deque

        relax = np.zeros(n, dtype=np.int64)
        inq = np.zeros(n, dtype=bool)
        q = deque([src])
        inq[src] = True
        while q:
            v = q.popleft()
            inq[v] = False
            d = dist[v]
            for t in range(int(offsets[v]), int(offsets[v + 1])):
                w = int(indices[t])
                if edge_block is not None and edge_block[t]:
                    continue
                if node_block is not None and node_block[w]:
                    continue
                nd = d + float(vals[t])
                if nd < dist[w]:
                    dist[w] = nd
                    pred[w] = v
                    relax[w] += 1
                    if relax[w] > n:
                        raise NegativeCycleError(
                            "negative-weight cycle reachable from source"
                        )
                    if not inq[w]:
                        inq[w] = True
                        q.append(w)
    if not np.isfinite(dist[sink]):
        return None
    path = [sink]
    while path[-1] != src:
        path.append(int(pred[path[-1]]))
    path.reverse()
    return float(dist[sink]), path


def yen(
    a: CsrMatrix,
    source: int,
    sink: int,
    K: int,
    *,
    directed: bool = True,
    return_predecessors: bool = False,
    unweighted: bool = False,
):
    """Yen's K-shortest SIMPLE paths from ``source`` to ``sink``.

    Returns a float64 distance array of the up-to-K cheapest loopless
    path costs found (shorter when fewer exist, empty when the sink is
    unreachable); with ``return_predecessors`` also an int32 ``(K', n)``
    predecessor matrix, one per-path chain per row, ``-9999`` elsewhere.
    Negative weights are allowed (spur searches switch from Dijkstra to
    queue Bellman-Ford); a reachable negative cycle raises
    :class:`NegativeCycleError`. scipy parity:
    ``scipy.sparse.csgraph.yen`` (same semantics incl. the trivial
    ``source == sink`` zero path).
    """
    n = _check_square(a)
    if not (0 <= int(source) < n and 0 <= int(sink) < n):
        raise ValueError("source/sink out of range")
    if K < 1:
        raise ValueError("K must be >= 1")
    NULL = -9999
    if int(source) == int(sink):
        dist = np.zeros(1)
        pred = np.full((1, n), NULL, dtype=np.int32)
        return (dist, pred) if return_predecessors else dist
    g = a if directed else _undirected_min(a)
    vals = (
        np.ones(g.nnz(), dtype=np.float64)
        if unweighted
        else np.asarray(g.vals, dtype=np.float64)
    )
    negative = bool(vals.size) and float(vals.min()) < 0
    offsets, indices = g.offsets, g.indices
    nnz = len(vals)

    first = _sp_masked(
        n, offsets, indices, vals, int(source), int(sink), None, None, negative
    )
    if first is None:
        out = np.empty(0, dtype=np.float64)
        if return_predecessors:
            return out, np.full((0, n), NULL, dtype=np.int32)
        return out

    def edge_pos(u, v):
        lo, hi = int(offsets[u]), int(offsets[u + 1])
        hit = np.flatnonzero(indices[lo:hi] == np.uint32(v))
        return lo + int(hit[0])

    accepted = [first]
    candidates: list = []  # heap of (cost, path-as-tuple)
    seen = {tuple(first[1])}
    while len(accepted) < K:
        prev_cost, prev_path = accepted[-1]
        # prefix costs along prev_path
        pref = [0.0]
        for i in range(len(prev_path) - 1):
            pref.append(pref[-1] + float(vals[edge_pos(prev_path[i], prev_path[i + 1])]))
        for i in range(len(prev_path) - 1):
            spur = prev_path[i]
            root = prev_path[: i + 1]
            edge_block = np.zeros(nnz, dtype=bool)
            for _c, p in accepted:
                if len(p) > i and p[: i + 1] == root:
                    edge_block[edge_pos(p[i], p[i + 1])] = True
            node_block = np.zeros(n, dtype=bool)
            node_block[root[:-1]] = True
            res = _sp_masked(
                n, offsets, indices, vals, spur, int(sink),
                node_block, edge_block, negative,
            )
            if res is None:
                continue
            spur_cost, spur_path = res
            cand = tuple(root[:-1] + spur_path)
            if cand in seen:
                continue
            seen.add(cand)
            heapq.heappush(candidates, (pref[i] + spur_cost, cand))
        if not candidates:
            break
        c, p = heapq.heappop(candidates)
        accepted.append((c, list(p)))
    dist = np.asarray([c for c, _p in accepted], dtype=np.float64)
    if not return_predecessors:
        return dist
    pred = np.full((len(accepted), n), NULL, dtype=np.int32)
    for k, (_c, p) in enumerate(accepted):
        for i in range(len(p) - 1):
            pred[k, p[i + 1]] = p[i]
    return dist, pred


# ---------------------------------------------------------------------------
# min-weight full bipartite matching (sparse LAPJV)
# ---------------------------------------------------------------------------


def min_weight_full_bipartite_matching(b: CsrMatrix, maximize: bool = False):
    """Minimum-weight FULL matching of the smaller side of a bipartite
    graph given as its sparse biadjacency (absent entries = non-edges;
    explicit zeros are removed first, with the same UserWarning as
    scipy). Returns ``(row_ind, col_ind)`` pairs sorted by row index;
    raises ValueError when no full matching exists. scipy parity:
    ``scipy.sparse.csgraph.min_weight_full_bipartite_matching`` (LAPJVsp;
    here Jonker-Volgenant successive shortest augmenting paths with dual
    potentials — Dijkstra over reduced costs, kept non-negative by a
    global weight shift, which preserves the argmin because every full
    matching has exactly ``min(rows, cols)`` edges).
    """
    import warnings

    r, c, v = _coo(b)
    if v.size and np.any(v == 0):
        warnings.warn("explicit zero weights are removed before matching")
        keep = v != 0
        r, c, v = r[keep], c[keep], v[keep]
    transposed = b.rows > b.cols
    nr, nc = (b.cols, b.rows) if transposed else (b.rows, b.cols)
    if transposed:
        r, c = c, r
    if maximize:
        v = -v
    if v.size:
        v = v - float(v.min())  # reduced costs start >= 0 with zero duals
    # row-major adjacency over the (possibly transposed) edge list
    order = np.argsort(r, kind="stable")
    r, c, v = r[order], c[order], v[order]
    row_off = np.searchsorted(r, np.arange(nr + 1, dtype=np.int64))
    INF = np.inf
    u = np.zeros(nr)
    vd = np.zeros(nc)
    match_row = np.full(nr, -1, dtype=np.int64)
    match_col = np.full(nc, -1, dtype=np.int64)
    for r0 in range(nr):
        dist = np.full(nc, INF)
        pred = np.full(nc, -1, dtype=np.int64)  # predecessor ROW per column
        final = np.zeros(nc, dtype=bool)
        pq = []
        for t in range(int(row_off[r0]), int(row_off[r0 + 1])):
            j = int(c[t])
            nd = float(v[t]) - u[r0] - vd[j]
            if nd < dist[j]:
                dist[j] = nd
                pred[j] = r0
                heapq.heappush(pq, (nd, j))
        jsink = -1
        delta = 0.0
        while pq:
            d, j = heapq.heappop(pq)
            if final[j] or d > dist[j]:
                continue
            if match_col[j] < 0:
                jsink, delta = j, d
                break
            final[j] = True
            i = int(match_col[j])
            for t in range(int(row_off[i]), int(row_off[i + 1])):
                j2 = int(c[t])
                if final[j2]:
                    continue
                nd = d + float(v[t]) - u[i] - vd[j2]
                if nd < dist[j2]:
                    dist[j2] = nd
                    pred[j2] = i
                    heapq.heappush(pq, (nd, j2))
        if jsink < 0:
            raise ValueError("no full matching exists")
        # dual update keeps every reduced cost non-negative (JV)
        fin = np.flatnonzero(final)
        vd[fin] += dist[fin] - delta
        for j in fin:
            u[int(match_col[j])] += delta - dist[j]
        u[r0] += delta
        # augment along the predecessor chain
        j = jsink
        while True:
            i = int(pred[j])
            pj = int(match_row[i])
            match_col[j] = i
            match_row[i] = j
            if i == r0:
                break
            j = pj
    if transposed:
        # pairs are (original_row=match_row-side value, original_col=index);
        # sort by original row, report col side as the int32 axis
        rows = match_row  # original-matrix rows, one per original column
        order = np.argsort(rows, kind="stable")
        return rows[order].astype(np.int32), np.arange(nr, dtype=np.int64)[order]
    return np.arange(nr, dtype=np.int64), match_row.astype(np.int32)


def _maxflow_py(n, eu, ev, cap, source, sink):
    """Edmonds-Karp fallback (BFS augmenting paths)."""
    ne = len(eu)
    adj = [[] for _ in range(n)]
    res = np.empty(2 * ne, dtype=np.int64)
    to = np.empty(2 * ne, dtype=np.int64)
    for k in range(ne):
        to[2 * k], res[2 * k] = ev[k], cap[k]
        to[2 * k + 1], res[2 * k + 1] = eu[k], 0
        adj[int(eu[k])].append(2 * k)
        adj[int(ev[k])].append(2 * k + 1)
    total = 0
    while True:
        pred_edge = np.full(n, -1, dtype=np.int64)
        pred_edge[source] = -2
        queue = [source]
        while queue and pred_edge[sink] == -1:
            v = queue.pop(0)
            for e in adj[v]:
                w = int(to[e])
                if res[e] > 0 and pred_edge[w] == -1:
                    pred_edge[w] = e
                    queue.append(w)
        if pred_edge[sink] == -1:
            break
        aug = None
        v = sink
        while v != source:
            e = int(pred_edge[v])
            aug = res[e] if aug is None else min(aug, res[e])
            v = int(to[e ^ 1])
        v = sink
        while v != source:
            e = int(pred_edge[v])
            res[e] -= aug
            res[e ^ 1] += aug
            v = int(to[e ^ 1])
        total += int(aug)
    flow = cap - res[0 : 2 * ne : 2]
    return total, flow
