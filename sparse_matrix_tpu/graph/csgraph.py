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
    "minimum_spanning_tree",
    "reverse_cuthill_mckee",
    "shortest_path",
    "structural_rank",
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

        if return_predecessors:
            raise NotImplementedError("FW predecessors: use method='D'/'BF'")
        dist = floyd_warshall_device(a if directed else _undirected_min(a))
        if indices is not None:
            src, scalar = _sources(indices, n)
            dist = dist[src]
            return dist[0] if scalar else dist
        return dist
    raise ValueError(f"unknown method {method!r}")


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
