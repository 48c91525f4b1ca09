"""``sparse_matrix_tpu.sparse.csgraph`` — scipy.sparse.csgraph-shaped facade.

Same function names and signatures as :mod:`sparse_matrix_tpu.graph`
(already written to scipy parity), with one addition: the graph argument may
also be a scipy.sparse matrix or a dense 2-D ndarray (converted once to host
CSR). Dense zeros are treated as absent edges, matching scipy's
csgraph_from_dense default.
"""

from __future__ import annotations

import functools

import numpy as np

from ..formats.csr import CsrMatrix
from ..graph import (
    MaximumFlowResult,  # noqa: F401
    NegativeCycleError,  # noqa: F401
)
from .. import graph as _graph

__all__ = [
    "NegativeCycleError", "MaximumFlowResult",
    "bellman_ford", "breadth_first_order", "breadth_first_tree",
    "connected_components", "depth_first_order", "depth_first_tree",
    "dijkstra", "floyd_warshall", "johnson", "laplacian",
    "maximum_bipartite_matching",
    "maximum_flow", "min_weight_full_bipartite_matching",
    "minimum_spanning_tree", "reverse_cuthill_mckee", "shortest_path",
    "structural_rank", "yen", "csgraph_from_dense", "csgraph_to_dense",
    "csgraph_to_masked", "csgraph_from_masked", "csgraph_masked_from_dense",
    "reconstruct_path", "construct_dist_matrix",
]


def csgraph_from_dense(arr, null_value=0.0) -> CsrMatrix:
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("csgraph_from_dense expects a 2-D array")
    mask = arr != null_value
    r, c = np.nonzero(mask)
    return CsrMatrix.from_coo(arr.shape[0], arr.shape[1], r, c, arr[r, c])


def _asgraph(a) -> CsrMatrix:
    if isinstance(a, CsrMatrix):
        return a
    if hasattr(a, "tocsr") and hasattr(a, "tocoo"):  # scipy.sparse
        return CsrMatrix.from_scipy(a)
    return csgraph_from_dense(a)


def _wrap(fn):
    @functools.wraps(fn)
    def wrapper(a, *args, **kwargs):
        return fn(_asgraph(a), *args, **kwargs)

    return wrapper


bellman_ford = _wrap(_graph.bellman_ford)
breadth_first_order = _wrap(_graph.breadth_first_order)
breadth_first_tree = _wrap(_graph.breadth_first_tree)
connected_components = _wrap(_graph.connected_components)
depth_first_order = _wrap(_graph.depth_first_order)
depth_first_tree = _wrap(_graph.depth_first_tree)
dijkstra = _wrap(_graph.dijkstra)
floyd_warshall = _wrap(_graph.floyd_warshall)
csgraph_to_dense = _wrap(_graph.csgraph_to_dense)
johnson = _wrap(_graph.johnson)
laplacian = _wrap(_graph.laplacian)
maximum_bipartite_matching = _wrap(_graph.maximum_bipartite_matching)
maximum_flow = _wrap(_graph.maximum_flow)
min_weight_full_bipartite_matching = _wrap(
    _graph.min_weight_full_bipartite_matching)
minimum_spanning_tree = _wrap(_graph.minimum_spanning_tree)
reverse_cuthill_mckee = _wrap(_graph.reverse_cuthill_mckee)
shortest_path = _wrap(_graph.shortest_path)
structural_rank = _wrap(_graph.structural_rank)
yen = _wrap(_graph.yen)
csgraph_to_masked = _wrap(_graph.csgraph_to_masked)
csgraph_from_masked = _graph.csgraph_from_masked
csgraph_masked_from_dense = _graph.csgraph_masked_from_dense
reconstruct_path = _wrap(_graph.reconstruct_path)
construct_dist_matrix = _wrap(_graph.construct_dist_matrix)
