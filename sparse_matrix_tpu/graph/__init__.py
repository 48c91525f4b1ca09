"""Graph algorithms on sparse adjacency (scipy.sparse.csgraph parity).

Host irregular algorithms (components, SCC, Dijkstra, BFS/DFS, Kruskal)
run in the C++ native runtime; banded graphs get device min-plus
(tropical) Bellman-Ford and dense device Floyd-Warshall — shortest-path
relaxation as semiring SpMV on the static-slice DIA recipe.
"""

from .csgraph import (  # noqa: F401
    NegativeCycleError,
    bellman_ford,
    breadth_first_order,
    breadth_first_tree,
    connected_components,
    construct_dist_matrix,
    csgraph_from_masked,
    csgraph_masked_from_dense,
    csgraph_to_dense,
    csgraph_to_masked,
    depth_first_order,
    depth_first_tree,
    dijkstra,
    floyd_warshall,
    johnson,
    laplacian,
    MaximumFlowResult,
    maximum_bipartite_matching,
    maximum_flow,
    min_weight_full_bipartite_matching,
    minimum_spanning_tree,
    reconstruct_path,
    reverse_cuthill_mckee,
    shortest_path,
    structural_rank,
    yen,
)
from .device import (  # noqa: F401
    BandedGraphPlan,
    banded_graph_plan,
    bellman_ford_device,
    floyd_warshall_device,
)
