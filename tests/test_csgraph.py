"""Differential tests of sparse_matrix_tpu.graph against scipy.sparse.csgraph.

Same strategy as verify/differential.py (the working analog of the
reference's deleted MKL differential backend): scipy is the oracle, the
library must match on random directed/undirected graphs, banded grid
graphs (the device min-plus path), and crafted edge cases (negative
weights, negative cycles, disconnected components, empty graphs).
"""

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")
cs = pytest.importorskip("scipy.sparse.csgraph")

import sparse_matrix_tpu.graph as g
from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.solvers import poisson_2d_csr


def _random_graph(seed, n=60, density=0.08, low=0.1, high=5.0):
    rng = np.random.default_rng(seed)
    A = scipy_sparse.random(
        n, n, density=density, random_state=rng,
        data_rvs=lambda k: rng.uniform(low, high, k),
    ).tocsr()
    A.sort_indices()
    return CsrMatrix.from_scipy(A), A


def _canon(labels):
    """Label-permutation-invariant canonical form of a partition."""
    seen = {}
    return tuple(seen.setdefault(int(x), len(seen)) for x in labels)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("connection", ["weak", "strong"])
def test_connected_components_matches_scipy(seed, connection):
    M, A = _random_graph(seed, n=80, density=0.03)
    nc, lab = g.connected_components(M, directed=True, connection=connection)
    nc2, lab2 = cs.connected_components(A, directed=True, connection=connection)
    assert nc == nc2
    assert _canon(lab) == _canon(lab2)


def test_connected_components_undirected_and_empty():
    n = 10
    empty = CsrMatrix(n, n, np.zeros(0), np.zeros(0, np.uint32),
                      np.zeros(n + 1, np.int64), is_sorted=True)
    nc, lab = g.connected_components(empty)
    assert nc == n and _canon(lab) == tuple(range(n))
    # one directed edge connects weakly but not strongly
    one = CsrMatrix.from_coo(3, 3, [0], [1], [1.0])
    assert g.connected_components(one, connection="weak", return_labels=False) == 2
    assert g.connected_components(one, connection="strong", return_labels=False) == 3


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("directed", [True, False])
def test_dijkstra_matches_scipy(seed, directed):
    M, A = _random_graph(seed)
    idx = [0, 7, 33]
    d = g.dijkstra(M, directed=directed, indices=idx)
    d2 = cs.dijkstra(A, directed=directed, indices=idx)
    np.testing.assert_allclose(d, d2)


def test_dijkstra_scalar_index_and_predecessor_tree():
    M, A = _random_graph(5)
    d, p = g.dijkstra(M, indices=0, return_predecessors=True)
    d2 = cs.dijkstra(A, indices=0)
    np.testing.assert_allclose(d, d2)
    assert d.ndim == 1
    # every reached non-source node's parent edge is tight
    for j in np.flatnonzero(np.isfinite(d))[1:]:
        i = int(p[j])
        assert i >= 0
        assert np.isclose(d[i] + A[i, j], d[j])


def test_dijkstra_rejects_negative_weights():
    M = CsrMatrix.from_coo(2, 2, [0], [1], [-1.0])
    with pytest.raises(ValueError):
        g.dijkstra(M)


@pytest.mark.parametrize("directed", [True, False])
def test_bellman_ford_matches_scipy(directed):
    M, A = _random_graph(7)
    d = g.bellman_ford(M, directed=directed, indices=[0, 11])
    d2 = cs.bellman_ford(A, directed=directed, indices=[0, 11])
    np.testing.assert_allclose(d, d2)


def test_bellman_ford_negative_weights_and_cycle():
    # negative edge, no cycle: matches scipy
    M = CsrMatrix.from_scipy(scipy_sparse.csr_matrix(
        np.array([[0.0, 2, 0], [0, 0, -1], [0, 0, 0]])
    ))
    np.testing.assert_allclose(
        g.bellman_ford(M, indices=0), cs.bellman_ford(M.to_scipy(), indices=0)
    )
    # negative cycle raises
    C = CsrMatrix.from_scipy(scipy_sparse.csr_matrix(
        np.array([[0.0, 1, 0], [0, 0, 1], [-5, 0, 0]])
    ))
    with pytest.raises(g.NegativeCycleError):
        g.bellman_ford(C, indices=0)
    with pytest.raises(g.NegativeCycleError):
        g.bellman_ford_device(C, [0])


def test_bellman_ford_predecessors_valid():
    M, A = _random_graph(9)
    d, p = g.bellman_ford(M, indices=0, return_predecessors=True)
    for j in np.flatnonzero(np.isfinite(d))[1:]:
        i = int(p[j])
        assert i >= 0
        assert np.isclose(d[i] + A[i, j], d[j])


def test_device_bellman_ford_banded_grid_matches_dijkstra():
    rng = np.random.default_rng(2)
    P = poisson_2d_csr(20)
    W = CsrMatrix(P.rows, P.cols, rng.uniform(0.5, 3.0, P.nnz()),
                  P.indices, P.offsets, is_sorted=True)
    plan = g.banded_graph_plan(W)
    assert plan is not None and len(plan.offsets) == 5
    src = np.array([0, 57, 399])
    d = g.bellman_ford_device(plan, src)
    d2 = cs.dijkstra(W.to_scipy(), indices=src)
    np.testing.assert_allclose(d, d2, rtol=1e-5)


def test_shortest_path_auto_dispatches_device_for_banded():
    rng = np.random.default_rng(3)
    P = poisson_2d_csr(12)
    W = CsrMatrix(P.rows, P.cols, rng.uniform(0.5, 3.0, P.nnz()),
                  P.indices, P.offsets, is_sorted=True)
    d = g.shortest_path(W, indices=[0, 100])
    d2 = cs.dijkstra(W.to_scipy(), indices=[0, 100])
    np.testing.assert_allclose(d, d2, rtol=1e-5)


def test_shortest_path_methods_agree():
    M, A = _random_graph(11, n=40)
    idx = [0, 5]
    d_auto = g.shortest_path(M, indices=idx)
    d_d = g.shortest_path(M, method="D", indices=idx)
    d_bf = g.shortest_path(M, method="BF", indices=idx)
    d_fw = g.shortest_path(M, method="FW", indices=idx)
    np.testing.assert_allclose(d_auto, d_d)
    np.testing.assert_allclose(d_d, d_bf)
    np.testing.assert_allclose(d_d, d_fw, rtol=1e-5)


def test_floyd_warshall_device_matches_scipy():
    M, A = _random_graph(13, n=50)
    np.testing.assert_allclose(
        g.floyd_warshall_device(M), cs.floyd_warshall(A), rtol=1e-5
    )


def test_shortest_path_unweighted():
    M, A = _random_graph(15)
    d = g.shortest_path(M, method="D", indices=0, unweighted=True)
    d2 = cs.shortest_path(A, method="D", indices=0, unweighted=True)
    np.testing.assert_allclose(d, d2)


def test_bfs_dfs_orders_and_trees_match_scipy_directed():
    M, A = _random_graph(17, n=50, density=0.06)
    o, p = g.breadth_first_order(M, 0)
    o2, p2 = cs.breadth_first_order(A, 0)
    assert set(o.tolist()) == set(o2.tolist())
    np.testing.assert_allclose(
        g.breadth_first_tree(M, 0).to_scipy().toarray(),
        cs.breadth_first_tree(A, 0, directed=True).toarray(),
    )
    od, pd = g.depth_first_order(M, 0)
    od2, pd2 = cs.depth_first_order(A, 0)
    assert set(od.tolist()) == set(od2.tolist())
    np.testing.assert_allclose(
        g.depth_first_tree(M, 0).to_scipy().toarray(),
        cs.depth_first_tree(A, 0, directed=True).toarray(),
    )


def test_bfs_dfs_undirected_structurally_valid():
    """Undirected traversals: scipy iterates row- then column-neighbors
    (unsorted) while we sort the symmetrized pattern, so parent CHOICES
    differ legitimately. Invariants that must hold: same visited set, BFS
    levels equal to unweighted hop distances, every tree edge present in
    the symmetrized graph."""
    M, A = _random_graph(17, n=50, density=0.06)
    o, p = g.breadth_first_order(M, 0, directed=False)
    o2, _p2 = cs.breadth_first_order(A, 0, directed=False)
    assert set(o.tolist()) == set(o2.tolist())
    hops = cs.shortest_path(A, directed=False, unweighted=True, indices=0)
    level = {0: 0}
    for j in o[1:]:
        level[int(j)] = level[int(p[j])] + 1
        assert level[int(j)] == hops[int(j)]
    sym = (A.maximum(A.T)).tocsr()
    t = g.breadth_first_tree(M, 0, directed=False)
    assert t.nnz() == len(o) - 1
    td = g.depth_first_tree(M, 0, directed=False)
    assert td.nnz() == len(o) - 1
    for tree in (t, td):
        r = np.repeat(np.arange(tree.rows), np.diff(tree.offsets))
        for i, j, w in zip(r, tree.indices, tree.vals):
            assert sym[int(i), int(j)] != 0 or sym[int(j), int(i)] != 0


def test_minimum_spanning_tree_matches_scipy():
    # unique random weights -> the MST edge SET is unique; scipy keeps
    # each kept edge at its stored input orientation while we canonicalize
    # to (min, max), so compare the symmetrized forms
    for seed in (0, 4):
        M, A = _random_graph(seed, n=70, density=0.1)
        t = g.minimum_spanning_tree(M).to_scipy()
        t2 = cs.minimum_spanning_tree(A)
        np.testing.assert_allclose(
            (t + t.T).toarray(), (t2 + t2.T).toarray()
        )


@pytest.mark.parametrize("normed", [False, True])
def test_laplacian_matches_scipy(normed):
    M, A = _random_graph(19)
    np.testing.assert_allclose(
        g.laplacian(M, normed=normed).to_scipy().toarray(),
        cs.laplacian(A, normed=normed).toarray(),
        atol=1e-12,
    )
    # symmetric case too (the spectral-clustering shape)
    S = A + A.T
    MS = CsrMatrix.from_scipy(S.tocsr())
    np.testing.assert_allclose(
        g.laplacian(MS, normed=normed).to_scipy().toarray(),
        cs.laplacian(S.tocsr(), normed=normed).toarray(),
        atol=1e-12,
    )


def test_laplacian_return_diag_and_out_degree():
    M, A = _random_graph(21)
    lap, d = g.laplacian(M, return_diag=True)
    lap2, d2 = cs.laplacian(A, return_diag=True)
    np.testing.assert_allclose(d, d2)
    lap_o = g.laplacian(M, use_out_degree=True).to_scipy().toarray()
    lap_o2 = cs.laplacian(A, use_out_degree=True).toarray()
    np.testing.assert_allclose(lap_o, lap_o2)


def test_python_fallbacks_match_native(monkeypatch):
    """The pure-Python paths (library unavailable) agree with native."""
    import sparse_matrix_tpu.graph.csgraph as mod

    M, A = _random_graph(23, n=40)
    native = (
        g.connected_components(M, connection="strong"),
        g.dijkstra(M, indices=2),
        g.breadth_first_order(M, 0),
        g.minimum_spanning_tree(M).to_scipy().toarray(),
    )
    monkeypatch.setattr(mod, "connected_components_native", lambda *a, **k: None)
    monkeypatch.setattr(mod, "dijkstra_native", lambda *a, **k: None)
    monkeypatch.setattr(mod, "traversal_order_native", lambda *a, **k: None)
    monkeypatch.setattr(mod, "kruskal_native", lambda *a, **k: None)
    nc, lab = g.connected_components(M, connection="strong")
    assert nc == native[0][0] and _canon(lab) == _canon(native[0][1])
    np.testing.assert_allclose(g.dijkstra(M, indices=2), native[1])
    o, p = g.breadth_first_order(M, 0)
    np.testing.assert_array_equal(o, native[2][0])
    np.testing.assert_array_equal(p, native[2][1])
    np.testing.assert_allclose(
        g.minimum_spanning_tree(M).to_scipy().toarray(), native[3]
    )


def test_non_square_raises():
    M = CsrMatrix.from_coo(2, 3, [0], [1], [1.0])
    with pytest.raises(ValueError):
        g.connected_components(M)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_structural_rank_and_matching_match_scipy(seed):
    rng = np.random.default_rng(seed)
    r, c = int(rng.integers(5, 40)), int(rng.integers(5, 40))
    A = scipy_sparse.random(r, c, density=0.15, random_state=rng).tocsr()
    A.sort_indices()
    M = CsrMatrix.from_scipy(A)
    assert g.structural_rank(M) == cs.structural_rank(A)
    # matchings need not be identical; validate ours is a matching of the
    # same (maximum) size over actual pattern entries
    mr = g.maximum_bipartite_matching(M, perm_type="column")  # per-row col
    matched = mr >= 0
    assert matched.sum() == cs.structural_rank(A)
    assert len(set(mr[matched].tolist())) == int(matched.sum())
    for i in np.flatnonzero(matched):
        assert A[i, mr[i]] != 0 or mr[i] in A.indices[A.indptr[i]:A.indptr[i + 1]]
    mc = g.maximum_bipartite_matching(M, perm_type="row")  # per-col row
    assert (mc >= 0).sum() == int(matched.sum())


def test_matching_python_fallback(monkeypatch):
    import sparse_matrix_tpu.graph.csgraph as mod

    rng = np.random.default_rng(7)
    A = scipy_sparse.random(25, 30, density=0.12, random_state=rng).tocsr()
    A.sort_indices()
    M = CsrMatrix.from_scipy(A)
    want = g.structural_rank(M)
    monkeypatch.setattr(mod, "hopcroft_karp_native", lambda *a, **k: None)
    assert g.structural_rank(M) == want


def test_reverse_cuthill_mckee_is_valid_permutation():
    P = poisson_2d_csr(12)
    perm = g.reverse_cuthill_mckee(P)
    assert sorted(perm.tolist()) == list(range(P.rows))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_johnson_matches_scipy_negative_weights(seed):
    rng = np.random.default_rng(seed)
    n = 35
    U = scipy_sparse.random(
        n, n, density=0.15, random_state=rng,
        data_rvs=lambda k: rng.uniform(-2, 5, k),
    )
    U = scipy_sparse.triu(U, k=1).tocsr()  # DAG: negative edges, no cycle
    U.sort_indices()
    M = CsrMatrix.from_scipy(U)
    np.testing.assert_allclose(
        g.johnson(M, indices=[0, 3, 7]), cs.johnson(U, indices=[0, 3, 7])
    )
    np.testing.assert_allclose(g.johnson(M), cs.johnson(U))
    np.testing.assert_allclose(
        g.shortest_path(M, method="J", indices=0), cs.johnson(U, indices=0)
    )


def test_johnson_negative_cycle_raises():
    C = CsrMatrix.from_scipy(scipy_sparse.csr_matrix(
        np.array([[0.0, 1, 0], [0, 0, 1], [-5, 0, 0]])
    ))
    with pytest.raises(g.NegativeCycleError):
        g.johnson(C)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_maximum_flow_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 30))
    mask = rng.random((n, n)) < 0.25
    np.fill_diagonal(mask, False)
    capm = np.where(mask, rng.integers(1, 20, (n, n)), 0)
    A = scipy_sparse.csr_matrix(capm)
    M = CsrMatrix.from_scipy(A.astype(np.float64))
    res = g.maximum_flow(M, 0, n - 1)
    ref = cs.maximum_flow(A.astype(np.int32), 0, n - 1)
    assert res.flow_value == ref.flow_value
    # validity: capacity bounds + conservation + antisymmetry
    F = res.flow.to_scipy().toarray()
    np.testing.assert_allclose(F, -F.T)
    assert (F <= capm + 1e-9).all()
    net = F.sum(axis=0)
    inner = np.ones(n, bool)
    inner[[0, n - 1]] = False
    if inner.any():
        assert np.abs(net[inner]).max() == 0
    assert net[n - 1] == res.flow_value


def test_maximum_flow_python_fallback(monkeypatch):
    import sparse_matrix_tpu.graph.csgraph as mod

    rng = np.random.default_rng(5)
    n = 15
    mask = rng.random((n, n)) < 0.3
    np.fill_diagonal(mask, False)
    capm = np.where(mask, rng.integers(1, 9, (n, n)), 0)
    M = CsrMatrix.from_scipy(scipy_sparse.csr_matrix(capm.astype(np.float64)))
    want = g.maximum_flow(M, 0, n - 1).flow_value
    monkeypatch.setattr(mod, "maxflow_native", lambda *a, **k: None)
    assert g.maximum_flow(M, 0, n - 1).flow_value == want


def test_maximum_flow_rejects_bad_input():
    M = CsrMatrix.from_coo(3, 3, [0, 1], [1, 2], [1.5, 2.0])
    with pytest.raises(ValueError, match="integer"):
        g.maximum_flow(M, 0, 2)
    Mi = CsrMatrix.from_coo(3, 3, [0, 1], [1, 2], [1.0, 2.0])
    with pytest.raises(ValueError, match="differ"):
        g.maximum_flow(Mi, 1, 1)


# ---------------------------------------------------------------------------
# yen K-shortest paths
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("directed", [True, False])
def test_yen_matches_scipy(seed, directed):
    M, A = _random_graph(seed, n=30, density=0.12)
    rng = np.random.default_rng(seed + 77)
    s, t = rng.choice(30, size=2, replace=False)
    for K in (1, 3, 6):
        want = cs.yen(A, int(s), int(t), K, directed=directed)
        got = g.yen(M, int(s), int(t), K, directed=directed)
        np.testing.assert_allclose(np.sort(got), np.sort(want), atol=1e-10)


def test_yen_predecessors_reconstruct_valid_paths():
    M, A = _random_graph(9, n=25, density=0.15)
    dist, pred = g.yen(M, 0, 24, 4, return_predecessors=True)
    want = cs.yen(A, 0, 24, 4)
    np.testing.assert_allclose(np.sort(dist), np.sort(want), atol=1e-10)
    Ad = A.toarray()
    Ad[Ad == 0] = np.inf
    for k in range(len(dist)):
        # walk the chain back from the sink; it must be a simple path
        # from 0 whose edge costs sum to dist[k]
        path = [24]
        while path[-1] != 0:
            p = int(pred[k, path[-1]])
            assert p != -9999
            path.append(p)
        assert len(set(path)) == len(path)
        cost = sum(Ad[path[i + 1], path[i]] for i in range(len(path) - 1))
        assert abs(cost - dist[k]) < 1e-10


def test_yen_edge_cases_match_scipy():
    # unreachable sink -> empty; source == sink -> [0.]; unweighted hops
    M, A = _random_graph(4, n=20, density=0.08)
    assert g.yen(M, 0, 0, 3).tolist() == cs.yen(A, 0, 0, 3).tolist() == [0.0]
    iso = CsrMatrix.from_coo(5, 5, [0, 1], [1, 0], [1.0, 1.0])
    assert g.yen(iso, 0, 4, 2).size == 0
    got = g.yen(M, 0, 19, 4, unweighted=True)
    want = cs.yen(A, 0, 19, 4, unweighted=True)
    np.testing.assert_allclose(np.sort(got), np.sort(want))


def test_yen_negative_weights_and_cycle():
    dense = np.array(
        [[0, -1.0, 2, 0], [0, 0, 1, 4], [0, 0, 0, 1], [0, 0, 0, 0]]
    )
    A = scipy_sparse.csr_matrix(dense)
    M = CsrMatrix.from_scipy(A)
    for K in (1, 3):
        np.testing.assert_allclose(
            np.sort(g.yen(M, 0, 3, K)), np.sort(cs.yen(A, 0, 3, K))
        )
    cyc = CsrMatrix.from_coo(3, 3, [0, 1, 1], [1, 0, 2], [-2.0, 1.0, 1.0])
    with pytest.raises(g.NegativeCycleError):
        g.yen(cyc, 0, 2, 2)


# ---------------------------------------------------------------------------
# min-weight full bipartite matching
# ---------------------------------------------------------------------------


def _random_bipartite(seed, nr, nc, density=0.4, allow_negative=False):
    rng = np.random.default_rng(seed)
    lo = -3.0 if allow_negative else 0.1
    A = scipy_sparse.random(
        nr, nc, density=density, random_state=rng,
        data_rvs=lambda k: rng.uniform(lo, 5.0, k),
    ).tocsr()
    A.sort_indices()
    A.data[A.data == 0] = 0.25
    return CsrMatrix.from_scipy(A), A


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("shape", [(12, 12), (8, 14), (14, 8)])
@pytest.mark.parametrize("maximize", [False, True])
def test_mwfbm_matches_scipy(seed, shape, maximize):
    M, A = _random_bipartite(seed, *shape, density=0.5)
    try:
        wr, wc = cs.min_weight_full_bipartite_matching(A, maximize=maximize)
        feasible = True
    except ValueError:
        feasible = False
    if not feasible:
        with pytest.raises(ValueError, match="no full matching"):
            g.min_weight_full_bipartite_matching(M, maximize=maximize)
        return
    gr, gc = g.min_weight_full_bipartite_matching(M, maximize=maximize)
    # optimal matchings may differ; the optimal WEIGHT may not
    Ad = A.toarray()
    assert len(gr) == len(wr) == min(shape)
    assert sorted(gr.tolist()) == sorted(wr.tolist())
    assert sorted(gc.tolist()) == sorted(wc.tolist())
    for i, j in zip(gr, gc):  # every reported pair must be a real edge
        assert Ad[i, j] != 0
    np.testing.assert_allclose(
        Ad[gr, gc].sum(), Ad[wr, wc].sum(), atol=1e-9
    )


def test_mwfbm_negative_weights_and_zero_removal():
    M, A = _random_bipartite(3, 10, 10, density=0.6, allow_negative=True)
    wr, wc = cs.min_weight_full_bipartite_matching(A)
    gr, gc = g.min_weight_full_bipartite_matching(M)
    np.testing.assert_allclose(
        A.toarray()[gr, gc].sum(), A.toarray()[wr, wc].sum(), atol=1e-9
    )
    # explicit zeros are dropped (with the scipy warning): the only full
    # matching through a zero edge must become infeasible
    Z = CsrMatrix.from_coo(2, 2, [0, 1], [0, 0], [0.0, 2.0])
    with pytest.warns(UserWarning, match="explicit zero"):
        with pytest.raises(ValueError, match="no full matching"):
            g.min_weight_full_bipartite_matching(Z)


def test_mwfbm_ordering():
    # tall matrix: pairs come back sorted by original row index
    M, A = _random_bipartite(11, 15, 6, density=0.7)
    gr, gc = g.min_weight_full_bipartite_matching(M)
    assert list(gr) == sorted(gr.tolist())


def test_floyd_warshall_name_matches_scipy():
    M, A = _random_graph(31, n=40, density=0.12)
    ours = g.floyd_warshall(M, directed=True)
    theirs = cs.floyd_warshall(A, directed=True)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
    und = g.floyd_warshall(M, directed=False)
    und_sp = cs.floyd_warshall(A, directed=False)
    np.testing.assert_allclose(und, und_sp, rtol=1e-6)


def _walk_cost(pred, dense, i, j):
    """Path weight recovered by walking pred back from j to i."""
    cost, cur, hops = 0.0, j, 0
    while cur != i:
        p = int(pred[cur])
        if p < 0 or hops > pred.shape[0]:
            return np.inf
        cost += dense[p, cur]
        cur, hops = p, hops + 1
    return cost


@pytest.mark.parametrize("directed", [True, False])
def test_floyd_warshall_predecessors(directed):
    # integer weights: shortest-path VALUES are exact in f32, and the
    # recovered pred walk must reproduce the scipy distance exactly
    rng = np.random.default_rng(33)
    n = 30
    A = scipy_sparse.random(
        n, n, density=0.15, random_state=rng,
        data_rvs=lambda k: rng.integers(1, 8, k).astype(np.float64),
    ).tocsr()
    A.sort_indices()
    M = CsrMatrix.from_scipy(A)
    dist, pred = g.floyd_warshall(M, directed=directed,
                                  return_predecessors=True)
    d_sp, p_sp = cs.floyd_warshall(A, directed=directed,
                                   return_predecessors=True)
    np.testing.assert_allclose(dist, d_sp, rtol=1e-6)
    assert pred.dtype == np.int32 and pred.shape == (n, n)
    # unreachable/diagonal sentinel matches scipy
    np.testing.assert_array_equal(pred < 0, p_sp < 0)
    dense = g.csgraph_to_dense(M, null_value=np.inf)
    if not directed:
        dense = np.minimum(dense, dense.T)
    for i in range(0, n, 7):
        for j in range(n):
            if i == j or not np.isfinite(dist[i, j]):
                continue
            assert _walk_cost(pred[i], dense, i, j) == pytest.approx(
                d_sp[i, j], rel=1e-6
            )


def test_shortest_path_fw_with_indices_and_pred():
    M, A = _random_graph(34, n=25, density=0.2)
    dist, pred = g.shortest_path(M, method="FW", indices=[3, 7],
                                 return_predecessors=True)
    # scipy's FW rejects indices=; slice its full all-pairs result
    d_sp = cs.shortest_path(A, method="FW", return_predecessors=True)[0]
    np.testing.assert_allclose(dist, d_sp[[3, 7]], rtol=1e-5)
    assert pred.shape == (2, 25)


def test_csgraph_dense_roundtrip():
    M, A = _random_graph(32, n=25, density=0.2)
    dense = g.csgraph_to_dense(M, null_value=0.0)
    np.testing.assert_allclose(dense, A.toarray())
    from sparse_matrix_tpu.sparse.csgraph import csgraph_from_dense

    back = csgraph_from_dense(dense)
    np.testing.assert_allclose(back.toarray(), A.toarray())


def test_masked_conversions_match_scipy():
    M, A = _random_graph(33, n=30, density=0.15)
    ours = g.csgraph_to_masked(M)
    theirs = cs.csgraph_to_masked(A)
    np.testing.assert_array_equal(np.ma.getmaskarray(ours),
                                  np.ma.getmaskarray(theirs))
    np.testing.assert_allclose(ours.filled(0.0), theirs.filled(0.0))
    back = g.csgraph_from_masked(ours)
    np.testing.assert_allclose(back.toarray(), A.toarray())


def test_masked_from_dense_matches_scipy():
    rng = np.random.default_rng(34)
    arr = rng.uniform(0, 3, (12, 12))
    arr[arr < 1.0] = 0.0
    arr[0, 1] = np.nan
    arr[2, 3] = np.inf
    ours = g.csgraph_masked_from_dense(arr)
    theirs = cs.csgraph_masked_from_dense(arr)
    np.testing.assert_array_equal(np.ma.getmaskarray(ours),
                                  np.ma.getmaskarray(theirs))


@pytest.mark.parametrize("directed", [True, False])
def test_reconstruct_path_matches_scipy(directed):
    M, A = _random_graph(35, n=40, density=0.1)
    _, pred = cs.dijkstra(A, directed=directed, indices=0,
                          return_predecessors=True)
    ours = g.reconstruct_path(M, pred, directed=directed)
    theirs = cs.reconstruct_path(A, pred, directed=directed)
    np.testing.assert_allclose(ours.toarray(), theirs.toarray(), rtol=1e-12)


@pytest.mark.parametrize("directed", [True, False])
def test_construct_dist_matrix_matches_scipy(directed):
    M, A = _random_graph(36, n=35, density=0.08)
    dist, pred = cs.dijkstra(A, directed=directed, return_predecessors=True)
    ours = g.construct_dist_matrix(M, pred, directed=directed)
    theirs = cs.construct_dist_matrix(A, pred, directed=directed)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)
    # also agrees with the dijkstra distances themselves
    np.testing.assert_allclose(ours, dist, rtol=1e-10)


def test_construct_dist_matrix_rejects_nonsquare_pred():
    M, _ = _random_graph(37, n=10, density=0.2)
    with pytest.raises(ValueError):
        g.construct_dist_matrix(M, np.full(10, -9999))
