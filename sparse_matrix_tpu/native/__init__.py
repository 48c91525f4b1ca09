"""C++ native host runtime.

The reference is entirely native (Rust); our host-side performance substrate is
C++ (``src/spmx_native.cpp``): linprobe hash tables, the threaded two-phase
Gustavson hash SpGEMM (the ``mul_hash`` analog with FLOP-balanced row
partitioning), and a fast MatrixMarket scanner. Loaded via ctypes; everything
degrades gracefully to the pure-Python/numpy paths when the shared library has
not been built (build with ``python -m sparse_matrix_tpu.native.build``).
"""

from .loader import (  # noqa: F401
    native_available,
    native_spgemm_available,
    spgemm_hash_native,
    flops_per_row_native,
    parse_entries_native,
    aggregate_pass_native,
    ilu0_native,
    ilut_native,
    trisolve_native,
    amg_strength_native,
    scale_rows_native,
    csr_transpose_native,
    offset_hist_native,
    blockwise_argsort_native,
    jacobi_smoother_native,
    aligned_sort_native,
    aligned_fill_native,
    lanepack_sort_native,
    lanepack_fill_native,
    dia_fill_native,
    colmap_spgemm_native,
    colmap_smoothed_native,
    chol_native,
    ldl_native,
    lu_native,
    colsplit_native,
    connected_components_native,
    dijkstra_native,
    traversal_order_native,
    kruskal_native,
    hopcroft_karp_native,
    maxflow_native,
    load_library,
)
