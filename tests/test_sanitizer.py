"""UBSan build of the native runtime — the miri analog: run the SpGEMM fuzz
workload against a -fsanitize=undefined build (UB aborts the process)."""

import ctypes
import subprocess
import sys

import numpy as np
import pytest


def test_native_ubsan_clean():
    code = """
import ctypes
import numpy as np
from sparse_matrix_tpu.native import build as bmod
from sparse_matrix_tpu.native import loader
lib = ctypes.CDLL(bmod.build(sanitize=True))
loader._declare(lib)
loader._LIB = lib
loader._TRIED = True
from sparse_matrix_tpu.verify.fuzz import fuzz_spgemm
fuzz_spgemm(60, seed=11, max_dim=16, non_finite=True)
print("UBSAN CLEAN")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": ".", "HOME": "/root",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert "UBSAN CLEAN" in out.stdout, (out.stdout[-1000:], out.stderr[-3000:])


def test_native_ubsan_round3_kernels():
    """The round-3 native kernels (aggregation, ILU0/ILUT, trisolve) under
    the UBSan build."""
    code = """
import ctypes
import numpy as np
from sparse_matrix_tpu.native import build as bmod
from sparse_matrix_tpu.native import loader
lib = ctypes.CDLL(bmod.build(sanitize=True))
loader._declare(lib)
loader._LIB = lib
loader._TRIED = True

from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.solvers.amg import (
    aggregate_strong, strength_graph, tentative_prolongator,
)
from sparse_matrix_tpu.solvers.ilu import ilu0, ilut, trisolve_host
from sparse_matrix_tpu.solvers import poisson_2d_csr

rng = np.random.default_rng(0)
for trial in range(25):
    n = int(rng.integers(2, 40))
    d = (rng.random((n, n)) < 0.3) * rng.standard_normal((n, n))
    d = (d + d.T) / 2
    np.fill_diagonal(d, np.abs(d).sum(axis=1) + 1.0)
    a = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    so, si = strength_graph(a)
    agg, na = aggregate_strong(a.rows, so, si)
    assert (agg >= 0).all() and na >= 1
    t = tentative_prolongator(agg, na, dtype=a.vals.dtype)
    ps = loader.colmap_smoothed_native(a, rng.random(n), t)
    assert ps is not None and ps.cols == na
    lp, li, lx = loader.chol_native(a.rows, a.offsets, a.indices,
                                    a.vals.astype(np.float64))
    assert lp[-1] >= a.rows and np.isfinite(lx).all()
    lp2, li2, lx2, dd = loader.ldl_native(a.rows, a.offsets, a.indices,
                                          a.vals.astype(np.float64))
    assert np.isfinite(lx2).all() and (dd > 0).all()
    from sparse_matrix_tpu.solvers.cholesky import _csc_of_columns
    bp, bi, bx = _csc_of_columns(a, None)
    lu_out = loader.lu_native(a.rows, bp, bi, bx.astype(np.float64))
    assert lu_out is not None and np.isfinite(lu_out[2]).all()
    f = ilu0(a)
    ft = ilut(a, tau=float(rng.random() * 0.1), p=int(rng.integers(1, 12)))
    b = rng.standard_normal(n)
    y = trisolve_host(f.l, b, lower=True, unit=True)
    x = trisolve_host(f.u, y, lower=False)
    assert np.isfinite(x).all()
print("UBSAN R3 CLEAN")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": ".", "HOME": "/root",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert "UBSAN R3 CLEAN" in out.stdout, (out.stdout[-1000:], out.stderr[-3000:])


def _threaded_code(sanitize_arg):
    return f"""
import ctypes
import numpy as np
from sparse_matrix_tpu.native import build as bmod
from sparse_matrix_tpu.native import loader
lib = ctypes.CDLL(bmod.build(sanitize={sanitize_arg}))
loader._declare(lib)
loader._LIB = lib
loader._TRIED = True
from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix
rng = np.random.default_rng(3)
for rows, density in ((300, 0.08), (64, 0.4), (512, 0.01)):
    d = ((rng.random((rows, rows)) < density) * rng.standard_normal((rows, rows))).astype(np.float64)
    A = CsrMatrix.from_dok(DokMatrix.from_dense(d))
    C = loader.spgemm_hash_native(A, A, num_threads=4, output_sorted=True)
    assert np.allclose(C.to_dense(), d @ d, atol=1e-9)
print("THREADED SAN CLEAN")
"""


def test_native_threaded_chunks_ubsan():
    """The cross-thread disjoint-slice writes in run_chunked, actually
    exercised with 4 workers (threads interleave even on 1 core) under the
    UBSan build — the miri analog for the unsafe-equivalent parallel writes
    (reference rust-toolchain.toml:3, mul_hash.rs:38-64)."""
    out = subprocess.run(
        [sys.executable, "-c", _threaded_code("True")],
        capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": ".", "HOME": "/root",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert "THREADED SAN CLEAN" in out.stdout, (out.stdout[-1000:], out.stderr[-3000:])


def test_native_threaded_chunks_tsan():
    """Same workload under ThreadSanitizer: data races on the shared output
    buffers or the atomic chunk counter abort the subprocess. TSan's runtime
    must be preloaded because the instrumented code lives in a dlopen()ed
    library under an uninstrumented Python."""
    libtsan = subprocess.run(
        ["g++", "-print-file-name=libtsan.so"], capture_output=True, text=True
    ).stdout.strip()
    if not libtsan or "/" not in libtsan:
        pytest.skip("libtsan not available")
    out = subprocess.run(
        [sys.executable, "-c", _threaded_code("'thread'")],
        capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": ".", "HOME": "/root", "LD_PRELOAD": libtsan,
             "PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu",
             "TSAN_OPTIONS": "halt_on_error=1 exitcode=66"},
    )
    assert out.returncode == 0 and "THREADED SAN CLEAN" in out.stdout, (
        out.stdout[-1000:], out.stderr[-3000:],
    )


def test_native_ubsan_graph_kernels():
    """The graph-native routines (union-find components, Tarjan SCC, heap
    Dijkstra, BFS/DFS orders, Kruskal, Hopcroft-Karp) under the UBSan
    build, cross-checked against the pure-Python fallbacks."""
    code = """
import ctypes
import numpy as np
from sparse_matrix_tpu.native import build as bmod
from sparse_matrix_tpu.native import loader
lib = ctypes.CDLL(bmod.build(sanitize=True))
loader._declare(lib)
loader._LIB = lib
loader._TRIED = True

from sparse_matrix_tpu.formats.csr import CsrMatrix
import sparse_matrix_tpu.graph.csgraph as cg

rng = np.random.default_rng(3)
for trial in range(40):
    n = int(rng.integers(1, 40))
    dens = float(rng.uniform(0.0, 0.3))
    mask = rng.random((n, n)) < dens
    w = np.where(mask, rng.uniform(0.1, 5.0, (n, n)), 0.0)
    r, c = np.nonzero(mask)
    M = CsrMatrix.from_coo(n, n, r, c, w[r, c])
    nc_w = cg.connected_components(M, return_labels=False)
    nc_s = cg.connected_components(M, connection="strong", return_labels=False)
    assert nc_s >= nc_w
    src = int(rng.integers(0, n))
    d, p = cg.dijkstra(M, indices=src, return_predecessors=True)
    d_py, _ = cg._dijkstra_py(
        n, M.offsets, M.indices, np.asarray(M.vals, np.float64), src)
    np.testing.assert_allclose(d, d_py)
    o, pb = cg.breadth_first_order(M, src)
    od, pd = cg.depth_first_order(M, src)
    assert set(o.tolist()) == set(od.tolist())
    t = cg.minimum_spanning_tree(M)
    assert t.nnz() == n - cg.connected_components(
        M, directed=False, return_labels=False)
    sr = cg.structural_rank(M)
    loader._LIB = None  # swap to python fallback and compare
    try:
        assert cg.structural_rank(M) == sr
    finally:
        loader._LIB = lib
print("UBSAN GRAPH CLEAN")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": ".", "HOME": "/root",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert "UBSAN GRAPH CLEAN" in out.stdout, (out.stdout[-1000:], out.stderr[-3000:])
