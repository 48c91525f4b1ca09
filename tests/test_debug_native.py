"""VERDICT r3 #4: SPMX_DEBUG must instrument the engine that actually runs
in production — the C++ ProbeSet/ProbeMap — not just the Python fallback.
Reference anchor: linprobe/src/map.rs:17-18, spam_csr/src/mul_hash.rs:98-99,
188-189 (probe histograms), :18-25 (per-phase row_nz dumps)."""

import numpy as np
import pytest

from sparse_matrix_tpu.formats.csr import CsrMatrix
from sparse_matrix_tpu.native.loader import load_library, spgemm_hash_native
from sparse_matrix_tpu.utils import debugflags


def _random_csr(rng, rows, cols, per_row):
    r = np.repeat(np.arange(rows, dtype=np.int64), per_row)
    c = rng.integers(0, cols, len(r))
    v = rng.standard_normal(len(r))
    return CsrMatrix.from_coo(rows, cols, r, c, v)


def test_native_probe_histograms_recorded():
    if load_library() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    # wide output column space so the SPA gate stays OFF and the probe
    # tables (the mul_hash-analog path) actually run
    a = _random_csr(rng, 64, 300_000, 8)
    b = _random_csr(rng, 300_000, 300_000, 2)
    debugflags.clear_histograms()
    old = debugflags.debug_enabled()
    debugflags.set_debug(True)
    try:
        c = spgemm_hash_native(a, b, output_sorted=True)
    finally:
        debugflags.set_debug(old)
    h = debugflags.get_histograms()
    assert "native_probe_symbolic" in h and h["native_probe_symbolic"], h.keys()
    assert "native_probe_numeric" in h and h["native_probe_numeric"]
    # every insert was recorded: total probes >= total intermediate products
    products = sum(
        int(b.offsets[k + 1] - b.offsets[k]) for k in a.indices.astype(int)
    )
    assert sum(h["native_probe_numeric"].values()) == products
    assert sum(h["native_probe_symbolic"].values()) == products
    # row_nz dump analog present and consistent with the result
    assert sum(k * v for k, v in h["native_row_nz"].items()) == c.nnz()
    # disarmed: a second multiply must not add counts
    spgemm_hash_native(a, b)
    h2 = debugflags.get_histograms()
    assert h2["native_probe_numeric"] == h["native_probe_numeric"]


def test_native_debug_off_by_default_records_nothing():
    if load_library() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    a = _random_csr(rng, 32, 100_000, 4)
    debugflags.clear_histograms()
    assert not debugflags.debug_enabled()
    spgemm_hash_native(a, a.transpose())
    assert "native_probe_numeric" not in debugflags.get_histograms()
