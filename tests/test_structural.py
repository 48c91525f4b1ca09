"""Structural generator tests (reference ``spam_csr/src/tests.rs:25-91,163-177,
408-425``) and the corpus integration test (tests.rs:373-405)."""

import numpy as np
import pytest
from hypothesis import given, settings

from sparse_matrix_tpu.bench.corpus import generate_corpus, iter_corpus
from sparse_matrix_tpu.formats import CsrMatrix
from sparse_matrix_tpu.verify.structural import csr_structural


@given(csr_structural(sorted_rows=True))
def test_sorted_generator_satisfies_invariants(m):
    # the `arb` self-test (tests.rs:163-177)
    assert m.is_sorted
    assert m.invariants()


@given(csr_structural(sorted_rows=False))
def test_unsorted_generator_satisfies_invariants(m):
    assert not m.is_sorted
    assert m.invariants()


@given(csr_structural(sorted_rows=False))
def test_iter_consistency(m):
    # iter == entry arrays, row recovery via offsets (tests.rs:408-425)
    entries = list(m.iter_entries())
    assert len(entries) == m.nnz()
    k = 0
    for r in range(m.rows):
        for _ in range(int(m.offsets[r + 1] - m.offsets[r])):
            (ri, ci), v = entries[k]
            assert ri == r
            assert ci == int(m.indices[k])
            assert v == m.vals[k]
            k += 1


@given(csr_structural(sorted_rows=True))
def test_invariant6_detects_violation(m):
    # corrupting a sorted matrix's order must trip invariant 6
    if m.nnz() >= 2:
        lo, hi = None, None
        for r in range(m.rows):
            if m.offsets[r + 1] - m.offsets[r] >= 2:
                lo, hi = int(m.offsets[r]), int(m.offsets[r + 1])
                break
        if lo is not None:
            bad = CsrMatrix(
                m.rows, m.cols, m.vals,
                np.concatenate([m.indices[:lo], m.indices[lo:hi][::-1], m.indices[hi:]]),
                m.offsets, is_sorted=True,
            )
            assert not bad.invariant6()


@pytest.mark.slow
def test_corpus_invariants(tmp_path):
    # parse every corpus file, check invariants through both conversion
    # paths (reference tests.rs:373-405, ignored-by-default "expensive")
    paths = generate_corpus(str(tmp_path), include_large=False)
    assert paths
    rng = np.random.default_rng(0)
    count = 0
    for name, csr in iter_corpus(str(tmp_path)):
        assert csr.invariants(), name
        dok = csr.to_dok()
        assert CsrMatrix.from_dok(dok).invariants(), name
        assert CsrMatrix.from_dok_shuffled(dok, rng).invariants(), name
        count += 1
    assert count == len(paths)
