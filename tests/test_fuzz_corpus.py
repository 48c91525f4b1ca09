"""Corpus-guided fuzz mode (verify/corpus.py): dispatch-path signatures
as the coverage signal, signature-novel cases persisted, stored cases
mutated — the libFuzzer coverage-feedback analog
(reference fuzz/fuzz_targets/mul_hash.rs:11-50)."""

import json
import os

import numpy as np
import pytest

from sparse_matrix_tpu.core.dok import DokMatrix
from sparse_matrix_tpu.verify.corpus import (
    FuzzCorpus, case_signature, mutate_pair)
from sparse_matrix_tpu.verify.fuzz import fuzz_spgemm


def _dok(rng, rows, cols, n):
    m = DokMatrix(rows, cols, dtype=np.float64)
    for _ in range(n):
        m.set_element((int(rng.integers(rows)), int(rng.integers(cols))),
                      np.float64(rng.standard_normal()))
    return m


def test_corpus_grows_and_dedupes(tmp_path):
    d = str(tmp_path / "corpus")
    n = fuzz_spgemm(60, seed=1, corpus_dir=d, mutate_prob=0.4,
                    include_amortized=True)
    assert n == 60
    c = FuzzCorpus(d)
    # novel signatures only: far fewer entries than cases, but several
    assert 2 <= len(c) < 60
    idx = json.load(open(os.path.join(d, "index.json")))
    for fa, fb in idx.values():
        assert os.path.exists(os.path.join(d, fa))
        assert os.path.exists(os.path.join(d, fb))


def test_corpus_mutation_round(tmp_path):
    d = str(tmp_path / "corpus")
    fuzz_spgemm(30, seed=2, corpus_dir=d)
    before = len(FuzzCorpus(d))
    assert before > 0
    # second run loads the same corpus, mutates aggressively, stays green
    fuzz_spgemm(40, seed=3, corpus_dir=d, mutate_prob=0.9)
    assert len(FuzzCorpus(d)) >= before


def test_mutators_preserve_conformability():
    rng = np.random.default_rng(0)
    a = _dok(rng, 5, 7, 10)
    b = _dok(rng, 7, 4, 10)
    for _ in range(200):
        ma, mb = mutate_pair(rng, a, b, non_finite=True)
        assert ma.cols == mb.rows
        assert ma.rows >= 1 and mb.cols >= 1
        assert ma.invariants() and mb.invariants()


def test_failure_dump_seeds_corpus(tmp_path):
    # a failure-dump-style pair dropped into the dir becomes a seed
    from sparse_matrix_tpu.core.matrix_market import save_matrix_market

    d = str(tmp_path / "corpus")
    os.makedirs(d)
    rng = np.random.default_rng(5)
    save_matrix_market(_dok(rng, 3, 3, 4),
                       os.path.join(d, "case167_esc_lhs.mtx"))
    save_matrix_market(_dok(rng, 3, 3, 4),
                       os.path.join(d, "case167_esc_rhs.mtx"))
    c = FuzzCorpus(d)
    assert len(c) == 1
    pair = c.sample(np.random.default_rng(0))
    assert pair is not None and pair[0].rows == 3


def test_signature_captures_dispatch_feats():
    rng = np.random.default_rng(9)
    from sparse_matrix_tpu.formats.csr import CsrMatrix

    a = CsrMatrix.from_dok(_dok(rng, 6, 6, 12))
    b = CsrMatrix.from_dok(_dok(rng, 6, 6, 12))
    s1 = case_signature(a, b, ["hash_native"], {})
    s2 = case_signature(a, b, ["hash_native"], {"fs_lhs": "lanepack"})
    s3 = case_signature(a, b, ["hash_native", "esc_numpy"], {})
    assert s1 != s2 and s1 != s3
    # deterministic
    assert s1 == case_signature(a, b, ["hash_native"], {})
