"""Corpus-guided fuzzing: the coverage-feedback analog of the reference's
libFuzzer target (``/root/reference/fuzz/fuzz_targets/mul_hash.rs:11-50``
+ ``fuzz/Cargo.toml`` — libFuzzer evolves a corpus by coverage signal).

No branch-coverage instrumentation exists for a numpy/JAX/C++ mix, so the
coverage signal here is the library's own *dispatch-path signature*: which
engines ran, which SpMV format each amortized engine's selection operator
routed to, size/finiteness/sentinel buckets of the inputs, and output-shape
buckets. Two cases with the same signature exercise the same set of
dispatch decisions; a case with a NEW signature lands in the corpus and
becomes mutation fodder. This walks toward dispatch-boundary corners the
uniform sampler reaches only by luck — precisely the corners where round-4
found case167 (the pad-slot 0*inf leak).

Corpus layout: ``<dir>/index.json`` maps signature string -> pair of
MatrixMarket files (the same dump format the failure path uses, so failure
dumps can be seeded straight into a corpus).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.dok import DokMatrix
from ..core.matrix_market import (load_matrix_market, save_matrix_market)

__all__ = ["FuzzCorpus", "case_signature", "mutate_pair"]


def _bucket(x: int) -> int:
    return int(x).bit_length()


def case_signature(ca, cb, ran, feats: Dict) -> Tuple:
    """Dispatch-path signature of one differential case: the tuple every
    corpus entry is deduplicated by. ``ran`` = engine names that returned
    a result; ``feats`` = engine-internal route observations (selection-
    operator formats etc.) collected by the implementations."""
    finite = bool(np.isfinite(ca.vals).all() and np.isfinite(cb.vals).all())
    return (
        _bucket(ca.rows), _bucket(ca.cols), _bucket(cb.cols),
        _bucket(ca.nnz()), _bucket(cb.nnz()),
        finite, cb.cols > (1 << 31),
        tuple(sorted(ran)),
        tuple(sorted((k, str(v)) for k, v in feats.items())),
    )


class FuzzCorpus:
    """Signature-deduplicated case store (MatrixMarket pairs + JSON
    index). ``maybe_add`` persists a case when its signature is new;
    ``sample`` returns a random stored pair for mutation."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._index_path = os.path.join(path, "index.json")
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index: Dict[str, List[str]] = json.load(f)
        else:
            self._index = {}
        # failure dumps dropped into the corpus dir seed it directly
        seeds = sorted(
            f[: -len("_lhs.mtx")] for f in os.listdir(path)
            if f.endswith("_lhs.mtx"))
        known = {os.path.basename(p[0])[: -len("_lhs.mtx")]
                 for p in self._index.values()}
        for s in seeds:
            if s not in known and os.path.exists(
                    os.path.join(path, f"{s}_rhs.mtx")):
                self._index[f"seed:{s}"] = [f"{s}_lhs.mtx", f"{s}_rhs.mtx"]
        self._keys = list(self._index)

    def __len__(self) -> int:
        return len(self._index)

    def maybe_add(self, sig: Tuple, a: DokMatrix, b: DokMatrix) -> bool:
        key = repr(sig)
        if key in self._index:
            return False
        name = f"cov{len(self._index):05d}"
        save_matrix_market(a, os.path.join(self.path, f"{name}_lhs.mtx"))
        save_matrix_market(b, os.path.join(self.path, f"{name}_rhs.mtx"))
        self._index[key] = [f"{name}_lhs.mtx", f"{name}_rhs.mtx"]
        self._keys.append(key)
        with open(self._index_path, "w") as f:
            json.dump(self._index, f)
        return True

    def sample(self, rng: np.random.Generator
               ) -> Optional[Tuple[DokMatrix, DokMatrix]]:
        if not self._keys:
            return None
        fa, fb = self._index[self._keys[int(rng.integers(len(self._keys)))]]
        a = load_matrix_market(os.path.join(self.path, fa)).matrix
        b = load_matrix_market(os.path.join(self.path, fb)).matrix
        return a, b


def _entries(m: DokMatrix):
    return [((int(i), int(j)), v) for (i, j), v in m.iter_entries()]


def _resize(m: DokMatrix, rows: int, cols: int) -> DokMatrix:
    out = DokMatrix(rows, cols, dtype=np.float64)
    for (i, j), v in _entries(m):
        if i < rows and j < cols:
            out.set_element((i, j), np.float64(v))
    return out


def mutate_pair(rng: np.random.Generator, a: DokMatrix, b: DokMatrix,
                non_finite: bool) -> Tuple[DokMatrix, DokMatrix]:
    """libFuzzer-style small mutations, conformability-preserving:
    value perturb / non-finite flip / entry insert/delete / dim nudge /
    RHS-width jump to the u32-sentinel boundary."""
    a = _resize(a, a.rows, a.cols)  # deep copies
    b = _resize(b, b.rows, b.cols)
    for _ in range(int(rng.integers(1, 4))):
        op = int(rng.integers(0, 6))
        t = a if rng.random() < 0.5 else b
        if op == 0 and t.nnz():  # perturb one value
            es = _entries(t)
            (i, j), v = es[int(rng.integers(len(es)))]
            t.set_element((i, j), np.float64(v * rng.standard_normal()))
        elif op == 1:  # insert
            t.set_element(
                (int(rng.integers(t.rows)), int(rng.integers(t.cols))),
                np.float64(np.nan if (non_finite and rng.random() < 0.25)
                           else rng.standard_normal() * 10.0
                           ** int(rng.integers(-3, 4))))
        elif op == 2 and t.nnz():  # delete (zero-deletion semantics)
            es = _entries(t)
            (i, j), _v = es[int(rng.integers(len(es)))]
            t.set_element((i, j), np.float64(0.0))
        elif op == 3:  # nudge the shared inner dim
            m_new = max(1, a.cols + int(rng.integers(-2, 3)))
            a = _resize(a, a.rows, m_new)
            b = _resize(b, m_new, b.cols)
        elif op == 4:  # nudge outer dims
            a = _resize(a, max(1, a.rows + int(rng.integers(-2, 3))), a.cols)
            b = _resize(b, b.rows, max(1, b.cols + int(rng.integers(-2, 3))))
        elif op == 5 and rng.random() < 0.3:
            # jump RHS width to the sentinel boundary (and back)
            if b.cols > (1 << 31):
                b = _resize(b, b.rows, int(rng.integers(1, 32)))
            else:
                wide = (1 << 32) - 1 - int(rng.integers(0, 3))
                nb = DokMatrix(b.rows, wide, dtype=np.float64)
                for (i, j), v in _entries(b):
                    nb.set_element(
                        (i, int(wide - 1 - (j % 16))), np.float64(v))
                b = nb
    return a, b
