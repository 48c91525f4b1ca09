"""linprobe table tests (reference ``linprobe/src``)."""

import numpy as np
import pytest
from hypothesis import given
from hypothesis import strategies as st

from sparse_matrix_tpu.utils import EMPTY, LinProbeMap, LinProbeSet, mul_hash_u32
from sparse_matrix_tpu.utils.linprobe import _capacity_for


def test_hash_is_multiplicative_107():
    # linprobe/src/lib.rs:13
    assert mul_hash_u32(1) == 107
    assert mul_hash_u32(0) == 0
    assert mul_hash_u32(2**32 - 2) == ((2**32 - 2) * 107) % 2**32


def test_capacity_pow2_min16():
    # capacity = next_pow2(n)*2, min 16 (linprobe/src/lib.rs:14, set.rs:38-43)
    assert _capacity_for(1) == 16
    assert _capacity_for(8) == 16
    assert _capacity_for(9) == 32
    assert _capacity_for(16) == 32
    assert _capacity_for(17) == 64


def test_sentinel_key_rejected():
    s = LinProbeSet()
    with pytest.raises(ValueError):
        s.insert(EMPTY)
    m = LinProbeMap(4)
    with pytest.raises(ValueError):
        m.upsert(EMPTY, 1.0, lambda a, b: a + b)


@given(st.lists(st.integers(min_value=0, max_value=2**32 - 2), max_size=200))
def test_set_matches_python_set(keys):
    s = LinProbeSet()
    ref = set()
    for k in keys:
        assert s.insert(k) == (k not in ref)
        ref.add(k)
        assert len(s) == len(ref)
    for k in keys:
        assert k in s
    assert (max(keys) + 1 if keys else 0) in s or (max(keys) + 1 if keys else 0) not in ref


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=1000), st.integers(min_value=-5, max_value=5)),
        max_size=100,
    )
)
def test_map_accumulates_like_dict(pairs):
    m = LinProbeMap(len(pairs) or 1)
    ref = {}
    for k, v in pairs:
        m.upsert(k, v, lambda a, b: a + b)
        ref[k] = ref.get(k, 0) + v
    assert len(m) == len(ref)
    for k, v in ref.items():
        assert m.get(k) == v
    drained = dict(m.drain())
    assert drained == ref
    assert len(m) == 0


def test_set_grows_past_initial_capacity():
    s = LinProbeSet()
    for k in range(1000):
        s.insert(k)
    assert len(s) == 1000
    assert all(k in s for k in range(0, 1000, 37))


def test_shrink_to_reuses_window():
    s = LinProbeSet(capacity_hint=512)
    s.insert(5)
    s.shrink_to(4)  # narrow window; contents cleared
    assert len(s) == 0
    s.insert(7)
    assert 7 in s and 5 not in s


def test_probe_histogram_recorded():
    s = LinProbeSet(record_probes=True)
    for k in range(20):
        s.insert(k)
    assert sum(s.probe_lengths.values()) == 20
    assert 0 in s.probe_lengths
