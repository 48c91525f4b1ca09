"""scipy.sparse namespace completion: format-constructor aliases
(dok/dia/bsr/lil + *_array), predicates, array-API helpers, and index
dtype utilities — differential vs scipy where scipy has the behavior."""

import numpy as np
import pytest
import scipy.sparse as ss

import sparse_matrix_tpu.sparse as S
from sparse_matrix_tpu.core import DokMatrix
from sparse_matrix_tpu.formats import CsrMatrix


def test_namespace_covers_scipy_sparse():
    pub = lambda m: {n for n in dir(m) if not n.startswith("_")}  # noqa: E731
    internal = {
        "test", "sputils", "sparsetools", "warn", "base", "bsr",
        "compressed", "construct", "coo", "csc", "csgraph", "csr", "data",
        "dia", "dok", "extract", "lil", "linalg", "sppackage",
    }
    missing = pub(ss) - pub(S) - internal
    assert missing == set(), f"scipy.sparse names unimplemented: {missing}"


def test_dok_matrix_item_access():
    d = S.dok_matrix((3, 4), dtype=np.float64)
    d[1, 2] = 5.0
    d[0, 0] = 1.0
    assert d[1, 2] == 5.0 and d[2, 3] == 0.0
    d[1, 2] = 0.0  # zero write deletes (reference DOK semantics)
    assert d.nnz() == 1 and isinstance(d, DokMatrix)
    assert S.isspmatrix_dok(d)
    back = S.dok_matrix(S.csr_matrix(np.eye(3)))
    assert back.nnz() == 3


@pytest.mark.parametrize("shape", [(4, 4), (5, 4), (4, 6)])
def test_dia_matrix_matches_scipy(shape):
    data = np.arange(12.0).reshape(3, 4)
    offs = [-1, 0, 2]
    ours = S.dia_matrix((data, offs), shape=shape).toarray()
    theirs = ss.dia_matrix((data, offs), shape=shape).toarray()
    np.testing.assert_allclose(ours, theirs)


def test_bsr_matrix_matches_scipy():
    ind = np.array([0, 2, 2, 0])
    ptr = np.array([0, 2, 3, 4])
    bd = np.arange(4 * 2 * 3.0).reshape(4, 2, 3)
    ours = S.bsr_matrix((bd, ind, ptr)).toarray()
    theirs = ss.bsr_matrix((bd, ind, ptr)).toarray()
    np.testing.assert_allclose(ours, theirs)
    d = np.eye(4)
    np.testing.assert_allclose(S.bsr_matrix(d).toarray(), d)


def test_eye_array_and_block_array():
    np.testing.assert_allclose(S.eye_array(3, 5, k=1).toarray(),
                               ss.eye_array(3, 5, k=1).toarray())
    a = S.csr_matrix(np.eye(2))
    got = S.block_array([[a, None], [None, a]]).toarray()
    np.testing.assert_allclose(got, np.eye(4))


def test_swapaxes_permute_dims_expand_dims():
    m = S.random(6, 4, 0.5, random_state=0)
    np.testing.assert_allclose(S.swapaxes(m, 0, 1).toarray(), m.toarray().T)
    np.testing.assert_allclose(S.permute_dims(m, (1, 0)).toarray(),
                               m.toarray().T)
    np.testing.assert_allclose(S.permute_dims(m, (0, 1)).toarray(),
                               m.toarray())
    with pytest.raises(ValueError):
        S.permute_dims(m, (2, 0))
    with pytest.raises(NotImplementedError):
        S.expand_dims(m, 0)


def test_index_dtype_helpers():
    assert S.get_index_dtype(maxval=2 ** 40) == np.int64
    assert S.get_index_dtype((np.array([1, 2], np.int32),)) == np.int32
    assert S.get_index_dtype((np.array([1, 2], np.int64),)) == np.int64
    assert S.get_index_dtype(
        (np.array([1, 2], np.int64),), check_contents=True) == np.int32
    m = S.random(5, 5, 0.3, random_state=1)
    i, p = S.safely_cast_index_arrays(m, np.int32)
    assert i.dtype == np.int32 and p.dtype == np.int32
    np.testing.assert_array_equal(i, np.asarray(m.indices, np.int64))


def test_isinstance_and_warning_hierarchy():
    m = S.csr_matrix(np.eye(2))
    d = S.dok_matrix((2, 2))
    assert isinstance(m, S.sparray) and isinstance(d, S.spmatrix)
    assert issubclass(S.SparseEfficiencyWarning, S.SparseWarning)
    assert isinstance(m, CsrMatrix)
    for pred in (S.isspmatrix_csc, S.isspmatrix_coo, S.isspmatrix_dia,
                 S.isspmatrix_lil, S.isspmatrix_bsr):
        assert pred(m) is False
    assert S.isspmatrix_csr(m) is True
