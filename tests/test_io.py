"""scipy.io-shaped mmread/mmwrite/mminfo over the MatrixMarket engine —
differential vs scipy.io on shared files, round-trips, array format."""

import io as _stdio

import numpy as np
import pytest
import scipy.io
import scipy.sparse as sp

from sparse_matrix_tpu.core.matrix_market import MatrixMarketError
from sparse_matrix_tpu.io import mminfo, mmread, mmwrite


def _rand(rng, m, n, density=0.2):
    return sp.random(m, n, density=density, random_state=rng).tocsr()


def test_mmread_matches_scipy_on_scipy_written_file(tmp_path):
    rng = np.random.default_rng(0)
    s = _rand(rng, 17, 11)
    p = tmp_path / "a.mtx"
    scipy.io.mmwrite(p, s)
    ours = mmread(p)
    np.testing.assert_allclose(ours.toarray(), s.toarray())
    assert mminfo(p) == scipy.io.mminfo(p)


def test_mmwrite_read_back_by_scipy(tmp_path):
    rng = np.random.default_rng(1)
    s = _rand(rng, 9, 13)
    from sparse_matrix_tpu.formats import CsrMatrix

    ours = CsrMatrix.from_scipy(s)
    p = tmp_path / "b.mtx"
    mmwrite(p, ours, comment="written by sparse_matrix_tpu")
    theirs = scipy.io.mmread(p)
    np.testing.assert_allclose(theirs.toarray(), s.toarray())
    # file-like targets work too
    buf = _stdio.StringIO()
    mmwrite(buf, ours)
    np.testing.assert_allclose(
        mmread(_stdio.StringIO(buf.getvalue())).toarray(), s.toarray())


def test_mmwrite_accepts_scipy_and_dense_and_fields(tmp_path):
    d = np.array([[1, 0, 3], [0, -2, 0]], dtype=np.int64)
    p = tmp_path / "c.mtx"
    mmwrite(p, d)  # integer field inferred
    assert mminfo(p)[4] == "integer"
    np.testing.assert_allclose(scipy.io.mmread(p).toarray(), d)
    mmwrite(p, sp.csr_matrix(d.astype(float)), field="pattern")
    r, c, e, fmt, field, symm = mminfo(p)
    assert (fmt, field) == ("coordinate", "pattern")
    patt = mmread(p)
    assert patt.nnz() == 3
    with pytest.raises(NotImplementedError):
        mmwrite(p, d, field="complex")
    with pytest.raises(NotImplementedError):
        mmwrite(p, d, symmetry="symmetric")


@pytest.mark.parametrize("symmetry", ["general", "symmetric",
                                      "skew-symmetric"])
def test_mmread_array_format_matches_scipy(tmp_path, symmetry):
    rng = np.random.default_rng(2)
    d = rng.standard_normal((6, 6))
    if symmetry == "symmetric":
        d = (d + d.T) / 2
    elif symmetry == "skew-symmetric":
        d = (d - d.T) / 2
    p = tmp_path / "d.mtx"
    scipy.io.mmwrite(p, d, symmetry=symmetry)
    assert scipy.io.mminfo(p)[5] == symmetry
    np.testing.assert_allclose(mmread(p).toarray(), d, atol=1e-15)


def test_mmread_symmetric_coordinate_and_pattern(tmp_path):
    text = """%%MatrixMarket matrix coordinate real symmetric
3 3 3
1 1 2.0
2 1 -1.0
3 3 4.0
"""
    p = tmp_path / "e.mtx"
    p.write_text(text)
    ours = mmread(p).toarray()
    theirs = scipy.io.mmread(p).toarray()
    np.testing.assert_allclose(ours, theirs)
    ptext = """%%MatrixMarket matrix coordinate pattern general
2 2 2
1 2
2 1
"""
    p.write_text(ptext)
    np.testing.assert_allclose(mmread(p).toarray(),
                               scipy.io.mmread(p).toarray())


def test_mminfo_errors():
    with pytest.raises(MatrixMarketError):
        mminfo(_stdio.StringIO("garbage\n1 1 1\n"))
    with pytest.raises(MatrixMarketError):
        mminfo(_stdio.StringIO("%%MatrixMarket matrix coordinate real general\n"))
