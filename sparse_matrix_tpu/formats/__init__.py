"""Matrix formats: host CSR plus device-resident pytree/tiled formats."""

from .csr import CsrMatrix, INDEX_DTYPE, OFFSET_DTYPE, SENTINEL  # noqa: F401
from .construct import (  # noqa: F401
    block_diag,
    bmat,
    diags,
    eye,
    find,
    hstack,
    kron,
    load_npz,
    matrix_power,
    norm,
    random_csr,
    save_npz,
    submatrix,
    tril,
    triu,
    vstack,
)
from .reorder import (  # noqa: F401
    bandwidth,
    nd_permutation,
    permute_symmetric,
    rcm_permutation,
    rcm_reordered,
)
