"""Device and host kernels: SpMV, SpGEMM, elementwise add/sub, transpose."""

from .spgemm_host import (  # noqa: F401
    flops_per_row,
    partition_rows_by_flops,
    spgemm_hash_host,
    spgemm_esc_host,
)
