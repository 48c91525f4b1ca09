"""Multi-chip sharding: meshes, distributed SpMV/SpGEMM, distributed CG."""

from .mesh import make_mesh, row_sharding, replicated, P  # noqa: F401
from .spmv import (  # noqa: F401
    shard_ell,
    dist_spmv,
    dist_spmv_gspmd,
    shard_ell_by_cols,
    dist_spmv_colsplit,
)
from .spgemm import dist_spgemm  # noqa: F401
from .stripe import shard_stripe, dist_spmv_stripe  # noqa: F401
from .dia import shard_dia, dist_spmv_dia, dist_spmv_dia_halo, dist_cg_solve_dia  # noqa: F401
from .spmm2d import make_mesh2d, shard_ell_2d, dist_spmm_2d  # noqa: F401
from .cg import dist_cg_step, dist_cg_solve, prepare_dist_cg  # noqa: F401
from .ilu import (  # noqa: F401
    DistIcFactor,
    dist_ic_pcg_solve,
    dist_ic_setup,
)
from .batched import (  # noqa: F401
    dist_batched_cg_solve,
    shard_batched_operator,
)
from .amg import (  # noqa: F401
    DistAmgHierarchy,
    DistAmgLevel,
    dist_amg_pcg_solve,
    dist_amg_setup,
)
