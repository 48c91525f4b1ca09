"""Iterative solvers (CG) and model problems (2D Poisson)."""

from .cg import (  # noqa: F401
    CgResult,
    cg_solve,
    cg_solve_ir,
    cg_solve_multi,
    pcg_solve,
    pcg_solve_multi,
    jacobi_preconditioner,
)
from .minres import minres_solve  # noqa: F401
from .eigen import (  # noqa: F401
    PowerResult,
    eigs,
    power_iteration,
    inverse_power_iteration,
    lanczos,
    eigsh_extremal,
    eigsh_shift_invert,
    eigs_shift_invert,
)
from .generalized import (  # noqa: F401
    eigs_generalized,
    eigsh_generalized,
    lobpcg_generalized,
)
from .funm import (  # noqa: F401
    expm_multiply,
    expm_multiply_csr,
    expm_multiply_sym,
)
from .bicgstab import bicgstab_solve  # noqa: F401
from .funm_krylov import funm_multiply_krylov  # noqa: F401
from .krylov_recycle import (  # noqa: F401
    gcrotmk_solve,
    lgmres_solve,
)
from .krylov_extra import (  # noqa: F401
    bicg_solve,
    cgs_solve,
    qmr_solve,
    tfqmr_solve,
)
from .lsqr import LsqrResult, lsqr_solve  # noqa: F401
from .lsmr import LsmrResult, lsmr_solve  # noqa: F401
from .factorized import (  # noqa: F401
    SpiluFactor,
    SpluFactor,
    factorized,
    spilu,
    splu,
)
from .lobpcg import LobpcgResult, lobpcg  # noqa: F401
from .gmres import gmres_solve  # noqa: F401
from .amg import (  # noqa: F401
    AmgHierarchy,
    amg_coarsen,
    load_amg_coarsening,
    save_amg_coarsening,
    amg_pcg_solve,
    amg_preconditioner,
    amg_setup,
)
from .amg_refresh import AmgRefresh  # noqa: F401
from .ilu import (  # noqa: F401
    IluFactors,
    TriangularJacobi,
    ic0,
    ic_pcg_solve,
    ic_preconditioner,
    ilu0,
    ilu_preconditioner,
    ilut,
    ilut_preconditioner,
    load_ilu_factors,
    save_ilu_factors,
    trisolve_host,
)
from .svd import SvdResult, svds, svds_csr  # noqa: F401
from .cholesky import (  # noqa: F401
    CholFactor,
    LdlFactor,
    LuFactor,
    chol,
    chol_solve,
    ldl,
    ldl_solve,
    lu,
    lu_solve,
    spsolve_chol,
)
from .chebyshev import chebyshev_solve  # noqa: F401
from .normest import condest, onenormest  # noqa: F401
from .block_jacobi import (  # noqa: F401
    block_jacobi_preconditioner,
    chebyshev_preconditioner,
)
from .stochastic import (  # noqa: F401
    HutchinsonResult,
    diag_estimate,
    trace_estimate,
)
from .solve import lstsq, solve, spsolve, spsolve_triangular  # noqa: F401
from .poisson import poisson_2d_csr, poisson_3d_csr  # noqa: F401
