"""Iterative solvers (CG) and model problems (2D Poisson)."""

from .cg import CgResult, cg_solve  # noqa: F401
from .poisson import poisson_2d_csr  # noqa: F401
