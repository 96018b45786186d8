"""Single-device compute ops: tridiagonal solvers, RHS assembly, derivatives."""

from . import rhs, tridiag
from .derivatives import (
    curl,
    d2fdx2,
    d2fdy2,
    d2fdz2,
    derivative,
    dfdx,
    dfdy,
    dfdz,
    divergence,
    gradient,
    filter_field,
    laplacian,
    line_factors,
)
from .poisson import (
    laplacian_eigenvalues,
    project,
    solve_poisson,
    spectral_multipliers,
)
from .rhs import closure_ghosts, compact_rhs
from .tridiag import (
    CyclicFactors,
    PCRFactors,
    ThomasFactors,
    cyclic_factor,
    cyclic_solve,
    pcr_factor,
    pcr_solve,
    thomas_factor,
    thomas_solve,
)

__all__ = [
    "tridiag",
    "rhs",
    "curl",
    "d2fdx2",
    "d2fdy2",
    "d2fdz2",
    "derivative",
    "dfdx",
    "dfdy",
    "dfdz",
    "divergence",
    "gradient",
    "filter_field",
    "laplacian",
    "line_factors",
    "laplacian_eigenvalues",
    "project",
    "solve_poisson",
    "spectral_multipliers",
    "closure_ghosts",
    "compact_rhs",
    "CyclicFactors",
    "PCRFactors",
    "ThomasFactors",
    "cyclic_factor",
    "cyclic_solve",
    "pcr_factor",
    "pcr_solve",
    "thomas_factor",
    "thomas_solve",
]
