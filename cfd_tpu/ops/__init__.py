"""Single-device compute ops: tridiagonal solvers, RHS assembly, derivatives."""

from . import tridiag
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
