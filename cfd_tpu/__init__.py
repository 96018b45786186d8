"""cfd_tpu — a TPU-native compact finite-difference framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
CUDA/OpenCL + MPI library ``ashwinsrnth/compact-finite-differences``:
4th/6th-order compact (Padé) first derivatives of 3-D scalar fields, batched
near-Toeplitz tridiagonal solves with precomputed coefficient tables, pencil
domain decomposition over a ``jax.sharding.Mesh`` with ``ppermute`` halo
exchange, and a distributed reduced-interface (substructuring) tridiagonal
solve closed with an ``all_gather`` over the line axis.

See SURVEY.md for the structural map of the reference and BASELINE.md for the
performance baselines this package is measured against.
"""

from . import models, oracle, ops, parallel, schemes, utils
from .parallel import DistributedCompactSolver, Grid, make_mesh
from .ops import (
    curl,
    derivative,
    dfdx,
    dfdy,
    dfdz,
    divergence,
    gradient,
)
from .schemes import (
    SCHEME4,
    SCHEME4_PERIODIC,
    SCHEME6,
    SCHEME6_PERIODIC,
    CompactScheme,
    get_scheme,
)

__version__ = "0.1.0"

__all__ = [
    "oracle",
    "ops",
    "parallel",
    "schemes",
    "utils",
    "DistributedCompactSolver",
    "Grid",
    "make_mesh",
    "curl",
    "derivative",
    "dfdx",
    "dfdy",
    "dfdz",
    "divergence",
    "gradient",
    "CompactScheme",
    "get_scheme",
    "SCHEME4",
    "SCHEME4_PERIODIC",
    "SCHEME6",
    "SCHEME6_PERIODIC",
]
