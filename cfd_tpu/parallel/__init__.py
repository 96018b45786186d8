"""Distributed layer: device-mesh grids, halo exchange, distributed solves."""

from .compact import DirectionTables, DistributedCompactSolver, direction_tables
from .halo import exchange_1d, halo_slices
from .mesh import AXIS_NAMES, Grid, make_mesh

__all__ = [
    "AXIS_NAMES",
    "Grid",
    "make_mesh",
    "halo_slices",
    "exchange_1d",
    "DistributedCompactSolver",
    "DirectionTables",
    "direction_tables",
]
