"""Model layer: analytic fields and PDE steppers built on compact derivatives."""

from .advection_diffusion import AdvectionDiffusion, Derivs
from .burgers import Burgers
from .fields import benchmark_field, sine_field, taylor_green

__all__ = [
    "AdvectionDiffusion",
    "Burgers",
    "Derivs",
    "benchmark_field",
    "sine_field",
    "taylor_green",
]
