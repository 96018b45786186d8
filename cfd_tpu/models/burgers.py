"""3-D viscous Burgers system — second PDE model family.

    du/dt + (u . grad) u = nu * laplacian(u)

for a 3-component velocity field, with every spatial derivative a compact
derivative from this package (Laplacian via the compact second-derivative
schemes when the Derivs bundle provides one, else as repeated first
derivative).
Nonlinear counterpart of the advection–diffusion model: the advecting field
is the solution itself, so each RK stage re-evaluates all nine first
derivatives — a heavier, production-shaped pipeline (the Taylor–Green
vortex decay configuration from BASELINE.json's config list runs on this).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .advection_diffusion import Derivs

__all__ = ["Burgers"]


@dataclasses.dataclass(frozen=True)
class Burgers:
    """Low-storage RK3 stepper for the viscous Burgers system."""

    derivs: Derivs
    nu: float = 1e-2

    def rhs(self, u) -> Tuple[jax.Array, jax.Array, jax.Array]:
        ux, uy, uz = u
        d = self.derivs
        out = []
        for comp in (ux, uy, uz):
            if d.gradient is not None:
                cx, cy, cz = d.gradient(comp)
            else:
                cx, cy, cz = d.dfdx(comp), d.dfdy(comp), d.dfdz(comp)
            adv = ux * cx + uy * cy + uz * cz
            if d.laplacian is not None:
                lap = d.laplacian(comp)
            else:
                lap = d.dfdx(cx) + d.dfdy(cy) + d.dfdz(cz)
            out.append(-adv + self.nu * lap)
        return tuple(out)

    def step(self, u, dt):
        A = (0.0, -5.0 / 9.0, -153.0 / 128.0)
        B = (1.0 / 3.0, 15.0 / 16.0, 8.0 / 15.0)
        fsv = self.derivs.fused_substep_vec
        if fsv is not None:
            # vector momentum stage: all three components through the
            # merged adv_lap3 head (each velocity read once per stage)
            first = fsv(tuple(u), None, dt, self.nu, A[0], B[0])
            if first is not None:
                q, cur = first
                for si in (1, 2):
                    q, cur = fsv(
                        cur, q, dt, self.nu, A[si], B[si], last=si == 2
                    )
                return tuple(cur)
        fs = self.derivs.fused_substep
        if fs is not None:
            # the advecting field is frozen within a substep, so each
            # component is exactly one fused advection-diffusion substep
            # (ops/fused_step.py) against the substep-start velocity
            first = fs(u[0], u, None, dt, self.nu, A[0], B[0])
            if first is not None:
                q = [None, None, None]
                cur = list(u)
                for si, (a, b) in enumerate(zip(A, B)):
                    frozen = tuple(cur)
                    for i in range(3):
                        if si == 0 and i == 0:
                            q[0], cur[0] = first
                        else:
                            # last=True on the final substep: q' is dead,
                            # the mega kernel elides its HBM write
                            q[i], cur[i] = fs(
                                frozen[i], frozen, q[i], dt, self.nu, a, b,
                                last=si == 2,
                            )
                return tuple(cur)
        q = tuple(jnp.zeros_like(c) for c in u)
        for a, b in zip(A, B):
            r = self.rhs(u)
            q = tuple(a * qi + dt * ri for qi, ri in zip(q, r))
            u = tuple(ui + b * qi for ui, qi in zip(u, q))
        return u

    def run(self, u0, dt, n_steps: int):
        def body(u, _):
            return self.step(u, dt), None

        u, _ = jax.lax.scan(body, u0, None, length=n_steps)
        return u

    def kinetic_energy(self, u) -> jax.Array:
        return 0.5 * sum(jnp.mean(c * c) for c in u)
