"""Scalar advection–diffusion stepper — the framework's flagship pipeline.

A compact-FD "model" in the PDE sense: advances

    df/dt = -(u . grad f) + nu * laplacian(f)

with RK3 (Williamson low-storage) time stepping, where every spatial
derivative is a compact derivative from this package. The diffusion term
uses the compact second-derivative ``laplacian`` when the ``Derivs``
bundle carries one (the default in the entry points — beyond the
reference, whose library only provides first derivatives) and falls back
to a repeated first derivative otherwise, which is the reference-parity
form. This is the end-to-end workload used by ``__graft_entry__``
and the benchmarks: it chains many derivative evaluations per step, which
is exactly the production shape (CFD RHS evaluations) the reference's
multi-GPU harness approximates with repeated dfdx calls
(perf-test/multi-GPU/PyCUDA/run.py:47-58).

Works identically on a single device (ops layer) or sharded over a mesh
(parallel layer) depending on the ``derivs`` bundle passed in.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops import derivatives as single
from ..schemes import SCHEME4_PERIODIC, CompactScheme

__all__ = ["AdvectionDiffusion", "Derivs"]


@dataclasses.dataclass(frozen=True)
class Derivs:
    """A (dfdx, dfdy, dfdz) bundle; single-device or distributed.

    ``laplacian``, when set, is used by the models for diffusion terms
    (compact second-derivative schemes: one solve per axis and no
    high-wavenumber damping from chaining two first derivatives). When
    None, models fall back to the repeated-first-derivative form — the
    only option the reference's first-derivative-only surface allows.
    """

    dfdx: Callable
    dfdy: Callable
    dfdz: Callable
    laplacian: Callable = None
    # f -> (fx, fy, fz); when set, models evaluate all three first
    # derivatives through it (single-device: ops.gradient, whose auto path
    # fuses dfdx+dfdy into one HBM read on TPU — ops/pallas_pair.py)
    gradient: Callable = None
    # (f, u, q, dt, nu, a, b) -> (q', f') or None: one fully-fused RK3
    # substep (ops/fused_step.py — four kernel dispatches, no elementwise
    # HBM passes). None return = unsupported for these shapes; the model
    # falls back to the generic rhs/step form.
    fused_substep: Callable = None
    # (u, q, dt, nu, a, b) -> (q', u') or None: the 3-component vector
    # momentum stage (ops/fused_step.make_fused_substep_vec — the merged
    # adv_lap3 head reads each velocity component once). Burgers/NS prefer
    # it over three scalar fused substeps when set.
    fused_substep_vec: Callable = None

    @classmethod
    def single_device(
        cls,
        spacing,
        scheme: CompactScheme = SCHEME4_PERIODIC,
        method: str = "auto",
        second_derivative: bool = False,
    ):
        """``second_derivative=True`` adds a compact-d2 ``laplacian`` of the
        same order/periodicity as ``scheme``."""
        dz, dy, dx = (
            (spacing, spacing, spacing)
            if isinstance(spacing, (int, float))
            else spacing
        )
        lap = None
        fused = None
        fused_vec = None
        if second_derivative:
            from ..schemes import get_scheme

            d2 = get_scheme(scheme.order, scheme.periodic, derivative=2)
            lap = lambda f: single.laplacian(f, (dz, dy, dx), d2, method=method)
            if method == "auto" and scheme.derivative_order == 1:
                from ..ops.fused_step import (
                    make_fused_substep,
                    make_fused_substep_vec,
                )

                fused = make_fused_substep((dz, dy, dx), scheme, d2)
                fused_vec = make_fused_substep_vec((dz, dy, dx), scheme, d2)
        return cls(
            dfdx=lambda f: single.dfdx(f, dx, scheme, method=method),
            dfdy=lambda f: single.dfdy(f, dy, scheme, method=method),
            dfdz=lambda f: single.dfdz(f, dz, scheme, method=method),
            laplacian=lap,
            gradient=lambda f: single.gradient(
                f, (dz, dy, dx), scheme, method=method
            ),
            fused_substep=fused,
            fused_substep_vec=fused_vec,
        )

    @classmethod
    def distributed(cls, solver, d2_solver=None, *, interpret: bool = False):
        """``d2_solver``: a DistributedCompactSolver over the same grid
        geometry with a derivative_order=2 scheme; its axis ops *are*
        second derivatives, so their sum is the sharded Laplacian.

        With a d2 solver the bundle also carries the distributed fused
        substep (parallel/fused.py): on meshes that leave z whole the RK3
        substep runs the round-4 shard-local kernel suite + the mega
        kernel in one traced program — the substep itself decides support
        at trace time and the model falls back to the generic step
        otherwise. ``gradient`` fuses dfdx+dfdy into one shard-local pair
        read on z-pencil meshes.
        """
        from ..parallel.fused import (
            make_fused_substep_distributed,
            make_gradient_distributed,
        )

        lap = None
        fused = None
        if d2_solver is not None:
            if d2_solver.grid.scheme.derivative_order != 2:
                raise ValueError(
                    "d2_solver must carry a derivative_order=2 scheme"
                )
            lap = lambda f: (
                d2_solver.dfdx(f) + d2_solver.dfdy(f) + d2_solver.dfdz(f)
            )
            if solver.grid.scheme.derivative_order == 1:
                fused = make_fused_substep_distributed(
                    solver, d2_solver, interpret=interpret
                )
        return cls(
            dfdx=solver.dfdx,
            dfdy=solver.dfdy,
            dfdz=solver.dfdz,
            laplacian=lap,
            gradient=make_gradient_distributed(solver),
            fused_substep=fused,
        )


@dataclasses.dataclass(frozen=True)
class AdvectionDiffusion:
    """RK3 advection–diffusion of a scalar by a frozen velocity field."""

    derivs: Derivs
    nu: float = 1e-3

    def rhs(self, f, u) -> jax.Array:
        ux, uy, uz = u
        d = self.derivs
        if d.gradient is not None:
            fx, fy, fz = d.gradient(f)
        else:
            fx, fy, fz = d.dfdx(f), d.dfdy(f), d.dfdz(f)
        adv = ux * fx + uy * fy + uz * fz
        if d.laplacian is not None:
            lap = d.laplacian(f)
        else:
            lap = d.dfdx(fx) + d.dfdy(fy) + d.dfdz(fz)
        return -adv + self.nu * lap

    def step(self, f, u, dt) -> jax.Array:
        """One low-storage RK3 step (Williamson coefficients)."""
        A = (0.0, -5.0 / 9.0, -153.0 / 128.0)
        B = (1.0 / 3.0, 15.0 / 16.0, 8.0 / 15.0)
        fs = self.derivs.fused_substep
        if fs is not None:
            # fully-fused substeps (ops/fused_step.py): four kernel
            # dispatches each, zero elementwise HBM passes. The first call
            # doubles as the trace-time support probe (None = fall back).
            out = fs(f, u, None, dt, self.nu, A[0], B[0])
            if out is not None:
                q, fc = out
                n_rest = len(A) - 1
                for i, (a, b) in enumerate(zip(A[1:], B[1:]), start=1):
                    # last=True on the final substep: q' is dead, the
                    # mega kernel elides its HBM write
                    q, fc = fs(fc, u, q, dt, self.nu, a, b, last=i == n_rest)
                return fc
        q = jnp.zeros_like(f)
        for a, b in zip(A, B):
            q = a * q + dt * self.rhs(f, u)
            f = f + b * q
        return f

    def run(self, f0, u, dt, n_steps: int) -> jax.Array:
        """n_steps of RK3 under lax.scan (jit-friendly, static trip count)."""

        def body(f, _):
            return self.step(f, u, dt), None

        f, _ = jax.lax.scan(body, f0, None, length=n_steps)
        return f
