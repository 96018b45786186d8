"""Fused RK3 advection–diffusion substep: two kernel dispatches, no
elementwise HBM passes.

One Williamson RK3 substep of df/dt = -(u . grad f) + nu * lap f is,
unfused, ~20 HBM passes at 256^3: the pair kernel (1 read, 2 writes), the
leading d1 kernel (1+1), the four-pass Laplacian (2+2), and an XLA
elementwise pass reading NINE arrays (ux, uy, uz, fx, fy, fz, lap, q, f)
and writing two — measured at 42% of the whole step's device time
(docs/RESULTS.md round-3 profile: 2.58 of 6.19 ms/step).

This module chains the kernels' fused epilogues so no derivative, no
advection product, and no RK state ever makes a dedicated HBM trip:

    axy, r = adv_lap_rhs(f, ux, uy)   # ux*fx + uy*fy AND the Laplacian
                                      # RHS from one streaming pass (3r + 2w)
    q', f' = rk3_mega(f, r, axy, uz, q)  # d1z + lap solve + RK update
                                         # in one dispatch (5r + 2w)

TWO dispatches, 12 HBM passes, zero XLA elementwise traffic. Configs the
merged kernels don't serve fall back stepwise: advection_pair + lap_rhs
as separate dispatches (13 passes / 3 dispatches with the mega kernel),
and leading_derivative + rk3_solve_update for the tail (16 passes / 4
dispatches) when the mega kernel's VMEM budget is exceeded.
Results match the generic ``AdvectionDiffusion.step`` to f32 arithmetic
(same operators, same tables — the derivatives are bit-identical to the
unfused kernels; only the elementwise evaluation order differs).

Requires: 3-D float32 fields, a derivative_order=1 scheme the pair and
leading kernels serve, and a PERIODIC derivative_order=2 scheme (the
``lap_rhs`` change of variables is closure-hostile — ops/pallas_lap.py).
Callers fall back to the generic rhs/step path otherwise.

Reference lineage: the reference has no fused production step at all —
its multi-GPU harness times repeated bare dfdx calls
(/root/reference/perf-test/multi-GPU/PyCUDA/run.py:47-58); this is the
production shape those calls approximate, built TPU-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..schemes import CompactScheme

__all__ = [
    "fused_substep_supported",
    "make_fused_substep",
    "make_fused_substep_vec",
]


def fused_substep_supported(shape, dtype, scheme: CompactScheme, d2: CompactScheme) -> bool:
    """Whether the four-dispatch fused substep serves this configuration."""
    from .pallas_lap import lap_rhs_supported
    from .pallas_leading import (
        LANE,
        _auto_sublanes,
        leading_supported,
        rk3_update_supported,
    )
    from .pallas_pair import adv_pair_supported

    if len(shape) != 3 or dtype != jnp.float32:
        return False
    nz, ny, nx = shape
    return (
        adv_pair_supported(scheme, ny, nx, dtype)
        and lap_rhs_supported(d2, nz, ny, nx, dtype)
        and leading_supported(scheme, nz, dtype)
        # the d1+advection dispatch streams 4 blocks (f, uz, axy, out)
        and nx % LANE == 0
        and ny % 8 == 0
        and _auto_sublanes(nz, ny, 4) > 0
        and rk3_update_supported(d2, shape, dtype, has_q=True)
    )


def make_fused_substep(spacing, scheme: CompactScheme, d2: CompactScheme, *, interpret: bool = False):
    """Build ``substep(f, u, q, dt, nu, a, b, last=False) -> (q', f') | None``.

    The returned callable decides support at trace time from the field's
    shape/dtype/backend and returns ``None`` when the fused path does not
    apply — the model then runs its generic rhs/step form. ``q=None``
    encodes the first substep (a == 0); ``last=True`` the final one, where
    q' is dead — the mega kernel then skips its HBM write and returns
    ``(None, f')`` (the stepwise fallback still returns a real q').
    """
    if scheme.derivative_order != 1:
        raise ValueError(
            f"scheme {scheme.name!r} must be a first-derivative scheme"
        )
    if d2.derivative_order != 2:
        raise ValueError(
            f"d2 scheme {d2.name!r} must be a derivative_order=2 scheme"
        )
    dz, dy, dx = (
        (spacing, spacing, spacing)
        if isinstance(spacing, (int, float))
        else spacing
    )

    def substep(f, u, q, dt, nu, a, b, last=False):
        if not interpret and jax.default_backend() != "tpu":
            return None
        if not fused_substep_supported(f.shape, f.dtype, scheme, d2):
            return None
        from .pallas_lap import lap_rhs
        from .pallas_leading import leading_derivative, rk3_solve_update
        from .pallas_megastep import rk3_mega, rk3_mega_supported
        from .pallas_pair import advection_pair

        from .pallas_lap import adv_lap_rhs, adv_lap_supported

        ux, uy, uz = u
        nz, ny, nx = f.shape
        if adv_lap_supported(scheme, d2, nz, ny, nx, f.dtype):
            # merged first dispatch: axy AND r from one streaming pass
            # (5 HBM passes instead of 6) — with the mega kernel the
            # substep is TWO dispatches / 12 passes
            axy, r = adv_lap_rhs(
                f, ux, uy, dz, dy, dx, scheme, d2, interpret=interpret
            )
        else:
            axy = advection_pair(f, ux, uy, dy, dx, scheme, interpret=interpret)
            r = lap_rhs(f, dz, dy, dx, d2, interpret=interpret)
        if rk3_mega_supported(scheme, d2, f.shape, f.dtype, has_q=q is not None):
            # one dispatch for dfdz + Laplacian solve + RK update: the
            # whole substep is 3 dispatches / 13 HBM passes
            # on the last substep q' is dead: its HBM write is elided
            # (write_q=False) and the substep returns (None, f')
            return rk3_mega(
                f, r, axy, uz, q, scheme, d2, dz,
                a=a, b=b, dt=dt, nu=nu, write_q=not last,
                interpret=interpret,
            )
        adv = leading_derivative(
            f, dz, scheme, mul=uz, acc=axy, interpret=interpret
        )
        return rk3_solve_update(
            r, adv, q, f, d2, a=a, b=b, dt=dt, nu=nu, interpret=interpret
        )

    return substep


def make_fused_substep_vec(
    spacing, scheme: CompactScheme, d2: CompactScheme, *, interpret: bool = False
):
    """Build ``substep_vec(u, q, dt, nu, a, b, last=False) -> (q', u') | None``
    — one momentum stage for ALL THREE components of a velocity system
    (Burgers / Navier-Stokes): the 3-component merged head
    (ops/pallas_lap.adv_lap_rhs3 — u0/u1/u2 each read ONCE) plus three
    mega-kernel tails. FOUR dispatches and 27 HBM passes per stage, vs six
    dispatches / 31 passes for three scalar fused substeps. ``q`` is a
    3-tuple of RK states or None (first substep); ``last=True`` elides the
    dead q' writes and returns ``(None, u')``.
    """
    if scheme.derivative_order != 1 or d2.derivative_order != 2:
        raise ValueError("need a d1 scheme and a d2 scheme")
    dz, dy, dx = (
        (spacing, spacing, spacing)
        if isinstance(spacing, (int, float))
        else spacing
    )

    def substep_vec(u, q, dt, nu, a, b, last=False):
        if not interpret and jax.default_backend() != "tpu":
            return None
        u0 = u[0]
        if not fused_substep_supported(u0.shape, u0.dtype, scheme, d2):
            return None
        from .pallas_lap import adv_lap3_supported, adv_lap_rhs3
        from .pallas_megastep import rk3_mega, rk3_mega_supported

        nz, ny, nx = u0.shape
        if not adv_lap3_supported(scheme, d2, nz, ny, nx, u0.dtype):
            return None
        if not rk3_mega_supported(
            scheme, d2, u0.shape, u0.dtype, has_q=q is not None
        ):
            return None
        axys, rs = adv_lap_rhs3(u, dz, dy, dx, scheme, d2, interpret=interpret)
        qs, us = [], []
        for i in range(3):
            qi, ui = rk3_mega(
                u[i],
                rs[i],
                axys[i],
                u[2],
                q[i] if q is not None else None,
                scheme,
                d2,
                dz,
                a=a,
                b=b,
                dt=dt,
                nu=nu,
                write_q=not last,
                interpret=interpret,
            )
            qs.append(qi)
            us.append(ui)
        return (None if last else tuple(qs)), tuple(us)

    return substep_vec
