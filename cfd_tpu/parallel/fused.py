"""Distributed fused RK3 substep.

The single-device fused substep (ops/fused_step.py) is TWO dispatches and
12 HBM passes; its kernels assume whole lines in every direction. On a
('z': 1, py, px) mesh the z direction IS whole on every shard, so the
expensive tail of the substep — the d1z + Laplacian-solve + RK-update mega
kernel (ops/pallas_megastep.py) — runs shard-locally unchanged. The xy
head runs through the round-4 distributed kernel suite:

  fx, d2x   — shard-local lane kernels (roll / fold forms) with halo lanes
              and the fused outer interface update (ops/pallas_dist.py);
              whole-axis shards take the single-device kernels directly
  fy, d2y   — sublane forms, same structure
  axy, r    — XLA elementwise: ``axy = ux fx + uy fy`` and the Laplacian
              RHS change of variables ``r = B_z f + T_z (d2x + d2y)``
              (cyclic z-stencils — z is whole and the d2 scheme periodic,
              the same constraint the single-device lap_rhs carries)
  q', f'    — the mega kernel, shard-local

On z-SHARDED meshes (round 5 — e.g. the reference's canonical 2x2x2
topology, ref-results/256-8.txt) the mega kernel's whole-z assumption
fails, so the tail runs the distributed leading form instead
(ops/pallas_leading.py::leading_dist_derivative — halo rows in, the outer
rank-2 interface update fused into the backward sweep): fz and d2z are
two shard-local dispatches, and the Williamson update
``q' = a q + dt (nu lap - adv); f' = f + b q'`` is one XLA elementwise
fusion. Still ONE traced program per substep with six face all_gathers —
vs the generic path's six separate collective-bearing derivative calls
plus a nine-array elementwise pass.

One traced program per substep; the only collectives are the face
all_gathers (2 planes each) of the sharded-axis solves. The generic
distributed step this replaces ran ~6 separate collective-bearing
derivative ops plus a nine-array XLA elementwise pass per substep.

The reference has no fused distributed step at all — its multi-GPU harness
times repeated bare dfdx calls (/root/reference/perf-test/multi-GPU/PyCUDA/
run.py:47-58); this is the production shape those calls approximate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..schemes import CompactScheme
from .compact import (
    DistributedCompactSolver,
    _dist_leading_pallas,
    _dist_minor_pallas,
)
from .mesh import AXIS_NAMES

__all__ = ["make_fused_substep_distributed", "make_gradient_distributed"]


def _axis_tables(scheme: CompactScheme, n: int, p: int, order: int):
    """(skt, names) for one sharded minor axis (roll form for d1, fold
    otherwise)."""
    from .dist_tables import shard_lane_fold_tables, shard_lane_tables

    skt = (
        shard_lane_tables(scheme, n, p)
        if order == 1
        else shard_lane_fold_tables(scheme, n, p)
    )
    return skt, type(skt).FIELDS


def _minor_supported(scheme, n, p, dtype):
    from ..ops.pallas_dist import lane_dist_supported

    return p == 1 or lane_dist_supported(scheme, n // p, dtype)


def make_fused_substep_distributed(
    solver: DistributedCompactSolver,
    d2_solver: DistributedCompactSolver,
    *,
    interpret: bool = False,
):
    """Build ``substep(f, u, q, dt, nu, a, b, last=False) -> (q', f') | None``
    over the solvers' grid — the distributed counterpart of
    ops/fused_step.make_fused_substep. z-whole meshes run the mega-kernel
    tail; z-sharded meshes run the distributed-leading tail (two extra
    dispatches). Returns ``None`` at trace time when the fused path does
    not apply (non-periodic schemes, unsupported local shapes, non-f32);
    the model then runs its generic distributed step.
    """
    grid = solver.grid
    scheme = grid.scheme
    d2 = d2_solver.grid.scheme
    if scheme.derivative_order != 1 or d2.derivative_order != 2:
        raise ValueError("need a d1 scheme solver and a d2 scheme solver")
    dz, dy, dx = grid.spacing
    pz, py, px = grid.proc_shape
    nz, ny, nx = grid.shape
    mesh = grid.mesh
    spec = grid.spec()

    def substep(f, u, q, dt, nu, a, b, last=False):
        from ..ops.pallas_megastep import rk3_mega, rk3_mega_supported

        if not d2.periodic or not scheme.periodic:
            return None
        if f.dtype != jnp.float32:
            return None
        z_whole = pz == 1
        local = (nz // pz, ny // py, nx // px)
        if not (
            _minor_supported(scheme, nx, px, f.dtype)
            and _minor_supported(scheme, ny, py, f.dtype)
            and _minor_supported(d2, nx, px, f.dtype)
            and _minor_supported(d2, ny, py, f.dtype)
        ):
            return None
        if z_whole:
            if not rk3_mega_supported(
                scheme, d2, local, f.dtype, has_q=q is not None
            ):
                return None
        else:
            # z sharded: tail runs the distributed leading form for both
            # schemes (fz + the d2z Laplacian contribution)
            from ..ops.pallas_leading import leading_dist_supported
            from .dist_tables import pick_nb

            if not (
                leading_dist_supported(scheme, nz // pz, f.dtype)
                and leading_dist_supported(d2, nz // pz, f.dtype)
                and pick_nb(nz // pz) >= 2
            ):
                return None
        if not interpret and jax.default_backend() not in ("tpu",):
            return None

        # stacked per-shard tables for each sharded axis; z groups (leading
        # form, indices 4 and 5) only exist on z-sharded meshes
        axes_wanted = [
            (2, nx, px, scheme),
            (1, ny, py, scheme),
            (2, nx, px, d2),
            (1, ny, py, d2),
        ]
        if not z_whole:
            axes_wanted += [(0, nz, pz, scheme), (0, nz, pz, d2)]
        groups = []  # (axis3, skt, names, arrays) in a fixed order
        for axis3, n_ax, p_ax, sch in axes_wanted:
            if p_ax == 1:
                groups.append(None)
                continue
            if axis3 == 0:
                from .dist_tables import shard_kernel_tables

                skt = shard_kernel_tables(sch, n_ax, p_ax)
                names = type(skt).FIELDS
            else:
                skt, names = _axis_tables(
                    sch, n_ax, p_ax, sch.derivative_order
                )
            arrays = tuple(
                jnp.asarray(getattr(skt, nm), jnp.float32) for nm in names
            )
            groups.append((axis3, skt, names, arrays))

        flat_tabs, tab_specs, slices = [], [], []
        for g in groups:
            if g is None:
                slices.append(None)
                continue
            axis3, skt, names, arrays = g
            start = len(flat_tabs)
            flat_tabs.extend(arrays)
            tab_specs.extend(P(AXIS_NAMES[axis3]) for _ in arrays)
            slices.append((axis3, skt, names, start, len(arrays)))

        has_q = q is not None

        def axis_deriv(fl, idx, sch, d_ax, tabs):
            """fx / d2x (idx 0/2) or fy / d2y (idx 1/3) of the local block."""
            sl = slices[idx]
            if sl is None:  # whole axis on this shard: single-device kernel
                from ..ops.derivatives import derivative

                axis3 = 2 if idx in (0, 2) else 1
                method = "pallas" if jax.default_backend() == "tpu" else "pcr"
                return derivative(fl, d_ax, sch, axis=axis3 - 3, method=method)
            axis3, skt, names, start, count = sl
            named = dict(zip(names, tabs[start : start + count]))
            return _dist_minor_pallas(
                fl,
                axis3,
                named,
                skt,
                scheme=sch,
                axis_name=AXIS_NAMES[axis3],
                p=px if axis3 == 2 else py,
                inv_dx=1.0 / d_ax,
                interpret=interpret,
            )

        def axis_deriv_z(fl, idx, sch, tabs):
            """fz / d2z via the distributed leading kernel (z sharded)."""
            axis3, skt, names, start, count = slices[idx]
            named = dict(zip(names, tabs[start : start + count]))
            return _dist_leading_pallas(
                fl,
                named,
                skt,
                scheme=sch,
                axis_name=AXIS_NAMES[0],
                p=pz,
                inv_dx=1.0 / dz,
                interpret=interpret,
            )

        def body(fl, uxl, uyl, uzl, ql, *tabs):
            fx = axis_deriv(fl, 0, scheme, dx, tabs)
            fy = axis_deriv(fl, 1, scheme, dy, tabs)
            d2x_ = axis_deriv(fl, 2, d2, dx, tabs)
            d2y_ = axis_deriv(fl, 3, d2, dy, tabs)
            if not z_whole:
                # z sharded: two distributed leading dispatches finish the
                # derivative set; the Williamson update is one XLA fusion
                fz = axis_deriv_z(fl, 4, scheme, tabs)
                d2z_ = axis_deriv_z(fl, 5, d2, tabs)
                adv = uxl * fx + uyl * fy + uzl * fz
                lap = d2x_ + d2y_ + d2z_
                qn = dt * (nu * lap - adv)
                if has_q:
                    qn = a * ql + qn
                fn = fl + b * qn
                return qn, fn
            axy = uxl * fx + uyl * fy
            acc = d2x_ + d2y_
            # r = B_z f + T_z acc: cyclic z-stencils (z whole, d2 periodic);
            # the mega kernel then solves T_z y = r so y = lap (the same
            # change of variables as ops/pallas_lap.lap_rhs)
            inv_dz2 = jnp.asarray(1.0 / (dz * dz), fl.dtype)
            rz = jnp.zeros_like(fl)
            for k, wk in zip(d2.rhs_offsets, d2.rhs_weights):
                rz = rz + wk * (
                    jnp.roll(fl, -k, axis=0) + jnp.roll(fl, k, axis=0)
                )
            if d2.rhs_center:
                rz = rz + d2.rhs_center * fl
            alpha2 = jnp.asarray(d2.alpha, fl.dtype)
            r = rz * inv_dz2 + acc + alpha2 * (
                jnp.roll(acc, -1, axis=0) + jnp.roll(acc, 1, axis=0)
            )
            qn, fn = rk3_mega(
                fl,
                r,
                axy,
                uzl,
                ql if has_q else None,
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
            if qn is None:  # write_q=False on the last substep
                qn = jnp.zeros_like(fn)
            return qn, fn

        ux, uy, uz = u
        q_in = q if has_q else f  # placeholder, unread when has_q=False
        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(spec,) * 5 + tuple(tab_specs),
            out_specs=(spec, spec),
            check_vma=False,
        )
        qn, fnew = fn(f, ux, uy, uz, q_in, *flat_tabs)
        return (None if last else qn), fnew

    return substep


def make_gradient_distributed(solver: DistributedCompactSolver):
    """Fused distributed gradient: on meshes where BOTH minor axes are
    whole (z-pencil meshes, pz >= 1, py == px == 1), dfdx+dfdy come from
    the single-device pair kernel (one HBM read for two outputs,
    ops/pallas_pair.py) run shard-locally, with dfdz through the solver.
    Other meshes fall back to three solver calls."""
    grid = solver.grid
    scheme = grid.scheme
    pz, py, px = grid.proc_shape
    dz, dy, dx = grid.spacing
    mesh = grid.mesh
    spec = grid.spec()

    def gradient(f):
        from ..ops.pallas_pair import gradient_pair, pair_supported

        nz, ny, nx = grid.shape
        if (
            py == 1
            and px == 1
            and f.dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and pair_supported(scheme, ny, nx, f.dtype)
        ):
            fn = shard_map(
                lambda fl: gradient_pair(fl, dy, dx, scheme),
                mesh=mesh,
                in_specs=(spec,),
                out_specs=(spec, spec),
                check_vma=False,
            )
            fx, fy = fn(f)
            return fx, fy, solver.dfdz(f)
        return solver.dfdx(f), solver.dfdy(f), solver.dfdz(f)

    return gradient
