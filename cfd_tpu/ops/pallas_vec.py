"""Fused vector-calculus streaming kernels: divergence and curl.

The four-pass Laplacian's change of variables (ops/pallas_lap.py)
generalizes to any "sum of per-axis compact derivatives" — in particular
the two vector-calculus reductions a CFD code evaluates constantly:

divergence  (``div_rhs`` + one leading solve; 6 HBM passes, 2 dispatches):
    with T_z / B_z the z-direction LHS/RHS operators of the d1 scheme, the
    solution of   T_z y = B_z uz + T_z s,   s = d1x(ux) + d1y(uy)
    is  y = d1z uz + s  =  div(u).  Dispatch A (this module) streams slabs
    of ux, uy, uz over z and emits  r = B_z uz + T_z s  (3 reads, 1 write);
    dispatch B is ops/pallas_leading.leading_solve (read r, write div).
    The unfused form costs ~10 passes: dfdx(ux) + dfdy(uy) + dfdz(uz)
    (2 each) plus the 4-pass elementwise sum.

curl  (``curl_rhs`` + two leading solves; 10 HBM passes, 3 dispatches):
    wz = d1x uy - d1y ux  is z-LOCAL — computed on the arriving slab and
    emitted directly.  The other two components each mix one z-local and
    one z-coupled term, so each gets its own change of variables:
        T_z rAy = T_z(d1y uz) - B_z uy   =>  y = d1y uz - d1z uy = wx
        T_z rBy = B_z ux - T_z(d1x uz)   =>  y = d1z ux - d1x uz = wy
    Dispatch A streams ux, uy, uz and emits (wz, rA, rB) — 3 reads,
    3 writes; dispatches B/C are leading solves (2 passes each).  The
    unfused curl costs ~20 passes (6 derivative ops at 2 passes each —
    the pair kernel saves one — plus the 9-pass elementwise combine).

Kernel structure (shared with lap_rhs): z walks in slabs of ``Sz`` planes
(``dimension_semantics='arbitrary'``); arriving-slab BlockSpecs load slab
``(i - 1) % nbz`` (the wrap feeds the rings the cyclic sequence, no ghost
inputs); VMEM rings of three slabs hold whatever the lagged emit needs —
here the xy-fold results (s-rings, computed ONCE per arriving plane with
the pair kernels' block bodies, bit-identical tables) and the raw fields
under B_z.  Output slab j = i - 2 emits once its z-neighbours are
resident; the T_z / B_z combinations are cheap broadcast-FMAs against
float64-precomputed SMEM coefficient tables.

PERIODIC d1 SCHEMES ONLY — same reasoning as lap_rhs (the change of
variables needs the wrapped interior stencil row-uniform; non-periodic
fields keep the unfused route, whose closures are exact).

Reference lineage: the reference evaluates divergence/curl-shaped
aggregates as repeated dfdx/dfdy/dfdz library calls plus host arithmetic
(/root/reference/code/ocl/compact.py:26-61 drives one transpose+solve per
axis); fusing the cross-axis reduction into one streaming pass has no
reference analogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..schemes import CompactScheme
from .pallas_lane import (
    BLOCK_LANES,
    FOLD_MAX,
    _fold_tables,
    _lane_tables,
    d_block_map,
    lane_fold_blocks,
    lane_roll_blocks,
)
from .pallas_lap import _z_tables
from .pallas_leading import leading_solve, leading_supported
from .pallas_pair import _d1_pair_tables, pair_supported
from .pallas_sublane import sublane_roll_blocks

__all__ = [
    "div_rhs",
    "div_rhs_supported",
    "divergence_fused",
    "div_fused_supported",
    "curl_rhs",
    "curl_rhs_supported",
    "curl_fused",
    "curl_fused_supported",
]

# VMEM slab-equivalents resident per kernel (rings + double-buffered
# streams + fold temporaries), and the budget they must fit.
_DIV_SLABS = 17  # rings s+uz (6) + 3 in x2 + 1 out x2 + ~3 temps
_CURL_SLABS = 28  # rings sA+sB+ux+uy (12) + 3 in x2 + 3 out x2 + ~4 temps
_VMEM_DIV = 14 * 1024 * 1024
_VMEM_CURL = 15 * 1024 * 1024


def _pick_sz(nz: int, ny: int, nx: int, W: int, slabs: int, budget: int) -> int:
    """Largest slab depth Sz with nz % Sz == 0, W <= Sz, and the resident
    set under the VMEM budget. 0 if none fits."""
    for sz in (8, 4, 2, 1):
        if nz % sz or sz < W:
            continue
        if slabs * sz * ny * nx * 4 <= budget:
            return sz
    return 0


def _vec_supported(
    scheme: CompactScheme, nz, ny, nx, dtype, slabs, budget
) -> bool:
    if scheme.derivative_order != 1 or not scheme.periodic:
        return False
    if dtype != jnp.float32:
        return False
    if not pair_supported(scheme, ny, nx, dtype):
        return False
    W = scheme.stencil_width
    if nz < max(scheme.min_points(), 2 * W + 1):
        return False
    return _pick_sz(nz, ny, nx, W, slabs, budget) > 0


def div_rhs_supported(scheme: CompactScheme, nz, ny, nx, dtype) -> bool:
    """Whether the streaming divergence-RHS kernel applies."""
    return _vec_supported(scheme, nz, ny, nx, dtype, _DIV_SLABS, _VMEM_DIV)


def curl_rhs_supported(scheme: CompactScheme, nz, ny, nx, dtype) -> bool:
    """Whether the streaming curl-RHS kernel applies."""
    return _vec_supported(scheme, nz, ny, nx, dtype, _CURL_SLABS, _VMEM_CURL)


def div_fused_supported(scheme: CompactScheme, nz, ny, nx, dtype) -> bool:
    """div_rhs + the leading z-solve that completes the divergence."""
    return div_rhs_supported(scheme, nz, ny, nx, dtype) and leading_supported(
        scheme, nz, dtype
    )


def curl_fused_supported(scheme: CompactScheme, nz, ny, nx, dtype) -> bool:
    """curl_rhs + the two leading z-solves that complete wx and wy."""
    return curl_rhs_supported(scheme, nz, ny, nx, dtype) and leading_supported(
        scheme, nz, dtype
    )


def _x_blocks(f2d, xt_ref, xd_ref, xe_ref, *, nx, x_fold, x_meta, scheme, cdt):
    """d1-along-lanes blocks of a resident (M, nx) tile (fold or roll form
    per x_meta — the pair kernels' x half)."""
    if x_fold:
        edges_meta, d_nonzero, d_blocks = x_meta
        return lane_fold_blocks(
            f2d,
            xt_ref,
            xd_ref,
            xe_ref,
            nb=nx // BLOCK_LANES,
            edges_meta=edges_meta,
            d_nonzero=d_nonzero,
            compute_dtype=cdt,
            d_blocks=d_blocks,
        )
    closure_taps, closure_blocks, d_nonzero, wfold, d_blocks = x_meta
    return lane_roll_blocks(
        f2d,
        xt_ref,
        xd_ref,
        xe_ref,
        n=nx,
        nb=nx // BLOCK_LANES,
        scheme=scheme,
        closure_taps=closure_taps,
        closure_blocks=closure_blocks,
        d_nonzero=d_nonzero,
        wfold=wfold,
        compute_dtype=cdt,
        d_blocks=d_blocks,
    )


def _y_blocks(plane, yt_ref, yd_ref, yq_ref, *, ny, y_meta, scheme, cdt):
    """d1-along-sublanes blocks of a resident (ny, nx) plane (roll form —
    the pair kernels' y half)."""
    closure_taps, closure_blocks, d_nonzero, wfold, d_blocks = y_meta
    return sublane_roll_blocks(
        plane,
        yt_ref,
        yd_ref,
        yq_ref,
        n=ny,
        nb=ny // BLOCK_LANES,
        scheme=scheme,
        closure_taps=closure_taps,
        closure_blocks=closure_blocks,
        d_nonzero=d_nonzero,
        wfold=wfold,
        compute_dtype=cdt,
        d_blocks=d_blocks,
    )


def _div_kernel(
    ux_ref,
    uy_ref,
    uz_ref,
    xt_ref,
    xd_ref,
    xe_ref,
    yt_ref,
    yd_ref,
    yq_ref,
    bt_ref,
    tt_ref,
    out_ref,
    ring_s,
    ring_z,
    *,
    nbz: int,
    sz: int,
    ny: int,
    nx: int,
    W: int,
    x_fold: bool,
    x_meta,
    y_meta,
    scheme: CompactScheme,
    cdt,
):
    m = BLOCK_LANES
    i = pl.program_id(0)
    slot = i % 3

    # ---- push uz raw; fold the arriving ux/uy slab into the s ring --------
    ring_z[pl.ds(slot * sz, sz)] = uz_ref[...]
    X = (
        ux_ref[0]
        if sz == 1
        else jnp.concatenate([ux_ref[q] for q in range(sz)], axis=0)
    )
    xb = _x_blocks(
        X, xt_ref, xd_ref, xe_ref,
        nx=nx, x_fold=x_fold, x_meta=x_meta, scheme=scheme, cdt=cdt,
    )
    for q in range(sz):
        for b in range(nx // m):
            sl = slice(m * b, m * (b + 1))
            ring_s[pl.ds(slot * sz + q, 1), :, sl] = xb[b][
                q * ny : (q + 1) * ny
            ][None]
        yb = _y_blocks(
            uy_ref[q], yt_ref, yd_ref, yq_ref,
            ny=ny, y_meta=y_meta, scheme=scheme, cdt=cdt,
        )
        for b in range(ny // m):
            sl = slice(m * b, m * (b + 1))
            ring_s[pl.ds(slot * sz + q, 1), sl, :] = (
                ring_s[pl.ds(slot * sz + q, 1), sl, :] + yb[b][None]
            )

    # ---- emit r slab j = i - 2: r = B_z uz + T_z s -------------------------
    jp = jnp.clip(i - 2, 0, nbz - 1)

    def plane(ring, q, k):
        d, loc = divmod(q + k, sz)
        return ring[pl.ds(((i + d + 2) % 3) * sz + loc, 1)][0]

    for q in range(sz):
        p = jp * sz + q
        acc = None
        for k in (-1, 0, 1):
            t = tt_ref[p, k + 1] * plane(ring_s, q, k)
            acc = t if acc is None else acc + t
        for k in range(-W, W + 1):
            acc = acc + bt_ref[p, k + W] * plane(ring_z, q, k)
        out_ref[q] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scheme", "nz", "ny", "nx", "x_fold", "interpret"),
)
def _call_div_rhs(
    ux, uy, uz, d1_tabs, bt, tt, *, scheme, nz, ny, nx, x_fold, interpret
):
    x_meta, y_meta = _vec_meta(scheme, ny, nx, x_fold)
    W = scheme.stencil_width
    sz = _pick_sz(nz, ny, nx, W, _DIV_SLABS, _VMEM_DIV)
    nbz = nz // sz
    kernel = functools.partial(
        _div_kernel,
        nbz=nbz,
        sz=sz,
        ny=ny,
        nx=nx,
        W=W,
        x_fold=x_fold,
        x_meta=x_meta,
        y_meta=y_meta,
        scheme=scheme,
        cdt=jnp.float32,
    )
    arrive = pl.BlockSpec(
        (sz, ny, nx), lambda i: ((i - 1) % nbz, 0, 0), memory_space=pltpu.VMEM
    )
    lagged = pl.BlockSpec(
        (sz, ny, nx),
        lambda i: (jnp.clip(i - 2, 0, nbz - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    smem = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), ux.dtype),
        grid=(nbz + 2,),
        in_specs=[arrive, arrive, arrive]
        + [whole(t) for t in d1_tabs]
        + [smem(bt), smem(tt)],
        out_specs=lagged,
        scratch_shapes=[
            pltpu.VMEM((3 * sz, ny, nx), jnp.float32),
            pltpu.VMEM((3 * sz, ny, nx), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=20 * nz * ny * nx,
            bytes_accessed=4 * nz * ny * nx * ux.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(ux, uy, uz, *d1_tabs, bt, tt)


def _vec_meta(scheme, ny, nx, x_fold):
    """(x_meta, y_meta) — the pair kernels' static fold/roll metadata."""
    if x_fold:
        _, _, edges_meta = _fold_tables(scheme, nx)
        _, _, _, _, _, d_nonzero, _ = _lane_tables(scheme, nx)
        x_meta = (edges_meta, d_nonzero, d_block_map(scheme, nx))
    else:
        _, _, _, ct, cb, d_nonzero, wfold = _lane_tables(scheme, nx)
        x_meta = (ct, cb, d_nonzero, wfold, d_block_map(scheme, nx))
    _, _, _, cty, cby, d_nonzero_y, wfold_y = _lane_tables(scheme, ny)
    y_meta = (cty, cby, d_nonzero_y, wfold_y, d_block_map(scheme, ny))
    return x_meta, y_meta


def div_rhs(
    ux: jax.Array,
    uy: jax.Array,
    uz: jax.Array,
    dz,
    dy,
    dx,
    scheme: CompactScheme,
    *,
    interpret: bool = False,
) -> jax.Array:
    """``B_z uz / dz + T_z (d1x ux + d1y uy)`` of (nz, ny, nx) fields.

    Three HBM reads, one write. Solving the result along z with the
    scheme's LHS (ops/pallas_leading.leading_solve) yields div(u).
    ``scheme`` must be a periodic d1 scheme passing ``div_rhs_supported``.
    """
    _check_vec_args("div_rhs", (ux, uy, uz), scheme, div_rhs_supported)
    nz, ny, nx = ux.shape
    x_fold = nx <= FOLD_MAX
    d1_tabs = _d1_pair_tables(scheme, ny, nx, dy, dx, x_fold)
    btab, ttab = _z_tables(scheme, nz)
    inv_dz = jnp.asarray(1.0, jnp.float32) / jnp.asarray(dz, jnp.float32)
    bt = jnp.asarray(btab) * inv_dz
    tt = jnp.asarray(ttab)
    cdt = jnp.float32
    return _call_div_rhs(
        ux.astype(cdt),
        uy.astype(cdt),
        uz.astype(cdt),
        d1_tabs,
        bt,
        tt,
        scheme=scheme,
        nz=nz,
        ny=ny,
        nx=nx,
        x_fold=x_fold,
        interpret=interpret,
    ).astype(ux.dtype)


def divergence_fused(
    u,
    dz,
    dy,
    dx,
    scheme: CompactScheme,
    *,
    interpret: bool = False,
) -> jax.Array:
    """div(u) in two dispatches / 6 HBM passes (periodic d1 schemes).

    ``u = (ux, uy, uz)``; requires ``div_fused_supported``.
    """
    ux, uy, uz = u
    r = div_rhs(ux, uy, uz, dz, dy, dx, scheme, interpret=interpret)
    return leading_solve(r, scheme, interpret=interpret)


def _check_vec_args(name, fields, scheme, supported):
    shapes = {f.shape for f in fields}
    if len(shapes) != 1 or fields[0].ndim != 3:
        raise ValueError(
            f"{name} needs three equal-shape (nz, ny, nx) fields, got "
            f"{[f.shape for f in fields]}"
        )
    nz, ny, nx = fields[0].shape
    if not supported(scheme, nz, ny, nx, fields[0].dtype):
        raise ValueError(
            f"{name} unsupported for shape {fields[0].shape} dtype "
            f"{fields[0].dtype} scheme {scheme.name}"
        )


# ---------------------------------------------------------------------------
# curl
# ---------------------------------------------------------------------------


def _curl_kernel(
    ux_ref,
    uy_ref,
    uz_ref,
    xt_ref,
    xd_ref,
    xe_ref,
    yt_ref,
    yd_ref,
    yq_ref,
    bt_ref,
    tt_ref,
    wz_ref,
    ra_ref,
    rb_ref,
    ring_sa,
    ring_sb,
    ring_x,
    ring_y,
    *,
    nbz: int,
    sz: int,
    ny: int,
    nx: int,
    W: int,
    x_fold: bool,
    x_meta,
    y_meta,
    scheme: CompactScheme,
    cdt,
):
    m = BLOCK_LANES
    i = pl.program_id(0)
    slot = i % 3

    # ---- push the raw fields under B_z ------------------------------------
    ring_x[pl.ds(slot * sz, sz)] = ux_ref[...]
    ring_y[pl.ds(slot * sz, sz)] = uy_ref[...]

    # ---- arriving-slab folds -----------------------------------------------
    # wz = d1x uy - d1y ux (z-local: emitted on the arriving slab);
    # sA = d1y uz and sB = d1x uz feed the lagged T_z combinations.
    cat = lambda ref: (
        ref[0]
        if sz == 1
        else jnp.concatenate([ref[q] for q in range(sz)], axis=0)
    )
    xb_uy = _x_blocks(
        cat(uy_ref), xt_ref, xd_ref, xe_ref,
        nx=nx, x_fold=x_fold, x_meta=x_meta, scheme=scheme, cdt=cdt,
    )
    xb_uz = _x_blocks(
        cat(uz_ref), xt_ref, xd_ref, xe_ref,
        nx=nx, x_fold=x_fold, x_meta=x_meta, scheme=scheme, cdt=cdt,
    )
    for q in range(sz):
        for b in range(nx // m):
            sl = slice(m * b, m * (b + 1))
            wz_ref[q, :, sl] = xb_uy[b][q * ny : (q + 1) * ny].astype(
                wz_ref.dtype
            )
            ring_sb[pl.ds(slot * sz + q, 1), :, sl] = xb_uz[b][
                q * ny : (q + 1) * ny
            ][None]
        yb_ux = _y_blocks(
            ux_ref[q], yt_ref, yd_ref, yq_ref,
            ny=ny, y_meta=y_meta, scheme=scheme, cdt=cdt,
        )
        yb_uz = _y_blocks(
            uz_ref[q], yt_ref, yd_ref, yq_ref,
            ny=ny, y_meta=y_meta, scheme=scheme, cdt=cdt,
        )
        for b in range(ny // m):
            sl = slice(m * b, m * (b + 1))
            wz_ref[q, sl, :] = wz_ref[q, sl, :] - yb_ux[b].astype(
                wz_ref.dtype
            )
            ring_sa[pl.ds(slot * sz + q, 1), sl, :] = yb_uz[b][None]

    # ---- emit slabs j = i - 2: rA = T_z sA - B_z uy; rB = B_z ux - T_z sB --
    jp = jnp.clip(i - 2, 0, nbz - 1)

    def plane(ring, q, k):
        d, loc = divmod(q + k, sz)
        return ring[pl.ds(((i + d + 2) % 3) * sz + loc, 1)][0]

    for q in range(sz):
        p = jp * sz + q
        ra = None
        rb = None
        for k in (-1, 0, 1):
            c = tt_ref[p, k + 1]
            ta = c * plane(ring_sa, q, k)
            tb = c * plane(ring_sb, q, k)
            ra = ta if ra is None else ra + ta
            rb = tb if rb is None else rb + tb
        rb = -rb
        for k in range(-W, W + 1):
            c = bt_ref[p, k + W]
            ra = ra - c * plane(ring_y, q, k)
            rb = rb + c * plane(ring_x, q, k)
        ra_ref[q] = ra.astype(ra_ref.dtype)
        rb_ref[q] = rb.astype(rb_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scheme", "nz", "ny", "nx", "x_fold", "interpret"),
)
def _call_curl_rhs(
    ux, uy, uz, d1_tabs, bt, tt, *, scheme, nz, ny, nx, x_fold, interpret
):
    x_meta, y_meta = _vec_meta(scheme, ny, nx, x_fold)
    W = scheme.stencil_width
    sz = _pick_sz(nz, ny, nx, W, _CURL_SLABS, _VMEM_CURL)
    nbz = nz // sz
    kernel = functools.partial(
        _curl_kernel,
        nbz=nbz,
        sz=sz,
        ny=ny,
        nx=nx,
        W=W,
        x_fold=x_fold,
        x_meta=x_meta,
        y_meta=y_meta,
        scheme=scheme,
        cdt=jnp.float32,
    )
    arrive = pl.BlockSpec(
        (sz, ny, nx), lambda i: ((i - 1) % nbz, 0, 0), memory_space=pltpu.VMEM
    )
    lagged = pl.BlockSpec(
        (sz, ny, nx),
        lambda i: (jnp.clip(i - 2, 0, nbz - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    smem = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nz, ny, nx), ux.dtype) for _ in range(3)
        ),
        grid=(nbz + 2,),
        in_specs=[arrive, arrive, arrive]
        + [whole(t) for t in d1_tabs]
        + [smem(bt), smem(tt)],
        # wz rides the arriving slab (pipeline-fill recomputes of wrapped
        # slabs are <2% extra traffic, as in adv_lap_rhs); rA/rB lag 2 slabs
        out_specs=(arrive, lagged, lagged),
        scratch_shapes=[
            pltpu.VMEM((3 * sz, ny, nx), jnp.float32) for _ in range(4)
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * nz * ny * nx,
            bytes_accessed=6 * nz * ny * nx * ux.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(ux, uy, uz, *d1_tabs, bt, tt)


def curl_rhs(
    ux: jax.Array,
    uy: jax.Array,
    uz: jax.Array,
    dz,
    dy,
    dx,
    scheme: CompactScheme,
    *,
    interpret: bool = False,
):
    """``(wz, rA, rB)`` of (nz, ny, nx) fields in one streaming pass.

    wz = d1x uy - d1y ux is the curl's z-component, final. Solving rA
    (resp. rB) along z with the scheme's LHS yields wx = d1y uz - d1z uy
    (resp. wy = d1z ux - d1x uz). Three HBM reads, three writes.
    ``scheme`` must be a periodic d1 scheme passing ``curl_rhs_supported``.
    """
    _check_vec_args("curl_rhs", (ux, uy, uz), scheme, curl_rhs_supported)
    nz, ny, nx = ux.shape
    x_fold = nx <= FOLD_MAX
    d1_tabs = _d1_pair_tables(scheme, ny, nx, dy, dx, x_fold)
    btab, ttab = _z_tables(scheme, nz)
    inv_dz = jnp.asarray(1.0, jnp.float32) / jnp.asarray(dz, jnp.float32)
    bt = jnp.asarray(btab) * inv_dz
    tt = jnp.asarray(ttab)
    cdt = jnp.float32
    wz, ra, rb = _call_curl_rhs(
        ux.astype(cdt),
        uy.astype(cdt),
        uz.astype(cdt),
        d1_tabs,
        bt,
        tt,
        scheme=scheme,
        nz=nz,
        ny=ny,
        nx=nx,
        x_fold=x_fold,
        interpret=interpret,
    )
    return wz.astype(ux.dtype), ra.astype(ux.dtype), rb.astype(ux.dtype)


def curl_fused(
    u,
    dz,
    dy,
    dx,
    scheme: CompactScheme,
    *,
    interpret: bool = False,
):
    """curl(u) in three dispatches / 10 HBM passes (periodic d1 schemes).

    ``u = (ux, uy, uz)``; returns (wx, wy, wz) matching
    ops.derivatives.curl. Requires ``curl_fused_supported``.
    """
    ux, uy, uz = u
    wz, ra, rb = curl_rhs(ux, uy, uz, dz, dy, dx, scheme, interpret=interpret)
    wx = leading_solve(ra, scheme, interpret=interpret)
    wy = leading_solve(rb, scheme, interpret=interpret)
    return wx, wy, wz
