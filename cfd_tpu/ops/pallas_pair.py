"""Fused two-axis Pallas kernel: dfdx AND dfdy from ONE read of f.

The gradient pipeline (BASELINE.json config 5: "fused grad/div/curl")
evaluates several derivatives of the *same* field. Run separately, dfdx
and dfdy each read all of f from HBM — 2 reads + 2 writes. This kernel
loads each (ny, nx) plane once and applies both substructured solves to
the resident tile:

    x-derivative: lines along lanes   -> ops/pallas_lane.py block bodies
    y-derivative: lines along sublanes -> ops/pallas_sublane.py block body

for 1 read + 2 writes — 3/4 of the separate-op HBM traffic, with the MXU
work (2 x K=128 block dots per point) still largely hidden behind the DMA.
The z-derivative cannot join the fusion at practical sizes: a block that
is full in z, y *and* x is the whole array (VMEM is 16 MB; 256^3 f32 is
64 MB), so ``gradient`` pairs (x, y) and runs z separately.

Forms follow the single-axis kernels' measured defaults: the x-part uses
the fold form for nx <= FOLD_MAX (rolls are expensive lane rotates), the
roll form beyond; the y-part always uses the roll form (sublane rolls are
cheap shuffles and the sublane fold measured slower for first
derivatives). First derivatives only — the pair fusion exists for the
gradient/curl pipelines.

Tables are the same float64-precomputed substructuring tables as the
single kernels; block bodies are imported from them, so accuracy is
bit-identical to the unfused ops.

``d2_pair_sum`` (round 3) extends the fusion to second derivatives for
the Laplacian pipeline: both axes run the table-generic *fold* form and
the kernel writes the SUM d2x+d2y — 1 read + 1 write where separate
d2fdx2 + d2fdy2 + add costs 2 reads + 2 writes + an add pass. The
Laplacian then needs only one more op (d2fdz2) instead of three.
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
    lane_supported,
)
from .pallas_sublane import (
    sublane_fold_blocks,
    sublane_roll_blocks,
    sublane_supported,
)

__all__ = [
    "gradient_pair",
    "pair_supported",
    "pair_subtract",
    "pair_sub_supported",
    "d2_pair_sum",
    "d2_sum_supported",
    "advection_pair",
    "adv_pair_supported",
]

# VMEM budget: ~11 resident tiles (in x2 double-buffered, 2 outs x2,
# ~5 temporaries) must fit in ~12 MB -> tile cap 512x512 f32.
_MAX_TILE = 512 * 512
# the subtract variant streams two extra accumuland planes (ax, ay x2
# double-buffered): ~15 resident tiles -> smaller cap
_MAX_TILE_SUB = 256 * 512


def pair_supported(scheme: CompactScheme, ny: int, nx: int, dtype) -> bool:
    """Whether the fused (dfdx, dfdy) kernel applies."""
    return (
        scheme.derivative_order == 1
        and lane_supported(scheme, nx, dtype)
        and sublane_supported(scheme, ny, dtype)
        and ny * nx <= _MAX_TILE
    )


def _d1_blocks(
    f,
    xt_ref,
    xd_ref,
    xe_ref,
    yt_ref,
    yd_ref,
    yq_ref,
    *,
    nx: int,
    ny: int,
    x_fold: bool,
    x_meta,
    y_meta,
    scheme: CompactScheme,
    compute_dtype,
):
    """Both-axis d1 block lists of a resident (ny, nx) tile — the shared
    body of the pair kernels (x: lane fold/roll, y: sublane roll)."""
    m = BLOCK_LANES
    if x_fold:
        edges_meta, d_nonzero, d_blocks = x_meta
        xblocks = lane_fold_blocks(
            f,
            xt_ref,
            xd_ref,
            xe_ref,
            nb=nx // m,
            edges_meta=edges_meta,
            d_nonzero=d_nonzero,
            compute_dtype=compute_dtype,
            d_blocks=d_blocks,
        )
    else:
        closure_taps, closure_blocks, d_nonzero, wfold, d_blocks = x_meta
        xblocks = lane_roll_blocks(
            f,
            xt_ref,
            xd_ref,
            xe_ref,
            n=nx,
            nb=nx // m,
            scheme=scheme,
            closure_taps=closure_taps,
            closure_blocks=closure_blocks,
            d_nonzero=d_nonzero,
            wfold=wfold,
            compute_dtype=compute_dtype,
            d_blocks=d_blocks,
        )

    closure_taps, closure_blocks, d_nonzero, wfold, d_blocks_y = y_meta
    yblocks = sublane_roll_blocks(
        f,
        yt_ref,
        yd_ref,
        yq_ref,
        n=ny,
        nb=ny // m,
        scheme=scheme,
        closure_taps=closure_taps,
        closure_blocks=closure_blocks,
        d_nonzero=d_nonzero,
        wfold=wfold,
        compute_dtype=compute_dtype,
        d_blocks=d_blocks_y,
    )
    return xblocks, yblocks


def _pair_kernel(
    f_ref,
    xt_ref,
    xd_ref,
    xe_ref,
    yt_ref,
    yd_ref,
    yq_ref,
    outx_ref,
    outy_ref,
    *,
    nx: int,
    ny: int,
    x_fold: bool,
    x_meta,
    y_meta,
    scheme: CompactScheme,
    compute_dtype,
):
    """One (1, ny, nx) plane -> dfdx and dfdy of the resident tile."""
    m = BLOCK_LANES
    xblocks, yblocks = _d1_blocks(
        f_ref[0],
        xt_ref,
        xd_ref,
        xe_ref,
        yt_ref,
        yd_ref,
        yq_ref,
        nx=nx,
        ny=ny,
        x_fold=x_fold,
        x_meta=x_meta,
        y_meta=y_meta,
        scheme=scheme,
        compute_dtype=compute_dtype,
    )
    for b in range(nx // m):
        outx_ref[0, :, m * b : m * (b + 1)] = xblocks[b].astype(outx_ref.dtype)
    for b in range(ny // m):
        outy_ref[0, m * b : m * (b + 1), :] = yblocks[b].astype(outy_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scheme", "ny", "nx", "x_fold", "interpret")
)
def _call_pair(f3, xt, xd, xe, yt, yd, yq, *, scheme, ny, nx, x_fold, interpret):
    B = f3.shape[0]
    if x_fold:
        _, _, edges_meta = _fold_tables(scheme, nx)
        _, _, _, _, _, d_nonzero, _ = _lane_tables(scheme, nx)
        x_meta = (edges_meta, d_nonzero, d_block_map(scheme, nx))
    else:
        _, _, _, ct, cb, d_nonzero, wfold = _lane_tables(scheme, nx)
        x_meta = (ct, cb, d_nonzero, wfold, d_block_map(scheme, nx))
    _, _, _, cty, cby, d_nonzero_y, wfold_y = _lane_tables(scheme, ny)
    y_meta = (cty, cby, d_nonzero_y, wfold_y, d_block_map(scheme, ny))
    kernel = functools.partial(
        _pair_kernel,
        nx=nx,
        ny=ny,
        x_fold=x_fold,
        x_meta=x_meta,
        y_meta=y_meta,
        scheme=scheme,
        compute_dtype=jnp.float32,
    )
    plane = lambda: pl.BlockSpec(
        (1, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    outx, outy = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, ny, nx), f3.dtype),
            jax.ShapeDtypeStruct((B, ny, nx), f3.dtype),
        ),
        grid=(B,),
        in_specs=[
            plane(),
            whole(xt),
            whole(xd),
            whole(xe),
            whole(yt),
            whole(yd),
            whole(yq),
        ],
        out_specs=(plane(), plane()),
        # memory-biased estimate (1 read + 2 writes); the K=128 dots hide
        # behind the DMA exactly as in the single-axis kernels
        cost_estimate=pl.CostEstimate(
            flops=16 * B * ny * nx,
            bytes_accessed=3 * B * ny * nx * f3.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(f3, xt, xd, xe, yt, yd, yq)
    return outx, outy


def gradient_pair(
    f: jax.Array,
    dy,
    dx,
    scheme: CompactScheme,
    *,
    interpret: bool = False,
):
    """(df/dx, df/dy) of ``f`` with shape (..., ny, nx), one HBM read of f.

    Requires ``pair_supported``; callers fall back to the single-axis ops
    otherwise.
    """
    if f.dtype == jnp.float64:
        raise ValueError(
            "the pair Pallas path supports float32/bfloat16 only; use "
            "method='pcr' for float64 runs"
        )
    ny, nx = f.shape[-2], f.shape[-1]
    if not pair_supported(scheme, ny, nx, f.dtype):
        raise ValueError(
            f"pair kernel unsupported for shape (..., {ny}, {nx}) "
            f"dtype {f.dtype} scheme {scheme.name}"
        )
    lead = f.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    f3 = f.reshape(B, ny, nx)
    x_fold = nx <= FOLD_MAX
    xt, xd, xe, yt, yd, yq = _d1_pair_tables(scheme, ny, nx, dy, dx, x_fold)
    outx, outy = _call_pair(
        f3, xt, xd, xe, yt, yd, yq,
        scheme=scheme, ny=ny, nx=nx, x_fold=x_fold, interpret=interpret,
    )
    return outx.reshape(f.shape), outy.reshape(f.shape)


def pair_sub_supported(scheme: CompactScheme, ny: int, nx: int, dtype) -> bool:
    """Whether the fused (ax - dfdx, ay - dfdy) kernel applies."""
    return (
        scheme.derivative_order == 1
        and lane_supported(scheme, nx, dtype)
        and sublane_supported(scheme, ny, dtype)
        and ny * nx <= _MAX_TILE_SUB
    )


def _pair_sub_kernel(
    f_ref,
    ax_ref,
    ay_ref,
    xt_ref,
    xd_ref,
    xe_ref,
    yt_ref,
    yd_ref,
    yq_ref,
    outx_ref,
    outy_ref,
    *,
    nx: int,
    ny: int,
    x_fold: bool,
    x_meta,
    y_meta,
    scheme: CompactScheme,
    compute_dtype,
):
    """One (1, ny, nx) plane -> (ax - dfdx f, ay - dfdy f)."""
    m = BLOCK_LANES
    xblocks, yblocks = _d1_blocks(
        f_ref[0],
        xt_ref,
        xd_ref,
        xe_ref,
        yt_ref,
        yd_ref,
        yq_ref,
        nx=nx,
        ny=ny,
        x_fold=x_fold,
        x_meta=x_meta,
        y_meta=y_meta,
        scheme=scheme,
        compute_dtype=compute_dtype,
    )
    for b in range(nx // m):
        sl = slice(m * b, m * (b + 1))
        outx_ref[0, :, sl] = (
            ax_ref[0, :, sl].astype(compute_dtype) - xblocks[b]
        ).astype(outx_ref.dtype)
    for b in range(ny // m):
        sl = slice(m * b, m * (b + 1))
        outy_ref[0, sl, :] = (
            ay_ref[0, sl, :].astype(compute_dtype) - yblocks[b]
        ).astype(outy_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scheme", "ny", "nx", "x_fold", "interpret")
)
def _call_pair_sub(
    f3, ax3, ay3, xt, xd, xe, yt, yd, yq, *, scheme, ny, nx, x_fold, interpret
):
    B = f3.shape[0]
    if x_fold:
        _, _, edges_meta = _fold_tables(scheme, nx)
        _, _, _, _, _, d_nonzero, _ = _lane_tables(scheme, nx)
        x_meta = (edges_meta, d_nonzero, d_block_map(scheme, nx))
    else:
        _, _, _, ct, cb, d_nonzero, wfold = _lane_tables(scheme, nx)
        x_meta = (ct, cb, d_nonzero, wfold, d_block_map(scheme, nx))
    _, _, _, cty, cby, d_nonzero_y, wfold_y = _lane_tables(scheme, ny)
    y_meta = (cty, cby, d_nonzero_y, wfold_y, d_block_map(scheme, ny))
    kernel = functools.partial(
        _pair_sub_kernel,
        nx=nx,
        ny=ny,
        x_fold=x_fold,
        x_meta=x_meta,
        y_meta=y_meta,
        scheme=scheme,
        compute_dtype=jnp.float32,
    )
    plane = lambda: pl.BlockSpec(
        (1, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, ny, nx), f3.dtype),
            jax.ShapeDtypeStruct((B, ny, nx), f3.dtype),
        ),
        grid=(B,),
        in_specs=[
            plane(),
            plane(),
            plane(),
            whole(xt),
            whole(xd),
            whole(xe),
            whole(yt),
            whole(yd),
            whole(yq),
        ],
        out_specs=(plane(), plane()),
        cost_estimate=pl.CostEstimate(
            flops=16 * B * ny * nx,
            bytes_accessed=5 * B * ny * nx * f3.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(f3, ax3, ay3, xt, xd, xe, yt, yd, yq)


def pair_subtract(
    f: jax.Array,
    ax: jax.Array,
    ay: jax.Array,
    dy,
    dx,
    scheme: CompactScheme,
    *,
    interpret: bool = False,
):
    """(ax - df/dx, ay - df/dy) of ``f`` (..., ny, nx) in one dispatch.

    The Helmholtz-projection update ``u - grad(phi)`` for the x/y
    components (ops/poisson.project's 'compact' form): 3 reads + 2 writes
    in one dispatch, where gradient_pair (1r + 2w) followed by two XLA
    subtraction passes (4r + 2w) costs 9 — the intermediate gradients
    never make an HBM round trip. The z component rides
    ops/pallas_leading.leading_derivative(phi, -dz, acc=uz), whose fused
    epilogue does the same. Requires ``pair_sub_supported``.
    """
    if f.dtype == jnp.float64:
        raise ValueError(
            "the pair Pallas path supports float32/bfloat16 only; use "
            "method='pcr' for float64 runs"
        )
    ny, nx = f.shape[-2], f.shape[-1]
    if not pair_sub_supported(scheme, ny, nx, f.dtype):
        raise ValueError(
            f"pair_subtract unsupported for shape (..., {ny}, {nx}) "
            f"dtype {f.dtype} scheme {scheme.name}"
        )
    if ax.shape != f.shape or ay.shape != f.shape:
        raise ValueError(
            f"accumuland shapes {ax.shape}/{ay.shape} != field {f.shape}"
        )
    lead = f.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    f3 = f.reshape(B, ny, nx)
    x_fold = nx <= FOLD_MAX
    xt, xd, xe, yt, yd, yq = _d1_pair_tables(scheme, ny, nx, dy, dx, x_fold)
    outx, outy = _call_pair_sub(
        f3,
        ax.reshape(B, ny, nx),
        ay.reshape(B, ny, nx),
        xt, xd, xe, yt, yd, yq,
        scheme=scheme, ny=ny, nx=nx, x_fold=x_fold, interpret=interpret,
    )
    return outx.reshape(f.shape), outy.reshape(f.shape)


def _d1_pair_tables(scheme, ny, nx, dy, dx, x_fold):
    """(xt, xd, xe, yt, yd, yq) device tables for the d1 pair kernels —
    x-part fold (nx <= FOLD_MAX) or roll, y-part roll, spacing folded in."""
    inv_dx = jnp.asarray(1.0, jnp.float32) / jnp.asarray(dx, jnp.float32)
    if x_fold:
        Mt, E, _ = _fold_tables(scheme, nx)
        _, D, _, _, _, _, _ = _lane_tables(scheme, nx)
        xt = jnp.asarray(Mt) * inv_dx
        xd = jnp.asarray(D)
        xe = jnp.asarray(E) * inv_dx
    else:
        Tm, D, Q, _, _, _, wfold = _lane_tables(scheme, nx)
        if Q is None:
            Q = np.zeros((1, nx), np.float32)
        scale = jnp.asarray(wfold, jnp.float32) * inv_dx
        xt = jnp.asarray(Tm) * scale
        xd = jnp.asarray(D)
        xe = jnp.asarray(Q) * scale

    Tm_y, D_y, Q_y, _, _, _, wfold_y = _lane_tables(scheme, ny)
    T_y = np.ascontiguousarray(np.transpose(Tm_y, (0, 2, 1)))
    if Q_y is None:
        Q_y = np.zeros((1, ny), np.float32)
    scale_y = jnp.asarray(wfold_y, jnp.float32) / jnp.asarray(dy, jnp.float32)
    yt = jnp.asarray(T_y) * scale_y
    yd = jnp.asarray(D_y.T)
    yq = jnp.asarray(Q_y.T) * scale_y
    return xt, xd, xe, yt, yd, yq


# ---------------------------------------------------------------------------
# advection pair: ux*dfdx + uy*dfdy in one kernel (the RK3 step's xy part)
# ---------------------------------------------------------------------------


def adv_pair_supported(scheme: CompactScheme, ny: int, nx: int, dtype) -> bool:
    """Whether the fused xy advection kernel applies (d1 schemes, f32)."""
    # f32 only: on bf16 fields the single-pass matmul path is faster than
    # the f32-internal HIGHEST dots (ops/derivatives.py gradient notes)
    return dtype == jnp.float32 and pair_supported(scheme, ny, nx, dtype)


def _adv_pair_kernel(
    f_ref,
    ux_ref,
    uy_ref,
    xt_ref,
    xd_ref,
    xe_ref,
    yt_ref,
    yd_ref,
    yq_ref,
    out_ref,
    *,
    nx: int,
    ny: int,
    x_fold: bool,
    x_meta,
    y_meta,
    scheme: CompactScheme,
    compute_dtype,
):
    """One (1, ny, nx) plane -> ux*dfdx + uy*dfdy of the resident tile."""
    m = BLOCK_LANES
    xblocks, yblocks = _d1_blocks(
        f_ref[0],
        xt_ref,
        xd_ref,
        xe_ref,
        yt_ref,
        yd_ref,
        yq_ref,
        nx=nx,
        ny=ny,
        x_fold=x_fold,
        x_meta=x_meta,
        y_meta=y_meta,
        scheme=scheme,
        compute_dtype=compute_dtype,
    )
    # x blocks partition the lanes, y blocks the sublanes: write the
    # ux-weighted x part, then accumulate the uy-weighted y part into the
    # resident out tile (VMEM read-modify-write; no extra HBM traffic)
    for b in range(nx // m):
        sl = slice(m * b, m * (b + 1))
        out_ref[0, :, sl] = (
            ux_ref[0, :, sl].astype(compute_dtype) * xblocks[b]
        ).astype(out_ref.dtype)
    for b in range(ny // m):
        sl = slice(m * b, m * (b + 1))
        out_ref[0, sl, :] = out_ref[0, sl, :] + (
            uy_ref[0, sl, :].astype(compute_dtype) * yblocks[b]
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scheme", "ny", "nx", "x_fold", "interpret")
)
def _call_adv_pair(
    f3, ux3, uy3, xt, xd, xe, yt, yd, yq, *, scheme, ny, nx, x_fold, interpret
):
    B = f3.shape[0]
    if x_fold:
        _, _, edges_meta = _fold_tables(scheme, nx)
        _, _, _, _, _, d_nonzero, _ = _lane_tables(scheme, nx)
        x_meta = (edges_meta, d_nonzero, d_block_map(scheme, nx))
    else:
        _, _, _, ct, cb, d_nonzero, wfold = _lane_tables(scheme, nx)
        x_meta = (ct, cb, d_nonzero, wfold, d_block_map(scheme, nx))
    _, _, _, cty, cby, d_nonzero_y, wfold_y = _lane_tables(scheme, ny)
    y_meta = (cty, cby, d_nonzero_y, wfold_y, d_block_map(scheme, ny))
    kernel = functools.partial(
        _adv_pair_kernel,
        nx=nx,
        ny=ny,
        x_fold=x_fold,
        x_meta=x_meta,
        y_meta=y_meta,
        scheme=scheme,
        compute_dtype=jnp.float32,
    )
    plane = lambda: pl.BlockSpec(
        (1, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, ny, nx), f3.dtype),
        grid=(B,),
        in_specs=[
            plane(),
            plane(),
            plane(),
            whole(xt),
            whole(xd),
            whole(xe),
            whole(yt),
            whole(yd),
            whole(yq),
        ],
        out_specs=plane(),
        # memory-biased estimate (3 reads + 1 write)
        cost_estimate=pl.CostEstimate(
            flops=18 * B * ny * nx,
            bytes_accessed=4 * B * ny * nx * f3.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(f3, ux3, uy3, xt, xd, xe, yt, yd, yq)


def advection_pair(
    f: jax.Array,
    ux: jax.Array,
    uy: jax.Array,
    dy,
    dx,
    scheme: CompactScheme,
    *,
    interpret: bool = False,
) -> jax.Array:
    """``ux * df/dx + uy * df/dy`` of ``f`` (..., ny, nx) in one kernel.

    The xy part of an advection term u . grad f: three HBM reads and ONE
    write, where the unfused pipeline costs the pair kernel's 1+2 plus a
    4-read elementwise dot pass (the derivatives fx/fy never touch HBM
    here). Block bodies are shared with ``gradient_pair`` (bit-identical
    derivatives); the velocity weighting rides the in-VMEM output tile.
    Fuses what the reference computes as separate derivative launches plus
    host/elementwise arithmetic (its multi-GPU harness runs repeated dfdx
    calls, perf-test/multi-GPU/PyCUDA/run.py:47-58; an advection RHS is
    the production shape of that workload).
    """
    ny, nx = f.shape[-2], f.shape[-1]
    if not adv_pair_supported(scheme, ny, nx, f.dtype):
        raise ValueError(
            f"advection pair kernel unsupported for shape (..., {ny}, {nx}) "
            f"dtype {f.dtype} scheme {scheme.name}"
        )
    if ux.shape != f.shape or uy.shape != f.shape:
        raise ValueError(
            f"velocity shapes {ux.shape}/{uy.shape} != field shape {f.shape}"
        )
    lead = f.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    x_fold = nx <= FOLD_MAX
    xt, xd, xe, yt, yd, yq = _d1_pair_tables(scheme, ny, nx, dy, dx, x_fold)
    out = _call_adv_pair(
        f.reshape(B, ny, nx),
        ux.astype(f.dtype).reshape(B, ny, nx),
        uy.astype(f.dtype).reshape(B, ny, nx),
        xt, xd, xe, yt, yd, yq,
        scheme=scheme, ny=ny, nx=nx, x_fold=x_fold, interpret=interpret,
    )
    return out.reshape(f.shape)


# ---------------------------------------------------------------------------
# d2 pair-sum: d2f/dx2 + d2f/dy2 in one kernel, one read + one write
# ---------------------------------------------------------------------------


def d2_sum_supported(scheme: CompactScheme, ny: int, nx: int, dtype) -> bool:
    """Whether the fused (d2x + d2y) kernel applies (derivative_order 2)."""
    return (
        scheme.derivative_order == 2
        and lane_supported(scheme, nx, dtype)
        and sublane_supported(scheme, ny, dtype)
        and ny * nx <= _MAX_TILE
    )


def _d2_sum_kernel(
    f_ref,
    xt_ref,
    xd_ref,
    xe_ref,
    yt_ref,
    yd_ref,
    ye_ref,
    out_ref,
    *,
    nx: int,
    ny: int,
    x_meta,
    y_meta,
    compute_dtype,
):
    """One (1, ny, nx) plane -> d2x + d2y of the resident tile."""
    m = BLOCK_LANES
    f = f_ref[0]

    edges_meta_x, d_nonzero_x, d_blocks_x = x_meta
    xblocks = lane_fold_blocks(
        f,
        xt_ref,
        xd_ref,
        xe_ref,
        nb=nx // m,
        edges_meta=edges_meta_x,
        d_nonzero=d_nonzero_x,
        compute_dtype=compute_dtype,
        d_blocks=d_blocks_x,
    )
    edges_meta_y, d_nonzero_y, d_blocks_y = y_meta
    yblocks = sublane_fold_blocks(
        f,
        yt_ref,
        yd_ref,
        ye_ref,
        nb=ny // m,
        edges_meta=edges_meta_y,
        d_nonzero=d_nonzero_y,
        compute_dtype=compute_dtype,
        d_blocks=d_blocks_y,
    )
    # sum on write: x blocks partition the lanes, y blocks the sublanes —
    # write the x part, then accumulate the y part into the resident out
    # tile (VMEM read-modify-write; no extra HBM traffic)
    for b in range(nx // m):
        out_ref[0, :, m * b : m * (b + 1)] = xblocks[b].astype(out_ref.dtype)
    for b in range(ny // m):
        sl = slice(m * b, m * (b + 1))
        out_ref[0, sl, :] = out_ref[0, sl, :] + yblocks[b].astype(
            out_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("scheme", "ny", "nx", "interpret")
)
def _call_d2_sum(f3, xt, xd, xe, yt, yd, ye, *, scheme, ny, nx, interpret):
    B = f3.shape[0]
    _, _, edges_meta_x = _fold_tables(scheme, nx)
    _, _, _, _, _, d_nonzero_x, _ = _lane_tables(scheme, nx)
    x_meta = (edges_meta_x, d_nonzero_x, d_block_map(scheme, nx))
    _, _, edges_meta_y = _fold_tables(scheme, ny)
    _, _, _, _, _, d_nonzero_y, _ = _lane_tables(scheme, ny)
    y_meta = (edges_meta_y, d_nonzero_y, d_block_map(scheme, ny))
    kernel = functools.partial(
        _d2_sum_kernel,
        nx=nx,
        ny=ny,
        x_meta=x_meta,
        y_meta=y_meta,
        compute_dtype=jnp.float32,
    )
    plane = lambda: pl.BlockSpec(
        (1, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, ny, nx), f3.dtype),
        grid=(B,),
        in_specs=[
            plane(),
            whole(xt),
            whole(xd),
            whole(xe),
            whole(yt),
            whole(yd),
            whole(ye),
        ],
        out_specs=plane(),
        # memory-biased estimate (1 read + 1 write)
        cost_estimate=pl.CostEstimate(
            flops=16 * B * ny * nx,
            bytes_accessed=2 * B * ny * nx * f3.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(f3, xt, xd, xe, yt, yd, ye)


def d2_pair_sum(
    f: jax.Array,
    dy,
    dx,
    scheme: CompactScheme,
    *,
    interpret: bool = False,
) -> jax.Array:
    """d2f/dx2 + d2f/dy2 of ``f`` (..., ny, nx) — one HBM read, one write.

    ``scheme`` must be a derivative_order=2 scheme (``d2_sum_supported``);
    both axes run the fold form with per-block/line demeaning exactly as
    the single-axis d2 ops do.
    """
    if f.dtype == jnp.float64:
        raise ValueError(
            "the pair Pallas path supports float32/bfloat16 only; use "
            "method='pcr' for float64 runs"
        )
    ny, nx = f.shape[-2], f.shape[-1]
    if not d2_sum_supported(scheme, ny, nx, f.dtype):
        raise ValueError(
            f"d2 pair-sum kernel unsupported for shape (..., {ny}, {nx}) "
            f"dtype {f.dtype} scheme {scheme.name}"
        )
    lead = f.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    f3 = f.reshape(B, ny, nx)

    inv_dx2 = (jnp.asarray(1.0, jnp.float32) / jnp.asarray(dx, jnp.float32)) ** 2
    Mt, E, _ = _fold_tables(scheme, nx)
    _, D, _, _, _, _, _ = _lane_tables(scheme, nx)
    xt = jnp.asarray(Mt) * inv_dx2
    xd = jnp.asarray(D)
    xe = jnp.asarray(E) * inv_dx2

    inv_dy2 = (jnp.asarray(1.0, jnp.float32) / jnp.asarray(dy, jnp.float32)) ** 2
    Mt_y, E_y, _ = _fold_tables(scheme, ny)
    M_y = np.ascontiguousarray(np.transpose(Mt_y, (0, 2, 1)))  # left-dot form
    _, D_y, _, _, _, _, _ = _lane_tables(scheme, ny)
    yt = jnp.asarray(M_y) * inv_dy2
    yd = jnp.asarray(D_y.T)
    ye = jnp.asarray(E_y.T) * inv_dy2

    out = _call_d2_sum(
        f3, xt, xd, xe, yt, yd, ye,
        scheme=scheme, ny=ny, nx=nx, interpret=interpret,
    )
    return out.reshape(f.shape)
