"""Four-pass Laplacian: streaming RHS kernel + leading-axis solve.

The Laplacian pipeline before this kernel was five HBM passes at 256^3:
``d2_pair_sum`` (read f, write s = d2x+d2y) followed by the leading-axis
d2z kernel with s as its accumuland (read f, read s, write out) — measured
0.60-0.83 ms (20-28 Gpt/s with chip weather).

This kernel removes one full read of f by a change of variables: with
``T_z`` / ``B_z`` the z-direction LHS/RHS operators of the compact d2
scheme, the solution of

    T_z y = B_z f + T_z s          where  s = d2x(f) + d2y(f)

is ``y = T_z^{-1} B_z f + s`` — the Laplacian, exactly. So dispatch A
(this kernel) computes ``r = B_z f + T_z s`` in ONE streaming pass over z
(read f, write r), and dispatch B is the leading-axis kernel in
*solve-only* mode (ops/pallas_leading.leading_solve: read r, write out):
four passes total.

Dispatch A walks z in SLABS of ``Sz`` planes (``dimension_semantics=
'arbitrary'``) with a VMEM ring of three slabs: step i loads slab
``(i - 1) mod (nz/Sz)`` — the BlockSpec index map wraps, so the ring sees
the cyclic sequence and needs no ghost inputs — and from step 2 emits
output slab ``j = i - 2``, whose z-taps (reach W <= Sz) all land in ring
slabs j-1, j, j+1. Everything happens at emit time: the xy operator is
linear and z-independent, so ``T_z s = op_xy(T_z f)`` — the kernel builds
``h_p = (T_z f)_p`` per output plane from three ring planes
(broadcast-FMAs with float64-precomputed SMEM coefficients), applies the
d2x+d2y fold bodies (shared with ops/pallas_pair.d2_pair_sum, same
tables) to h — the x-fold on the (Sz*ny, nx) collapse for full-depth MXU
dots, the y-fold per plane — and adds ``(B_z f)_p`` as 2W+1 more
broadcast-FMAs. No s ring, no read-modify-write pushes.

Why slabs and not single planes: the per-plane variant measured 0.49-0.52
ms for this dispatch — the same MXU work as ``d2_pair_sum`` failed to
overlap the DMA at (1, ny, nx) granularity. Slab-sized blocks restore the
lane kernel's overlap regime and feed the x-fold M=Sz*ny-deep dots.

The early steps (i < 2) write placeholder content to output slab 0; the
block index stays 0 until the window fills, so Pallas keeps it resident
and the one real write at step 2 is what lands in HBM.

PERIODIC SCHEMES ONLY. For non-periodic closures this change of
variables is accuracy-hostile, not just unimplemented: Lele's d2
boundary row of T_z is (1, 11), so ``(T_z s)_0`` is ~12x the field
scale — the fold of h at that plane carries 12x the absolute rounding —
and the corner of ``T_z^{-1}`` amplifies boundary residuals another
~20x. Measured end-to-end: 0.31 relative error vs 1.9e-3 for the
five-pass path on the same non-periodic 64x256x256 smooth field
(periodic: 1.8e-3 vs 7.9e-4, both at the f32 input-quantization floor).
Non-periodic fields keep the five-pass route in ops/derivatives.laplacian.

Reference lineage: this fuses what the reference computes as separate
computeRHS + solve + sumSolutions launches per axis plus host adds
(/root/reference/code/cuda/compact.py:29-44, kernels.cu:4-74), an
aggregate the reference never fused at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..schemes import CompactScheme, lhs_bands, rhs_matrix
from .pallas_lane import (
    BLOCK_LANES,
    _fold_tables,
    _lane_tables,
    d_block_map,
    lane_fold_blocks,
)
from .pallas_sublane import sublane_fold_blocks
from .pallas_pair import d2_sum_supported

__all__ = [
    "lap_rhs",
    "lap_rhs_supported",
    "adv_lap_rhs",
    "adv_lap_supported",
    "adv_lap_rhs3",
    "adv_lap3_supported",
]

# resident set: ring (3 slabs) + input (x2 double-buffered) + output (x2)
# + the h/b emit-time values (~2 slabs) ~ 10 slab-equivalents of VMEM
_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_sz(nz: int, ny: int, nx: int, W: int) -> int:
    """Largest slab depth Sz with nz % Sz == 0, W <= Sz, and the resident
    set under the VMEM budget. 0 if none fits."""
    for sz in (8, 4, 2, 1):
        if nz % sz or sz < W:
            continue
        if 10 * sz * ny * nx * 4 <= _VMEM_BUDGET:
            return sz
    return 0


@functools.lru_cache(maxsize=None)
def _z_tables(scheme: CompactScheme, n: int):
    """(btab (n, 2W+1), ttab (n, 3)) in float64->float32, periodic.

    btab[j, k+W] is the B_z coefficient of f[(j+k) mod n]; ttab[j, k+1]
    the T_z coefficient of s[(j+k) mod n] (the corner couplings of the
    periodic T are its wrapped off-diagonals). W == scheme.stencil_width
    for periodic schemes: every row is the wrapped interior stencil.
    """
    assert scheme.periodic
    B = rhs_matrix(scheme, n)
    W = scheme.stencil_width
    btab = np.zeros((n, 2 * W + 1), np.float64)
    for j in range(n):
        for c in np.nonzero(B[j])[0]:
            k = (c - j + n // 2) % n - n // 2
            btab[j, k + W] += B[j, c]
    dl, d, du = lhs_bands(scheme, n)
    ttab = np.stack([dl, d, du], axis=1)
    ttab[0, 0] = scheme.alpha  # row 0 couples s[n-1] (offset -1 wraps)
    ttab[-1, 2] = scheme.alpha  # row n-1 couples s[0]
    return np.asarray(btab, np.float32), np.asarray(ttab, np.float32)


def lap_rhs_supported(scheme: CompactScheme, nz: int, ny: int, nx: int, dtype) -> bool:
    """Whether the streaming Laplacian-RHS kernel applies."""
    if scheme.derivative_order != 2 or not scheme.periodic:
        return False
    if dtype != jnp.float32:
        return False
    if not d2_sum_supported(scheme, ny, nx, dtype):
        return False
    W = scheme.stencil_width
    if nz < max(scheme.min_points(), 2 * W + 1):
        return False
    return _pick_sz(nz, ny, nx, W) > 0


def _emit_lap_slab(
    ring,
    i,
    xt_ref,
    xd_ref,
    xe_ref,
    yt_ref,
    yd_ref,
    ye_ref,
    bt_ref,
    tt_ref,
    out_ref,
    *,
    nbz: int,
    sz: int,
    ny: int,
    nx: int,
    W: int,
    x_meta,
    y_meta,
    compute_dtype,
):
    """Emit slab j = i - 2 of ``r = B_z f + T_z(d2x+d2y)`` from the ring.

    Shared between the standalone ``lap_rhs`` kernel and the merged
    advection+lap-RHS kernel (``adv_lap_rhs``): grid step ``i`` has ring
    slabs j-1, j, j+1 resident (slab (i-1) % nbz arrived this step)."""
    m = BLOCK_LANES
    jp = jnp.clip(i - 2, 0, nbz - 1)

    def plane(q, k):
        # plane q+k of emit slab j lives in ring slab j+d (d = floor div),
        # which was loaded at step i+d-1 -> ring slot (i+d-1) % 3
        d, loc = divmod(q + k, sz)
        slot = (i + d + 2) % 3
        return ring[pl.ds(slot * sz + loc, 1)][0]

    hs = []
    bs = []
    for q in range(sz):
        p = jp * sz + q
        h = None
        for k in (-1, 0, 1):
            t = tt_ref[p, k + 1] * plane(q, k)
            h = t if h is None else h + t
        b = None
        for k in range(-W, W + 1):
            t = bt_ref[p, k + W] * plane(q, k)
            b = t if b is None else b + t
        hs.append(h)
        bs.append(b)

    edges_meta_x, d_nonzero_x, d_blocks_x = x_meta
    H = hs[0] if sz == 1 else jnp.concatenate(hs, axis=0)
    xblocks = lane_fold_blocks(
        H,
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
    for q in range(sz):
        yblocks = sublane_fold_blocks(
            hs[q],
            yt_ref,
            yd_ref,
            ye_ref,
            nb=ny // m,
            edges_meta=edges_meta_y,
            d_nonzero=d_nonzero_y,
            compute_dtype=compute_dtype,
            d_blocks=d_blocks_y,
        )
        for bx in range(nx // m):
            sl = slice(m * bx, m * (bx + 1))
            out_ref[q, :, sl] = (
                xblocks[bx][q * ny : (q + 1) * ny, :] + bs[q][:, sl]
            )
        for by in range(ny // m):
            sl = slice(m * by, m * (by + 1))
            out_ref[q, sl, :] = out_ref[q, sl, :] + yblocks[by]


def _lap_rhs_kernel(
    f_ref,
    xt_ref,
    xd_ref,
    xe_ref,
    yt_ref,
    yd_ref,
    ye_ref,
    bt_ref,
    tt_ref,
    out_ref,
    ring,
    *,
    nbz: int,
    sz: int,
    ny: int,
    nx: int,
    W: int,
    x_meta,
    y_meta,
    compute_dtype,
):
    i = pl.program_id(0)
    # push the arriving slab into the ring, then emit slab i - 2
    ring[pl.ds((i % 3) * sz, sz)] = f_ref[...]
    _emit_lap_slab(
        ring,
        i,
        xt_ref,
        xd_ref,
        xe_ref,
        yt_ref,
        yd_ref,
        ye_ref,
        bt_ref,
        tt_ref,
        out_ref,
        nbz=nbz,
        sz=sz,
        ny=ny,
        nx=nx,
        W=W,
        x_meta=x_meta,
        y_meta=y_meta,
        compute_dtype=compute_dtype,
    )


@functools.partial(
    jax.jit, static_argnames=("scheme", "nz", "ny", "nx", "interpret")
)
def _call_lap_rhs(
    f, xt, xd, xe, yt, yd, ye, bt, tt, *, scheme, nz, ny, nx, interpret
):
    _, _, edges_meta_x = _fold_tables(scheme, nx)
    _, _, _, _, _, d_nonzero_x, _ = _lane_tables(scheme, nx)
    x_meta = (edges_meta_x, d_nonzero_x, d_block_map(scheme, nx))
    _, _, edges_meta_y = _fold_tables(scheme, ny)
    _, _, _, _, _, d_nonzero_y, _ = _lane_tables(scheme, ny)
    y_meta = (edges_meta_y, d_nonzero_y, d_block_map(scheme, ny))
    W = scheme.stencil_width
    sz = _pick_sz(nz, ny, nx, W)
    nbz = nz // sz
    kernel = functools.partial(
        _lap_rhs_kernel,
        nbz=nbz,
        sz=sz,
        ny=ny,
        nx=nx,
        W=W,
        x_meta=x_meta,
        y_meta=y_meta,
        compute_dtype=jnp.float32,
    )
    slab_in = pl.BlockSpec(
        (sz, ny, nx), lambda i: ((i - 1) % nbz, 0, 0), memory_space=pltpu.VMEM
    )
    slab_out = pl.BlockSpec(
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
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), f.dtype),
        grid=(nbz + 2,),
        in_specs=[
            slab_in,
            whole(xt),
            whole(xd),
            whole(xe),
            whole(yt),
            whole(yd),
            whole(ye),
            smem(bt),
            smem(tt),
        ],
        out_specs=slab_out,
        scratch_shapes=[
            pltpu.VMEM((3 * sz, ny, nx), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=24 * nz * ny * nx,
            bytes_accessed=2 * nz * ny * nx * f.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(f, xt, xd, xe, yt, yd, ye, bt, tt)


def lap_rhs(
    f: jax.Array,
    dz,
    dy,
    dx,
    scheme: CompactScheme,
    *,
    interpret: bool = False,
) -> jax.Array:
    """``B_z f / dz^2 + T_z (d2x f + d2y f)`` of a (nz, ny, nx) field.

    One HBM read of f, one write. Solving the result along z with the
    scheme's LHS (ops/pallas_leading.leading_solve) yields the Laplacian.
    ``scheme`` must be a periodic derivative_order=2 scheme passing
    ``lap_rhs_supported``.
    """
    if f.ndim != 3:
        raise ValueError(f"lap_rhs needs a 3-D (nz, ny, nx) field, got {f.shape}")
    nz, ny, nx = f.shape
    if not lap_rhs_supported(scheme, nz, ny, nx, f.dtype):
        raise ValueError(
            f"lap_rhs unsupported for shape {f.shape} dtype {f.dtype} "
            f"scheme {scheme.name}"
        )

    inv_dx2 = (jnp.asarray(1.0, jnp.float32) / jnp.asarray(dx, jnp.float32)) ** 2
    Mt, E, _ = _fold_tables(scheme, nx)
    _, D, _, _, _, _, _ = _lane_tables(scheme, nx)
    xt = jnp.asarray(Mt) * inv_dx2
    xd = jnp.asarray(D)
    xe = jnp.asarray(E) * inv_dx2

    inv_dy2 = (jnp.asarray(1.0, jnp.float32) / jnp.asarray(dy, jnp.float32)) ** 2
    Mt_y, E_y, _ = _fold_tables(scheme, ny)
    M_y = np.ascontiguousarray(np.transpose(Mt_y, (0, 2, 1)))
    _, D_y, _, _, _, _, _ = _lane_tables(scheme, ny)
    yt = jnp.asarray(M_y) * inv_dy2
    yd = jnp.asarray(D_y.T)
    ye = jnp.asarray(E_y.T) * inv_dy2

    btab, ttab = _z_tables(scheme, nz)
    inv_dz2 = (jnp.asarray(1.0, jnp.float32) / jnp.asarray(dz, jnp.float32)) ** 2
    bt = jnp.asarray(btab) * inv_dz2
    tt = jnp.asarray(ttab)

    return _call_lap_rhs(
        f, xt, xd, xe, yt, yd, ye, bt, tt,
        scheme=scheme, nz=nz, ny=ny, nx=nx, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# merged advection + Laplacian-RHS: axy AND r from ONE streaming pass
# ---------------------------------------------------------------------------
#
# The fused RK3 substep's first two dispatches both read all of f:
# advection_pair (f, ux, uy in; axy out — 4 passes) and lap_rhs (f in;
# r out — 2 passes). The advection term is z-LOCAL (only x/y derivatives),
# so it rides the same streaming pass: each grid step computes
# ``axy = ux*d1x f + uy*d1y f`` on the ARRIVING slab (pallas_pair block
# bodies, bit-identical tables) while the ring emits the lagged Laplacian
# RHS slab. 5 HBM passes (f, ux, uy in; axy, r out) instead of 6, and one
# dispatch instead of two — the whole substep becomes TWO dispatches
# (this + the mega kernel) / 12 passes.

# resident set: ring (3 slabs) + five double-buffered streams (f, ux, uy,
# axy, r — 10 slab-equivalents) + emit temporaries (~4) -> ~17 slabs
_VMEM_MERGED = 14 * 1024 * 1024


def _pick_sz_merged(nz: int, ny: int, nx: int, W: int) -> int:
    for sz in (8, 4, 2, 1):
        if nz % sz or sz < W:
            continue
        if 17 * sz * ny * nx * 4 <= _VMEM_MERGED:
            return sz
    return 0


def adv_lap_supported(
    scheme1: CompactScheme,
    scheme2: CompactScheme,
    nz: int,
    ny: int,
    nx: int,
    dtype,
) -> bool:
    """Whether the merged advection+lap-RHS streaming kernel applies."""
    from .pallas_pair import adv_pair_supported

    if not adv_pair_supported(scheme1, ny, nx, dtype):
        return False
    if scheme2.derivative_order != 2 or not scheme2.periodic:
        return False
    if not d2_sum_supported(scheme2, ny, nx, dtype):
        return False
    W = scheme2.stencil_width
    if nz < max(scheme2.min_points(), 2 * W + 1):
        return False
    return _pick_sz_merged(nz, ny, nx, W) > 0


def _adv_lap_kernel(
    f_ref,
    *rest,
    ax: bool,
    ay: bool,
    nbz: int,
    sz: int,
    ny: int,
    nx: int,
    W: int,
    x_fold: bool,
    x1_meta,
    y1_meta,
    x2_meta,
    y2_meta,
    scheme1: CompactScheme,
    compute_dtype,
):
    from .pallas_pair import _d1_blocks

    # unpack: the aliased velocity refs (ux/uy identical to f — Burgers
    # components) are not separate inputs; they read from f_ref directly
    it = iter(rest)
    ux_ref = f_ref if ax else next(it)
    uy_ref = f_ref if ay else next(it)
    (x1t_ref, x1d_ref, x1e_ref, y1t_ref, y1d_ref, y1q_ref,
     x2t_ref, x2d_ref, x2e_ref, y2t_ref, y2d_ref, y2e_ref,
     bt_ref, tt_ref, axy_ref, r_ref, ring) = it

    m = BLOCK_LANES
    i = pl.program_id(0)

    # ---- push the arriving slab into the ring -----------------------------
    ring[pl.ds((i % 3) * sz, sz)] = f_ref[...]

    # ---- advection on the arriving slab (z-local: d1x, d1y only) ----------
    for q in range(sz):
        xb, yb = _d1_blocks(
            f_ref[q],
            x1t_ref,
            x1d_ref,
            x1e_ref,
            y1t_ref,
            y1d_ref,
            y1q_ref,
            nx=nx,
            ny=ny,
            x_fold=x_fold,
            x_meta=x1_meta,
            y_meta=y1_meta,
            scheme=scheme1,
            compute_dtype=compute_dtype,
        )
        for b in range(nx // m):
            sl = slice(m * b, m * (b + 1))
            axy_ref[q, :, sl] = (
                ux_ref[q, :, sl].astype(compute_dtype) * xb[b]
            ).astype(axy_ref.dtype)
        for b in range(ny // m):
            sl = slice(m * b, m * (b + 1))
            axy_ref[q, sl, :] = axy_ref[q, sl, :] + (
                uy_ref[q, sl, :].astype(compute_dtype) * yb[b]
            ).astype(axy_ref.dtype)

    # ---- emit Laplacian-RHS slab i - 2 from the ring ----------------------
    _emit_lap_slab(
        ring,
        i,
        x2t_ref,
        x2d_ref,
        x2e_ref,
        y2t_ref,
        y2d_ref,
        y2e_ref,
        bt_ref,
        tt_ref,
        r_ref,
        nbz=nbz,
        sz=sz,
        ny=ny,
        nx=nx,
        W=W,
        x_meta=x2_meta,
        y_meta=y2_meta,
        compute_dtype=compute_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "scheme1", "scheme2", "nz", "ny", "nx", "x_fold", "ax", "ay", "interpret",
    ),
)
def _call_adv_lap(
    f, us, d1_tabs, d2_tabs, bt, tt,
    *, scheme1, scheme2, nz, ny, nx, x_fold, ax, ay, interpret,
):
    if x_fold:
        _, _, edges_meta = _fold_tables(scheme1, nx)
        _, _, _, _, _, d_nonzero, _ = _lane_tables(scheme1, nx)
        x1_meta = (edges_meta, d_nonzero, d_block_map(scheme1, nx))
    else:
        _, _, _, ct, cb, d_nonzero, wfold = _lane_tables(scheme1, nx)
        x1_meta = (ct, cb, d_nonzero, wfold, d_block_map(scheme1, nx))
    _, _, _, cty, cby, d_nonzero_y, wfold_y = _lane_tables(scheme1, ny)
    y1_meta = (cty, cby, d_nonzero_y, wfold_y, d_block_map(scheme1, ny))

    _, _, edges_meta_x2 = _fold_tables(scheme2, nx)
    _, _, _, _, _, d_nonzero_x2, _ = _lane_tables(scheme2, nx)
    x2_meta = (edges_meta_x2, d_nonzero_x2, d_block_map(scheme2, nx))
    _, _, edges_meta_y2 = _fold_tables(scheme2, ny)
    _, _, _, _, _, d_nonzero_y2, _ = _lane_tables(scheme2, ny)
    y2_meta = (edges_meta_y2, d_nonzero_y2, d_block_map(scheme2, ny))

    W = scheme2.stencil_width
    sz = _pick_sz_merged(nz, ny, nx, W)
    nbz = nz // sz
    kernel = functools.partial(
        _adv_lap_kernel,
        ax=ax,
        ay=ay,
        nbz=nbz,
        sz=sz,
        ny=ny,
        nx=nx,
        W=W,
        x_fold=x_fold,
        x1_meta=x1_meta,
        y1_meta=y1_meta,
        x2_meta=x2_meta,
        y2_meta=y2_meta,
        scheme1=scheme1,
        compute_dtype=jnp.float32,
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
        out_shape=(
            jax.ShapeDtypeStruct((nz, ny, nx), f.dtype),
            jax.ShapeDtypeStruct((nz, ny, nx), f.dtype),
        ),
        grid=(nbz + 2,),
        in_specs=[arrive] * (1 + len(us))
        + [whole(t) for t in d1_tabs]
        + [whole(t) for t in d2_tabs]
        + [smem(bt), smem(tt)],
        # axy rides the arriving slab (its two pipeline-fill recomputes of
        # wrapped slabs are <2% extra traffic); r emits with the 2-slab lag
        out_specs=(arrive, lagged),
        scratch_shapes=[
            pltpu.VMEM((3 * sz, ny, nx), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=42 * nz * ny * nx,
            bytes_accessed=(3 + len(us)) * nz * ny * nx * f.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(f, *us, *d1_tabs, *d2_tabs, bt, tt)


def adv_lap_rhs(
    f: jax.Array,
    ux: jax.Array,
    uy: jax.Array,
    dz,
    dy,
    dx,
    scheme1: CompactScheme,
    scheme2: CompactScheme,
    *,
    interpret: bool = False,
):
    """``(ux*d1x f + uy*d1y f,  B_z f + T_z(d2x f + d2y f))`` in ONE kernel.

    One streaming pass: 3 HBM reads (f, ux, uy), 2 writes (axy, r) — the
    merged form of ``pallas_pair.advection_pair`` + ``lap_rhs`` (same block
    bodies and tables, bit-identical results). ``scheme1`` is the d1 scheme,
    ``scheme2`` the periodic d2 scheme; requires ``adv_lap_supported``.

    When ``ux``/``uy`` IS ``f`` (same array object — a Burgers velocity
    component advected by itself), the duplicate input stream is dropped
    and the kernel reads the velocity from the field's own slab: 2 reads
    instead of 3, bit-identical output.
    """
    if f.ndim != 3:
        raise ValueError(
            f"adv_lap_rhs needs a 3-D (nz, ny, nx) field, got {f.shape}"
        )
    nz, ny, nx = f.shape
    if not adv_lap_supported(scheme1, scheme2, nz, ny, nx, f.dtype):
        raise ValueError(
            f"adv_lap_rhs unsupported for shape {f.shape} dtype {f.dtype} "
            f"schemes {scheme1.name}/{scheme2.name}"
        )
    if ux.shape != f.shape or uy.shape != f.shape:
        raise ValueError(
            f"velocity shapes {ux.shape}/{uy.shape} != field shape {f.shape}"
        )
    from .pallas_lane import FOLD_MAX
    from .pallas_pair import _d1_pair_tables

    ax = ux is f
    ay = uy is f
    us = tuple(
        a.astype(f.dtype) for a, aliased in ((ux, ax), (uy, ay)) if not aliased
    )
    x_fold = nx <= FOLD_MAX
    d1_tabs = _d1_pair_tables(scheme1, ny, nx, dy, dx, x_fold)
    d2_tabs, bt, tt = _lap_call_tables(scheme2, nz, ny, nx, dz, dy, dx)

    return _call_adv_lap(
        f,
        us,
        d1_tabs,
        d2_tabs,
        bt,
        tt,
        scheme1=scheme1,
        scheme2=scheme2,
        nz=nz,
        ny=ny,
        nx=nx,
        x_fold=x_fold,
        ax=ax,
        ay=ay,
        interpret=interpret,
    )


def _lap_call_tables(scheme2: CompactScheme, nz, ny, nx, dz, dy, dx):
    """(d2_tabs, bt, tt) device tables for the merged lap-RHS emitters."""
    inv_dx2 = (jnp.asarray(1.0, jnp.float32) / jnp.asarray(dx, jnp.float32)) ** 2
    Mt, E, _ = _fold_tables(scheme2, nx)
    _, D, _, _, _, _, _ = _lane_tables(scheme2, nx)
    inv_dy2 = (jnp.asarray(1.0, jnp.float32) / jnp.asarray(dy, jnp.float32)) ** 2
    Mt_y, E_y, _ = _fold_tables(scheme2, ny)
    M_y = np.ascontiguousarray(np.transpose(Mt_y, (0, 2, 1)))
    _, D_y, _, _, _, _, _ = _lane_tables(scheme2, ny)
    d2_tabs = (
        jnp.asarray(Mt) * inv_dx2,
        jnp.asarray(D),
        jnp.asarray(E) * inv_dx2,
        jnp.asarray(M_y) * inv_dy2,
        jnp.asarray(D_y.T),
        jnp.asarray(E_y.T) * inv_dy2,
    )
    btab, ttab = _z_tables(scheme2, nz)
    inv_dz2 = (jnp.asarray(1.0, jnp.float32) / jnp.asarray(dz, jnp.float32)) ** 2
    return d2_tabs, jnp.asarray(btab) * inv_dz2, jnp.asarray(ttab)


# ---------------------------------------------------------------------------
# 3-component merged advection + Laplacian RHS: the momentum-stage head of a
# velocity SYSTEM (Burgers / Navier-Stokes) in ONE dispatch
# ---------------------------------------------------------------------------
#
# Per RK stage a 3-component system needs (axy_i, r_i) for every component
# u_i, all advected by the SAME (ux, uy) = (u_0, u_1). Three adv_lap_rhs
# dispatches read 7 arrays (u_0 and u_1 twice over) and write 6; this kernel
# reads u_0, u_1, u_2 ONCE and writes the same 6 — nine HBM passes instead
# of thirteen, and the d1/d2 fold tables are shipped to VMEM once instead
# of three times. VMEM: three 3-slab rings + three double-buffered inputs +
# six double-buffered outputs ~ 29 slab-equivalents; the slab picker budgets
# for it (the physical ~16 MB/core bounds sz to 2 at 256^2 planes).

_VMEM_MERGED3 = 15 * 1024 * 1024  # sz=2 at 256^2: sz=4 measured slower (2.75 vs 2.62 ms)


def _pick_sz_merged3(nz: int, ny: int, nx: int, W: int) -> int:
    for sz in (8, 4, 2, 1):
        if nz % sz or sz < W:
            continue
        if 29 * sz * ny * nx * 4 <= _VMEM_MERGED3:
            return sz
    return 0


def adv_lap3_supported(
    scheme1: CompactScheme,
    scheme2: CompactScheme,
    nz: int,
    ny: int,
    nx: int,
    dtype,
) -> bool:
    """Whether the 3-component merged advection+lap-RHS kernel applies."""
    if not adv_lap_supported(scheme1, scheme2, nz, ny, nx, dtype):
        return False
    return _pick_sz_merged3(nz, ny, nx, scheme2.stencil_width) > 0


def _adv_lap3_kernel(
    u0_ref,
    u1_ref,
    u2_ref,
    x1t_ref,
    x1d_ref,
    x1e_ref,
    y1t_ref,
    y1d_ref,
    y1q_ref,
    x2t_ref,
    x2d_ref,
    x2e_ref,
    y2t_ref,
    y2d_ref,
    y2e_ref,
    bt_ref,
    tt_ref,
    a0_ref,
    a1_ref,
    a2_ref,
    r0_ref,
    r1_ref,
    r2_ref,
    ring0,
    ring1,
    ring2,
    *,
    nbz: int,
    sz: int,
    ny: int,
    nx: int,
    W: int,
    x_fold: bool,
    x1_meta,
    y1_meta,
    x2_meta,
    y2_meta,
    scheme1: CompactScheme,
    compute_dtype,
):
    from .pallas_pair import _d1_blocks

    m = BLOCK_LANES
    i = pl.program_id(0)
    comps = (
        (u0_ref, a0_ref, r0_ref, ring0),
        (u1_ref, a1_ref, r1_ref, ring1),
        (u2_ref, a2_ref, r2_ref, ring2),
    )

    for f_ref, _, _, ring in comps:
        ring[pl.ds((i % 3) * sz, sz)] = f_ref[...]

    for f_ref, axy_ref, r_ref, ring in comps:
        for q in range(sz):
            xb, yb = _d1_blocks(
                f_ref[q],
                x1t_ref,
                x1d_ref,
                x1e_ref,
                y1t_ref,
                y1d_ref,
                y1q_ref,
                nx=nx,
                ny=ny,
                x_fold=x_fold,
                x_meta=x1_meta,
                y_meta=y1_meta,
                scheme=scheme1,
                compute_dtype=compute_dtype,
            )
            for b in range(nx // m):
                sl = slice(m * b, m * (b + 1))
                axy_ref[q, :, sl] = (
                    u0_ref[q, :, sl].astype(compute_dtype) * xb[b]
                ).astype(axy_ref.dtype)
            for b in range(ny // m):
                sl = slice(m * b, m * (b + 1))
                axy_ref[q, sl, :] = axy_ref[q, sl, :] + (
                    u1_ref[q, sl, :].astype(compute_dtype) * yb[b]
                ).astype(axy_ref.dtype)
        _emit_lap_slab(
            ring,
            i,
            x2t_ref,
            x2d_ref,
            x2e_ref,
            y2t_ref,
            y2d_ref,
            y2e_ref,
            bt_ref,
            tt_ref,
            r_ref,
            nbz=nbz,
            sz=sz,
            ny=ny,
            nx=nx,
            W=W,
            x_meta=x2_meta,
            y_meta=y2_meta,
            compute_dtype=compute_dtype,
        )


def _merged_metas(scheme1, scheme2, ny, nx, x_fold):
    if x_fold:
        _, _, edges_meta = _fold_tables(scheme1, nx)
        _, _, _, _, _, d_nonzero, _ = _lane_tables(scheme1, nx)
        x1_meta = (edges_meta, d_nonzero, d_block_map(scheme1, nx))
    else:
        _, _, _, ct, cb, d_nonzero, wfold = _lane_tables(scheme1, nx)
        x1_meta = (ct, cb, d_nonzero, wfold, d_block_map(scheme1, nx))
    _, _, _, cty, cby, d_nonzero_y, wfold_y = _lane_tables(scheme1, ny)
    y1_meta = (cty, cby, d_nonzero_y, wfold_y, d_block_map(scheme1, ny))
    _, _, edges_meta_x2 = _fold_tables(scheme2, nx)
    _, _, _, _, _, d_nonzero_x2, _ = _lane_tables(scheme2, nx)
    x2_meta = (edges_meta_x2, d_nonzero_x2, d_block_map(scheme2, nx))
    _, _, edges_meta_y2 = _fold_tables(scheme2, ny)
    _, _, _, _, _, d_nonzero_y2, _ = _lane_tables(scheme2, ny)
    y2_meta = (edges_meta_y2, d_nonzero_y2, d_block_map(scheme2, ny))
    return x1_meta, y1_meta, x2_meta, y2_meta


@functools.partial(
    jax.jit,
    static_argnames=(
        "scheme1", "scheme2", "nz", "ny", "nx", "x_fold", "interpret",
    ),
)
def _call_adv_lap3(
    u0, u1, u2, d1_tabs, d2_tabs, bt, tt,
    *, scheme1, scheme2, nz, ny, nx, x_fold, interpret,
):
    x1_meta, y1_meta, x2_meta, y2_meta = _merged_metas(
        scheme1, scheme2, ny, nx, x_fold
    )
    W = scheme2.stencil_width
    sz = _pick_sz_merged3(nz, ny, nx, W)
    nbz = nz // sz
    kernel = functools.partial(
        _adv_lap3_kernel,
        nbz=nbz,
        sz=sz,
        ny=ny,
        nx=nx,
        W=W,
        x_fold=x_fold,
        x1_meta=x1_meta,
        y1_meta=y1_meta,
        x2_meta=x2_meta,
        y2_meta=y2_meta,
        scheme1=scheme1,
        compute_dtype=jnp.float32,
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
    out = jax.ShapeDtypeStruct((nz, ny, nx), u0.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(out,) * 6,
        grid=(nbz + 2,),
        in_specs=[arrive] * 3
        + [whole(t) for t in d1_tabs]
        + [whole(t) for t in d2_tabs]
        + [smem(bt), smem(tt)],
        out_specs=(arrive,) * 3 + (lagged,) * 3,
        scratch_shapes=[pltpu.VMEM((3 * sz, ny, nx), jnp.float32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=126 * nz * ny * nx,
            bytes_accessed=9 * nz * ny * nx * u0.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # three rings + three inputs + six outputs + per-component emit
            # temporaries measure 26.3 MB at sz=2, 256^2 planes — over the
            # 16 MB default scoped-vmem cap but well under the physical
            # VMEM; raise the cap for this kernel only
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(u0, u1, u2, *d1_tabs, *d2_tabs, bt, tt)


def adv_lap_rhs3(
    u,
    dz,
    dy,
    dx,
    scheme1: CompactScheme,
    scheme2: CompactScheme,
    *,
    interpret: bool = False,
):
    """``(axy_i, r_i)`` for all three components of a velocity system in
    ONE dispatch: ``axy_i = u0*d1x(u_i) + u1*d1y(u_i)`` and
    ``r_i = B_z u_i + T_z(d2x u_i + d2y u_i)``.

    Returns ``((axy0, axy1, axy2), (r0, r1, r2))`` — bit-identical to
    three ``adv_lap_rhs(u_i, u0, u1)`` calls (same block bodies, same
    tables) at nine HBM passes instead of thirteen. Requires
    ``adv_lap3_supported``.
    """
    u0, u1, u2 = u
    if u0.ndim != 3 or not (u0.shape == u1.shape == u2.shape):
        raise ValueError(
            f"adv_lap_rhs3 needs three equal-shape 3-D components, got "
            f"{[c.shape for c in u]}"
        )
    nz, ny, nx = u0.shape
    if not adv_lap3_supported(scheme1, scheme2, nz, ny, nx, u0.dtype):
        raise ValueError(
            f"adv_lap_rhs3 unsupported for shape {u0.shape} dtype "
            f"{u0.dtype} schemes {scheme1.name}/{scheme2.name}"
        )
    from .pallas_lane import FOLD_MAX
    from .pallas_pair import _d1_pair_tables

    x_fold = nx <= FOLD_MAX
    d1_tabs = _d1_pair_tables(scheme1, ny, nx, dy, dx, x_fold)
    d2_tabs, bt, tt = _lap_call_tables(scheme2, nz, ny, nx, dz, dy, dx)
    outs = _call_adv_lap3(
        u0.astype(jnp.float32),
        u1.astype(jnp.float32),
        u2.astype(jnp.float32),
        d1_tabs,
        d2_tabs,
        bt,
        tt,
        scheme1=scheme1,
        scheme2=scheme2,
        nz=nz,
        ny=ny,
        nx=nx,
        x_fold=x_fold,
        interpret=interpret,
    )
    return outs[:3], outs[3:]
