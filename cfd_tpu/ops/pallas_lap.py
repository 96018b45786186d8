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

__all__ = ["lap_rhs", "lap_rhs_supported"]

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
    m = BLOCK_LANES
    i = pl.program_id(0)

    # ---- push the arriving slab into the ring -----------------------------
    ring[pl.ds((i % 3) * sz, sz)] = f_ref[...]

    # ---- emit slab j = i - 2 ----------------------------------------------
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
