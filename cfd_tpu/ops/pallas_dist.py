"""Lane/sublane-axis shard-local solves for distributed compact derivatives.

When ``dfdx`` (lane axis) or ``dfdy`` (sublane axis) crosses a sharded mesh
axis, the local solve runs the round-3 roll-form kernel machinery
(ops/pallas_lane.py, ops/pallas_sublane.py — see those docstrings for the
measured design rules) on the shard's truncated local system:

* the RHS is the same cyclic-roll windowed sum of first differences; the
  2w rows whose wrapped stencil crossed the shard cut get a *halo-lane
  delta* (a short sum of direct lane differences against the neighbour's
  halo lanes — closure ghosts at physical ends, so the structure is
  SPMD-uniform) applied through the exact inverse responses
  ``T_local^{-1}[:, j]``, exactly the mechanism the single-device kernel
  uses for closure rows;
* per-128-block MXU solves + the intra-shard interface correction use the
  shard's own tables (parallel/dist_tables.local_lane_tables);
* the externally-solved outer interface weights ``ab`` fold into the same
  write as two broadcast-FMAs against the shard unit loads — no separate
  reduced/update XLA passes, no moveaxis relayout.

Shard-local cost: one HBM read of f, one write of f' (plus the tiny halo /
ab planes) — the reference's distributed path runs its best single-GPU
solver shard-locally too (/root/reference/code/cuda/compact.py:18,171-173).
float32/bfloat16, first-derivative (roll-form) schemes; other orders fall
back to the generic distributed route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..schemes import CompactScheme
from .pallas_lane import BLOCK_LANES, _pick_rows
from .pallas_sublane import _pick_cols

__all__ = [
    "lane_dist_derivative",
    "sublane_dist_derivative",
    "lane_dist_supported",
]

_LANE = 128


def lane_dist_supported(scheme: CompactScheme, nl: int, dtype) -> bool:
    """Whether the lane/sublane dist kernels can run one shard's local
    solve of ``nl``-point lines (roll form for d1, fold form for
    d2/filters — see parallel/dist_tables)."""
    return (
        dtype in (jnp.float32, jnp.bfloat16)
        and nl % BLOCK_LANES == 0
        and nl >= max(scheme.min_points(), BLOCK_LANES)
    )


def _rhs_rolls(f, scheme, wfold, axis):
    """Wrapped roll-form RHS (wfold-normalized) along ``axis`` (0 or 1)."""
    n = f.shape[axis]
    g = pltpu.roll(f, n - 1, axis) - f
    rhs = None
    for k, wt in zip(scheme.rhs_offsets, scheme.rhs_weights):
        term = None
        for s in range(1 - k, k + 1):
            piece = g if s == 0 else pltpu.roll(g, s % n, axis)
            term = piece if term is None else term + piece
        if wt != wfold:
            term = (wt / wfold) * term
        rhs = term if rhs is None else rhs + term
    return rhs


def _cut_deltas(f, hl, hr, cut_meta, axis):
    """Halo-lane deltas of the cut rows: list of (qd_row, (R,1) or (1,C))."""
    out = []
    for c, taps in cut_meta:
        delta = None
        for src, lane, coeff in taps:
            a = {"f": f, "l": hl, "r": hr}[src]
            piece = coeff * (
                a[:, lane : lane + 1] if axis == 1 else a[lane : lane + 1, :]
            )
            delta = piece if delta is None else delta + piece
        out.append((c, delta))
    return out


def _lane_dist_kernel(
    f_ref,
    hl_ref,
    hr_ref,
    ab_ref,
    t_ref,
    d_ref,
    qd_ref,
    su_ref,
    sl_ref,
    out_ref,
    *,
    n: int,
    nb: int,
    scheme: CompactScheme,
    wfold: float,
    cut_meta,
    d_nonzero,
    d_blocks,
    q_blocks,
    su_blocks,
    sl_blocks,
    compute_dtype,
):
    """One (R, n) row tile of the shard-local lane solve."""
    from .pallas_lane import _apply_sparse_corr

    m = BLOCK_LANES
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=compute_dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    f = f_ref[:].astype(compute_dtype)
    rhs = _rhs_rolls(f, scheme, wfold, 1)
    xr = [dot(rhs[:, m * b : m * (b + 1)], t_ref[b]) for b in range(nb)]

    # halo-lane deltas of the cut rows x exact inverse responses
    hl = hl_ref[:].astype(compute_dtype)
    hr = hr_ref[:].astype(compute_dtype)
    for c, delta in _cut_deltas(f, hl, hr, cut_meta, 1):
        for b in q_blocks[c]:
            xr[b] = xr[b] + delta * qd_ref[c : c + 1, m * b : m * (b + 1)]

    # intra-shard interface correction (sparse block support)
    xr = _apply_sparse_corr(xr, d_ref, d_nonzero, d_blocks, nb, m, 1)

    # outer rank-2 update: ab (R, 2) x shard unit-load rows
    a0 = ab_ref[:, 0:1].astype(compute_dtype)
    a1 = ab_ref[:, 1:2].astype(compute_dtype)
    for b in su_blocks:
        xr[b] = xr[b] + a0 * su_ref[0:1, m * b : m * (b + 1)]
    for b in sl_blocks:
        xr[b] = xr[b] + a1 * sl_ref[0:1, m * b : m * (b + 1)]

    for b in range(nb):
        out_ref[:, m * b : m * (b + 1)] = xr[b].astype(out_ref.dtype)


def _sublane_dist_kernel(
    f_ref,
    hl_ref,
    hr_ref,
    ab_ref,
    t_ref,
    d_ref,
    qd_ref,
    su_ref,
    sl_ref,
    out_ref,
    *,
    n: int,
    nb: int,
    scheme: CompactScheme,
    wfold: float,
    cut_meta,
    d_nonzero,
    d_blocks,
    q_blocks,
    su_blocks,
    sl_blocks,
    compute_dtype,
    squeezed: bool = False,
):
    """One (n, C) column tile of the shard-local sublane solve (the
    transpose of ``_lane_dist_kernel``; tables arrive pre-transposed)."""
    from .pallas_lane import _apply_sparse_corr

    m = BLOCK_LANES
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=compute_dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    ld = (lambda r: r[:]) if squeezed else (lambda r: r[0])
    f = ld(f_ref).astype(compute_dtype)
    rhs = _rhs_rolls(f, scheme, wfold, 0)
    xr = [dot(t_ref[b], rhs[m * b : m * (b + 1), :]) for b in range(nb)]

    hl = ld(hl_ref).astype(compute_dtype)
    hr = ld(hr_ref).astype(compute_dtype)
    for c, delta in _cut_deltas(f, hl, hr, cut_meta, 0):
        for b in q_blocks[c]:
            xr[b] = xr[b] + qd_ref[m * b : m * (b + 1), c : c + 1] * delta

    xr = _apply_sparse_corr(xr, d_ref, d_nonzero, d_blocks, nb, m, 0)

    ab = ld(ab_ref).astype(compute_dtype)
    a0 = ab[0:1, :]
    a1 = ab[1:2, :]
    for b in su_blocks:
        xr[b] = xr[b] + su_ref[m * b : m * (b + 1), 0:1] * a0
    for b in sl_blocks:
        xr[b] = xr[b] + sl_ref[m * b : m * (b + 1), 0:1] * a1

    for b in range(nb):
        blk = xr[b].astype(out_ref.dtype)
        if squeezed:
            out_ref[m * b : m * (b + 1), :] = blk
        else:
            out_ref[0, m * b : m * (b + 1), :] = blk


def _lane_dist_fold_kernel(
    f_ref,
    hl_ref,
    hr_ref,
    ab_ref,
    t_ref,
    e_ref,
    d_ref,
    su_ref,
    sl_ref,
    out_ref,
    *,
    n: int,
    nb: int,
    edges_meta,
    d_nonzero,
    d_blocks,
    su_blocks,
    sl_blocks,
    demean: bool,
    compute_dtype,
):
    """One (R, n) row tile, fold form: per-block folded operators + edge
    lanes (in-shard AND halo sources), per-block demean for derivative
    schemes (ops/pallas_lane.py design rules), intra D correction, outer
    rank-2 update."""
    from .pallas_lane import _apply_sparse_corr

    m = BLOCK_LANES
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=compute_dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    f = f_ref[:].astype(compute_dtype)
    srcs = {
        "f": f,
        "l": hl_ref[:].astype(compute_dtype),
        "r": hr_ref[:].astype(compute_dtype),
    }
    xr = []
    ei = 0
    for b in range(nb):
        fb = f[:, m * b : m * (b + 1)]
        mu = jnp.mean(fb, axis=1, keepdims=True) if demean else None
        if mu is not None:
            fb = fb - mu
        x = dot(fb, t_ref[b])
        for src, lane in edges_meta[b]:
            v = srcs[src][:, lane : lane + 1]
            if mu is not None:
                v = v - mu
            x = x + v * e_ref[ei : ei + 1, m * b : m * (b + 1)]
            ei += 1
        xr.append(x)

    xr = _apply_sparse_corr(xr, d_ref, d_nonzero, d_blocks, nb, m, 1)

    a0 = ab_ref[:, 0:1].astype(compute_dtype)
    a1 = ab_ref[:, 1:2].astype(compute_dtype)
    for b in su_blocks:
        xr[b] = xr[b] + a0 * su_ref[0:1, m * b : m * (b + 1)]
    for b in sl_blocks:
        xr[b] = xr[b] + a1 * sl_ref[0:1, m * b : m * (b + 1)]

    for b in range(nb):
        out_ref[:, m * b : m * (b + 1)] = xr[b].astype(out_ref.dtype)


def _sublane_dist_fold_kernel(
    f_ref,
    hl_ref,
    hr_ref,
    ab_ref,
    t_ref,
    e_ref,
    d_ref,
    su_ref,
    sl_ref,
    out_ref,
    *,
    n: int,
    nb: int,
    edges_meta,
    d_nonzero,
    d_blocks,
    su_blocks,
    sl_blocks,
    demean: bool,
    compute_dtype,
    squeezed: bool = False,
):
    """One (n, C) column tile, fold form (transpose of the lane body)."""
    from .pallas_lane import _apply_sparse_corr

    m = BLOCK_LANES
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=compute_dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    ld = (lambda r: r[:]) if squeezed else (lambda r: r[0])
    f = ld(f_ref).astype(compute_dtype)
    srcs = {
        "f": f,
        "l": ld(hl_ref).astype(compute_dtype),
        "r": ld(hr_ref).astype(compute_dtype),
    }
    xr = []
    ei = 0
    for b in range(nb):
        fb = f[m * b : m * (b + 1), :]
        mu = jnp.mean(fb, axis=0, keepdims=True) if demean else None
        if mu is not None:
            fb = fb - mu
        x = dot(t_ref[b], fb)
        for src, lane in edges_meta[b]:
            v = srcs[src][lane : lane + 1, :]
            if mu is not None:
                v = v - mu
            x = x + e_ref[m * b : m * (b + 1), ei : ei + 1] * v
            ei += 1
        xr.append(x)

    xr = _apply_sparse_corr(xr, d_ref, d_nonzero, d_blocks, nb, m, 0)

    ab = ld(ab_ref).astype(compute_dtype)
    a0 = ab[0:1, :]
    a1 = ab[1:2, :]
    for b in su_blocks:
        xr[b] = xr[b] + su_ref[m * b : m * (b + 1), 0:1] * a0
    for b in sl_blocks:
        xr[b] = xr[b] + sl_ref[m * b : m * (b + 1), 0:1] * a1

    for b in range(nb):
        blk = xr[b].astype(out_ref.dtype)
        if squeezed:
            out_ref[m * b : m * (b + 1), :] = blk
        else:
            out_ref[0, m * b : m * (b + 1), :] = blk


def _fold_statics(slt):
    return dict(
        nb=slt.nb,
        edges_meta=slt.edges_meta,
        d_nonzero=slt.d_nonzero,
        d_blocks=slt.d_blocks,
        su_blocks=slt.su_blocks,
        sl_blocks=slt.sl_blocks,
        demean=slt.demean,
        compute_dtype=jnp.float32,
    )


def _statics(slt, scheme):
    return dict(
        nb=slt.nb,
        scheme=scheme,
        cut_meta=slt.cut_meta,
        d_nonzero=slt.d_nonzero,
        d_blocks=slt.d_blocks,
        q_blocks=slt.q_blocks,
        su_blocks=slt.su_blocks,
        sl_blocks=slt.sl_blocks,
        compute_dtype=jnp.float32,
    )


def lane_dist_derivative(
    f: jax.Array,
    hl: jax.Array,
    hr: jax.Array,
    ab: jax.Array,
    dx,
    tabs,
    scheme: CompactScheme,
    slt,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Shard-local lane-axis solve: ``f`` (..., nl) local block, ``hl``/``hr``
    (..., w) halo lanes, ``ab`` (..., 2) outer interface weights. ``tabs``
    is this shard's (Tm, D, Qd, suh, slh) slice (traced); ``slt`` the
    static LaneShardTables metadata."""
    n = f.shape[-1]
    w = hl.shape[-1]
    bshape = f.shape[:-1]
    B = int(np.prod(bshape)) if bshape else 1
    cdt = jnp.float32
    if hasattr(slt, "edges_meta"):  # fold form (d2 / filters / any order)
        Mt, E, D, suh, slh = tabs
        scale = (
            jnp.asarray(1.0, cdt) / jnp.asarray(dx, cdt)
        ) ** scheme.derivative_order
        kernel = functools.partial(
            _lane_dist_fold_kernel, n=n, **_fold_statics(slt)
        )
        tables = (
            Mt.astype(cdt) * scale,
            E.astype(cdt) * scale,
            D.astype(cdt),
            suh.astype(cdt).reshape(1, n),
            slh.astype(cdt).reshape(1, n),
        )
    else:  # roll form (first derivatives)
        Tm, D, Qd, suh, slh = tabs
        single = len(scheme.rhs_offsets) == 1
        wfold = scheme.rhs_weights[0] if single else 1.0
        scale = jnp.asarray(wfold, cdt) / jnp.asarray(dx, cdt)
        kernel = functools.partial(
            _lane_dist_kernel, n=n, wfold=wfold, **_statics(slt, scheme)
        )
        tables = (
            Tm.astype(cdt) * scale,
            D.astype(cdt),
            Qd.astype(cdt) * scale,
            suh.astype(cdt).reshape(1, n),
            slh.astype(cdt).reshape(1, n),
        )
    rows = min(_pick_rows(n, 4), max(8, -(-B // 8) * 8))
    Bp = -(-B // rows) * rows
    pad = (
        (lambda a: jnp.pad(a.reshape(B, a.shape[-1]), ((0, Bp - B), (0, 0))))
        if Bp != B
        else (lambda a: a.reshape(B, a.shape[-1]))
    )
    f2, hl2, hr2 = pad(f.astype(cdt)), pad(hl.astype(cdt)), pad(hr.astype(cdt))
    ab2 = pad(ab.astype(cdt))
    whole = lambda *shape: pl.BlockSpec(
        shape, lambda j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    rblock = lambda width: pl.BlockSpec(
        (rows, width), lambda j: (j, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, n), cdt),
        grid=(Bp // rows,),
        in_specs=[rblock(n), rblock(w), rblock(w), rblock(2)]
        + [whole(*t.shape) for t in tables],
        out_specs=rblock(n),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * Bp,
            bytes_accessed=2 * n * Bp * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(f2, hl2, hr2, ab2, *tables)
    if Bp != B:
        out = out[:B]
    return out.reshape(bshape + (n,)).astype(f.dtype)


def sublane_dist_derivative(
    f: jax.Array,
    hl: jax.Array,
    hr: jax.Array,
    ab: jax.Array,
    dx,
    tabs,
    scheme: CompactScheme,
    slt,
    *,
    axis: int,
    interpret: bool = False,
) -> jax.Array:
    """Shard-local solve along non-minor ``axis``: trailing dims merge into
    the lane dimension (ops/pallas_sublane.py layout). ``hl``/``hr`` carry
    w halo planes along ``axis``; ``ab`` two interface planes."""
    axis = axis % f.ndim
    n = f.shape[axis]
    w = hl.shape[axis]
    cdt = jnp.float32
    fold = hasattr(slt, "edges_meta")
    if fold:  # fold form (d2 / filters / any order)
        Mt, E, D, suh, slh = tabs
        scale = (
            jnp.asarray(1.0, cdt) / jnp.asarray(dx, cdt)
        ) ** scheme.derivative_order
        kernel = functools.partial(
            _sublane_dist_fold_kernel, n=n, **_fold_statics(slt)
        )
    else:  # roll form (first derivatives)
        Tm, D, Qd, suh, slh = tabs
        single = len(scheme.rhs_offsets) == 1
        wfold = scheme.rhs_weights[0] if single else 1.0
        scale = jnp.asarray(wfold, cdt) / jnp.asarray(dx, cdt)
        kernel = functools.partial(
            _sublane_dist_kernel, n=n, wfold=wfold, **_statics(slt, scheme)
        )
    lead = f.shape[:axis]
    B = int(np.prod(lead)) if lead else 1
    L = int(np.prod(f.shape[axis + 1 :]))
    as3 = lambda a, rows: a.astype(cdt).reshape(B, rows, L)
    f3 = as3(f, n)
    hl3, hr3, ab3 = as3(hl, w), as3(hr, w), as3(ab, 2)
    cols = min(_pick_cols(n, 4), max(_LANE, -(-L // _LANE) * _LANE))
    Lp = -(-L // cols) * cols
    if Lp != L:
        padl = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, Lp - L)))
        f3, hl3, hr3, ab3 = padl(f3), padl(hl3), padl(hr3), padl(ab3)
    # tables in left-dot orientation
    sut = suh.astype(cdt).reshape(n, 1)
    slt_ = slh.astype(cdt).reshape(n, 1)
    if fold:
        tables = (
            jnp.transpose(Mt.astype(cdt), (0, 2, 1)) * scale,
            E.astype(cdt).T * scale,
            D.astype(cdt).T,
            sut,
            slt_,
        )
    else:
        tables = (
            jnp.transpose(Tm.astype(cdt), (0, 2, 1)) * scale,
            D.astype(cdt).T,
            Qd.astype(cdt).T * scale,
            sut,
            slt_,
        )
    est = dict(
        cost_estimate=pl.CostEstimate(
            flops=8 * n * B * Lp,
            bytes_accessed=2 * n * B * Lp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    whole1 = lambda *shape: pl.BlockSpec(
        shape, lambda j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    whole2 = lambda *shape: pl.BlockSpec(
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    if B == 1:
        cblock = lambda rows: pl.BlockSpec(
            (rows, cols), lambda j: (0, j), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(kernel, squeezed=True),
            out_shape=jax.ShapeDtypeStruct((n, Lp), cdt),
            grid=(Lp // cols,),
            in_specs=[cblock(n), cblock(w), cblock(w), cblock(2)]
            + [whole1(*t.shape) for t in tables],
            out_specs=cblock(n),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            **est,
        )(f3[0], hl3[0], hr3[0], ab3[0], *tables)[None]
    else:
        cblock = lambda rows: pl.BlockSpec(
            (1, rows, cols), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(kernel, squeezed=False),
            out_shape=jax.ShapeDtypeStruct((B, n, Lp), cdt),
            grid=(B, Lp // cols),
            in_specs=[cblock(n), cblock(w), cblock(w), cblock(2)]
            + [whole2(*t.shape) for t in tables],
            out_specs=cblock(n),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            **est,
        )(f3, hl3, hr3, ab3, *tables)
    if Lp != L:
        out = out[:, :, :L]
    return out.reshape(f.shape).astype(f.dtype)
