"""Fused compact-RHS + tridiagonal-solve Pallas TPU kernel.

One kernel pass per pencil block replaces three reference CUDA kernels —
``computeRHS`` (kernels.cu:4-47), the cyclic-reduction solver pair
(templated/kernels.jinja2, globalmem/kernels.cu) and the per-line scaling —
reading each field value from HBM exactly once and writing the derivative
exactly once. That makes the op HBM-bandwidth-bound by construction
(BASELINE.json north star), instead of the reference's multi-kernel,
multi-pass pipeline.

Layout: lines live along the *leading* (untiled) axis; the batch of lines
fills the (sublane, lane) = (S, 128) tile, so every step of the sequential
Thomas recurrence is a full-width VPU op over S*128 independent lines. The
per-row scalar tables (forward multipliers w, inverse pivots 1/d̂, super-
diagonal du — precomputed once in float64, see ops/tridiag.thomas_factor)
live in SMEM.

Boundary closures are folded into ghost rows (ops/rhs.closure_ghosts) that
enter the kernel as separate small inputs — no concatenation pass over the
field, and the in-kernel stencil stays uniform (the reference instead gates
on ``mx == 0 && ix == 0`` inside the kernel, kernels.cu:36-46). Periodic
lines reuse the same kernel plus an in-VMEM Sherman–Morrison rank-1
correction pass.

float32/bfloat16 only (TPU hardware dtypes); float64 callers are routed to
the XLA-level PCR path by ``ops.derivatives``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..schemes import CompactScheme
from . import tridiag
from .rhs import closure_ghosts

__all__ = [
    "fused_derivative_lines",
    "solve_lines_pallas",
    "solve_lines_tables_pallas",
    "LANE",
    "DEFAULT_SUBLANES",
]

LANE = 128
DEFAULT_SUBLANES = None  # auto: largest power of two keeping VMEM in budget


def _auto_sublanes(n: int, itemsize: int = 4) -> int:
    """Largest power-of-two sublane count with in+out double-buffered blocks
    under ~12 MB of VMEM (16 MB/core minus tables and headroom)."""
    budget = 12 * 1024 * 1024
    s = 16
    # f32 blocks need at least 8 sublanes (TPU tile constraint); below that
    # Mosaic falls back to reduced buffering rather than smaller blocks
    while s > 8 and 2 * (2 * n + 8) * s * LANE * itemsize > budget:
        s //= 2
    return s


def _stencil(scheme: CompactScheme):
    """Static RHS description: (taps, sign of f[i-k], centre weight, order)."""
    return (
        tuple(zip(scheme.rhs_offsets, scheme.rhs_weights)),
        scheme.rhs_sign,
        scheme.rhs_center,
        scheme.derivative_order,
    )


def _fused_kernel(
    inv_dx_ref,
    f_ref,
    gl_ref,
    gr_ref,
    w_ref,
    invd_ref,
    du_ref,
    q_ref,
    out_ref,
    *,
    n: int,
    halo: int,
    stencil,
    sm_params,
):
    """RHS assembly fused with the Thomas sweeps, batch in (S, 128) tiles.

    f_ref:        (n, S, 128) — field block
    gl_ref/gr_ref:(halo, S, 128) — ghost/halo rows left/right of the block
    w/invd/du/q_ref: (n,) SMEM scalar tables
    out_ref:      (n, S, 128)
    """
    taps, sgn, c0, dord = stencil
    inv_dx = 1.0  # reciprocal spacing -> 1/dx**order (order is static;
    for _ in range(dord):  # order 0 = filters: no spacing scale at all)
        inv_dx = inv_dx * inv_dx_ref[0]

    def row(i):
        """f at line-index i, i in [-halo, n+halo), from the right buffer."""
        if i < 0:
            return gl_ref[pl.ds(halo + i, 1)]
        if i >= n:
            return gr_ref[pl.ds(i - n, 1)]
        return f_ref[pl.ds(i, 1)]

    def pair(a, b):
        # keep the factored w*(a -/+ b) form: for first derivatives the
        # difference cancels exactly in f32 before the weight multiply
        return (a - b) if sgn < 0 else (a + b)

    def rhs_static(i):
        """RHS at static row i (edge rows, unrolled)."""
        r = None
        for k, wt in taps:
            term = wt * pair(row(i + k), row(i - k))
            r = term if r is None else r + term
        if c0:
            r = r + c0 * row(i)
        return r * inv_dx

    def rhs_dyn(i):
        """RHS at traced row i, valid only for halo <= i < n - halo."""
        r = None
        for k, wt in taps:
            term = wt * pair(f_ref[pl.ds(i + k, 1)], f_ref[pl.ds(i - k, 1)])
            r = term if r is None else r + term
        if c0:
            r = r + c0 * f_ref[pl.ds(i, 1)]
        return r * inv_dx

    # ---- forward sweep: y[i] = rhs[i] - w[i] * y[i-1] ---------------------
    y = jnp.zeros((1,) + out_ref.shape[1:], out_ref.dtype)
    for i in range(halo):  # left edge rows, ghosts in play (unrolled)
        y = rhs_static(i) - w_ref[i] * y
        out_ref[pl.ds(i, 1)] = y

    def fwd(i, y_prev):
        yi = rhs_dyn(i) - w_ref[i] * y_prev
        out_ref[pl.ds(i, 1)] = yi
        return yi

    y = jax.lax.fori_loop(halo, n - halo, fwd, y)
    for i in range(n - halo, n):  # right edge rows (unrolled)
        y = rhs_static(i) - w_ref[i] * y
        out_ref[pl.ds(i, 1)] = y

    # ---- backward sweep: x[i] = (y[i] - du[i] * x[i+1]) / dhat[i] ---------
    def bwd(j, x_next):
        i = n - 1 - j
        x = (out_ref[pl.ds(i, 1)] - du_ref[i] * x_next) * invd_ref[i]
        out_ref[pl.ds(i, 1)] = x
        return x

    zero = jnp.zeros((1,) + out_ref.shape[1:], out_ref.dtype)
    jax.lax.fori_loop(0, n, bwd, zero)

    if sm_params is not None:
        # periodic: rank-1 Sherman–Morrison correction x -= q * (v·x)/denom
        v0, vn, inv_denom = sm_params
        vy = (v0 * out_ref[pl.ds(0, 1)] + vn * out_ref[pl.ds(n - 1, 1)]) * inv_denom

        def sm(i, _):
            out_ref[pl.ds(i, 1)] = out_ref[pl.ds(i, 1)] - q_ref[i] * vy
            return 0

        jax.lax.fori_loop(0, n, sm, 0)


@functools.partial(
    jax.jit,
    static_argnames=("stencil", "sm_params", "n", "halo", "sublanes", "interpret"),
)
def _call_fused(
    f, gl, gr, inv_dx, w, invd, du, q, *, stencil, sm_params, n, halo, sublanes, interpret
):
    """f: (n, B); gl/gr: (halo, B); B % (sublanes*LANE) == 0."""
    B = f.shape[1]
    S = sublanes
    blocks = B // LANE
    kernel = functools.partial(
        _fused_kernel,
        n=n,
        halo=halo,
        stencil=stencil,
        sm_params=sm_params,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, blocks, LANE), f.dtype),
        grid=(B // (S * LANE),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inv_dx (1,)
            pl.BlockSpec((n, S, LANE), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (halo, S, LANE), lambda j: (0, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (halo, S, LANE), lambda j: (0, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w (n,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # invd (n,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # du (n,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # q (n,)
        ],
        out_specs=pl.BlockSpec(
            (n, S, LANE), lambda j: (0, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * B,
            bytes_accessed=2 * n * B * f.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        inv_dx,
        f.reshape(n, blocks, LANE),
        gl.reshape(halo, blocks, LANE),
        gr.reshape(halo, blocks, LANE),
        w,
        invd,
        du,
        q,
    )
    return out.reshape(n, B)


@functools.lru_cache(maxsize=None)
def _cyclic_fac(scheme: CompactScheme, n: int):
    from ..schemes import lhs_bands

    return tridiag.cyclic_factor(
        *lhs_bands(scheme, n), scheme.alpha, scheme.alpha, method="thomas"
    )


@functools.lru_cache(maxsize=None)
def _sm_params(scheme: CompactScheme, n: int):
    if not scheme.periodic:
        return None
    fac = _cyclic_fac(scheme, n)
    return (float(fac.v0), float(fac.vn), float(fac.inv_denom))


@functools.lru_cache(maxsize=None)
def _kernel_tables(scheme: CompactScheme, n: int):
    """(w, invd, du, q) float32 numpy tables for the kernel."""
    from ..schemes import lhs_bands

    if scheme.periodic:
        fac = _cyclic_fac(scheme, n)
        core = fac.core
        q = fac.q
    else:
        core = tridiag.thomas_factor(*lhs_bands(scheme, n))
        q = np.zeros(n)
    f32 = lambda a: np.asarray(a, np.float32)
    return f32(core.w), f32(core.invd), f32(core.du), f32(q)



def _solve_parts(
    f, gl, gr, inv_dx, w, invd, du, q, *, stencil, sm_params, sublanes, interpret
):
    n, B = f.shape
    halo = gl.shape[0]
    if sublanes is None:
        sublanes = _auto_sublanes(n, f.dtype.itemsize)
    tile = sublanes * LANE
    Bp = -(-B // tile) * tile
    if Bp != B:
        pad = ((0, 0), (0, Bp - B))
        f, gl, gr = jnp.pad(f, pad), jnp.pad(gl, pad), jnp.pad(gr, pad)
    dt = f.dtype
    out = _call_fused(
        f,
        gl,
        gr,
        jnp.asarray(inv_dx, dt).reshape(1),
        w.astype(dt),
        invd.astype(dt),
        du.astype(dt),
        q.astype(dt),
        stencil=stencil,
        sm_params=sm_params,
        n=n,
        halo=halo,
        sublanes=sublanes,
        interpret=interpret,
    )
    return out[:, :B] if Bp != B else out


def solve_lines_pallas(
    f: jax.Array,
    inv_dx,
    scheme: CompactScheme,
    gl: jax.Array = None,
    gr: jax.Array = None,
    *,
    sublanes=DEFAULT_SUBLANES,
    interpret: bool = False,
) -> jax.Array:
    """Fused derivative of lines ``f`` of shape (n, B) with trace-time tables.

    ``gl``/``gr`` are the (w, B) ghost/halo rows left/right of the block
    (closure ghosts at physical boundaries, wrap rows for periodic). If
    omitted they are derived from ``scheme`` and ``f``.
    """
    if gl is None or gr is None:
        gl, gr = closure_ghosts(f, scheme)
    n = f.shape[0]
    w, invd, du, q = _kernel_tables(scheme, n)
    dt = f.dtype
    return _solve_parts(
        f,
        gl,
        gr,
        inv_dx,
        jnp.asarray(w, dt),
        jnp.asarray(invd, dt),
        jnp.asarray(du, dt),
        jnp.asarray(q, dt),
        stencil=_stencil(scheme),
        sm_params=_sm_params(scheme, n),
        sublanes=sublanes,
        interpret=interpret,
    )


def solve_lines_tables_pallas(
    f: jax.Array,
    gl: jax.Array,
    gr: jax.Array,
    inv_dx,
    w: jax.Array,
    invd: jax.Array,
    du: jax.Array,
    *,
    scheme: CompactScheme,
    sublanes=DEFAULT_SUBLANES,
    interpret: bool = False,
) -> jax.Array:
    """Fused stencil+Thomas with caller-supplied (traced) factor tables.

    Used by the distributed path, where each shard's local block matrix
    differs (boundary vs interior blocks) and the tables arrive as sharded
    operands rather than trace-time constants; halo rows gl/gr arrive from
    ppermute. Always acyclic (inter-shard couplings ride the substructuring
    method)."""
    return _solve_parts(
        f,
        gl,
        gr,
        inv_dx,
        w,
        invd,
        du,
        jnp.zeros((f.shape[0],), f.dtype),
        stencil=_stencil(scheme),
        sm_params=None,
        sublanes=sublanes,
        interpret=interpret,
    )


def fused_derivative_lines(
    f: jax.Array,
    dx,
    scheme: CompactScheme,
    *,
    sublanes=DEFAULT_SUBLANES,
    interpret: bool = False,
) -> jax.Array:
    """Derivative along axis 0 of ``f`` (n, *batch) via the fused kernel."""
    if f.dtype == jnp.float64:
        raise ValueError(
            "the Pallas path supports float32/bfloat16 only; use method='pcr' "
            "for float64 (oracle-parity) runs"
        )
    n = f.shape[0]
    bshape = f.shape[1:]
    compute_dtype = jnp.float32 if f.dtype == jnp.bfloat16 else f.dtype
    flat = f.reshape(n, -1).astype(compute_dtype)
    out = solve_lines_pallas(
        flat,
        jnp.asarray(1.0, compute_dtype) / jnp.asarray(dx, compute_dtype),
        scheme,
        sublanes=sublanes,
        interpret=interpret,
    )
    return out.reshape((n,) + bshape).astype(f.dtype)
