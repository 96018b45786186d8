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

Boundary closures are folded into ghost rows (ops/rhs.closure_ghosts), so
the in-kernel stencil is uniform — no divergent first/last tiles (the
reference gates on ``mx == 0 && ix == 0`` inside the kernel,
kernels.cu:36-46). Periodic lines reuse the same kernel plus an in-VMEM
Sherman–Morrison rank-1 correction pass.

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

__all__ = ["fused_derivative_lines", "solve_lines_pallas", "LANE", "DEFAULT_SUBLANES"]

LANE = 128
DEFAULT_SUBLANES = 16  # lines per step = DEFAULT_SUBLANES * LANE


def _stencil(scheme: CompactScheme) -> Tuple[Tuple[int, float], ...]:
    return tuple(zip(scheme.rhs_offsets, scheme.rhs_weights))


def _fused_kernel(
    inv_dx_ref,
    f_ref,
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

    f_ref:   (n + 2*halo, S, 128) — extended field block (ghosts included)
    w/invd/du/q_ref: (n,) SMEM scalar tables
    out_ref: (n, S, 128)
    """
    inv_dx = inv_dx_ref[0]

    def rhs_row(i):
        r = None
        for k, wt in stencil:
            hi = f_ref[pl.ds(i + halo + k, 1)]
            lo = f_ref[pl.ds(i + halo - k, 1)]
            term = wt * (hi - lo)
            r = term if r is None else r + term
        return r * inv_dx

    def fwd(i, y_prev):
        y = rhs_row(i) - w_ref[i] * y_prev
        out_ref[pl.ds(i, 1)] = y
        return y

    zero = jnp.zeros((1,) + out_ref.shape[1:], out_ref.dtype)
    jax.lax.fori_loop(0, n, fwd, zero)

    def bwd(j, x_next):
        i = n - 1 - j
        x = (out_ref[pl.ds(i, 1)] - du_ref[i] * x_next) * invd_ref[i]
        out_ref[pl.ds(i, 1)] = x
        return x

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
def _call_fused_tables(
    f_ext, inv_dx, w, invd, du, q, *, stencil, sm_params, n, halo, sublanes, interpret
):
    """f_ext: (n + 2*halo, B) with B % (sublanes*LANE) == 0."""
    B = f_ext.shape[1]
    S = sublanes
    f_blocks = f_ext.reshape(n + 2 * halo, B // LANE, LANE)
    grid = (B // (S * LANE),)
    kernel = functools.partial(
        _fused_kernel,
        n=n,
        halo=halo,
        stencil=stencil,
        sm_params=sm_params,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, B // LANE, LANE), f_ext.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inv_dx (1,)
            pl.BlockSpec(
                (n + 2 * halo, S, LANE),
                lambda j: (0, j, 0),
                memory_space=pltpu.VMEM,
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
            bytes_accessed=(2 * n + 2 * halo) * B * f_ext.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(inv_dx, f_blocks, w, invd, du, q)
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


def solve_lines_pallas(
    f_ext: jax.Array,
    inv_dx,
    scheme: CompactScheme,
    *,
    sublanes: int = DEFAULT_SUBLANES,
    interpret: bool = False,
) -> jax.Array:
    """Fused derivative of extended lines ``f_ext`` of shape (n+2w, B).

    The first/last ``w = scheme.stencil_width`` rows are ghost rows (closure
    ghosts at physical boundaries, halo data at shard interfaces, wrap rows
    for periodic schemes). Returns (n, B).
    """
    halo = scheme.stencil_width
    n = f_ext.shape[0] - 2 * halo
    B = f_ext.shape[1]
    tile = sublanes * LANE
    Bp = -(-B // tile) * tile
    if Bp != B:
        f_ext = jnp.pad(f_ext, ((0, 0), (0, Bp - B)))
    w, invd, du, q = _kernel_tables(scheme, n)
    dt = f_ext.dtype
    inv_dx_arr = jnp.asarray(inv_dx, dt).reshape(1)
    out = _call_fused_tables(
        f_ext,
        inv_dx_arr,
        jnp.asarray(w, dt),
        jnp.asarray(invd, dt),
        jnp.asarray(du, dt),
        jnp.asarray(q, dt),
        stencil=_stencil(scheme),
        sm_params=_sm_params(scheme, n),
        n=n,
        halo=halo,
        sublanes=sublanes,
        interpret=interpret,
    )
    return out[:, :B] if Bp != B else out


def solve_lines_tables_pallas(
    f_ext: jax.Array,
    inv_dx,
    w: jax.Array,
    invd: jax.Array,
    du: jax.Array,
    *,
    scheme: CompactScheme,
    sublanes: int = DEFAULT_SUBLANES,
    interpret: bool = False,
) -> jax.Array:
    """Fused stencil+Thomas with caller-supplied (traced) factor tables.

    Used by the distributed path, where each shard's local block matrix
    differs (boundary vs interior blocks) and the tables arrive as sharded
    operands rather than trace-time constants. Always acyclic (the
    inter-shard couplings are carried by the substructuring method).
    """
    halo = scheme.stencil_width
    n = f_ext.shape[0] - 2 * halo
    B = f_ext.shape[1]
    tile = sublanes * LANE
    Bp = -(-B // tile) * tile
    if Bp != B:
        f_ext = jnp.pad(f_ext, ((0, 0), (0, Bp - B)))
    dt = f_ext.dtype
    out = _call_fused_tables(
        f_ext,
        jnp.asarray(inv_dx, dt).reshape(1),
        w.astype(dt),
        invd.astype(dt),
        du.astype(dt),
        jnp.zeros((n,), dt),
        stencil=_stencil(scheme),
        sm_params=None,
        n=n,
        halo=halo,
        sublanes=sublanes,
        interpret=interpret,
    )
    return out[:, :B] if Bp != B else out


def fused_derivative_lines(
    f: jax.Array,
    dx,
    scheme: CompactScheme,
    *,
    sublanes: int = DEFAULT_SUBLANES,
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
    halo = scheme.stencil_width
    gl, gr = closure_ghosts(flat, scheme)
    f_ext = jnp.concatenate([gl, flat, gr], axis=0)
    assert f_ext.shape[0] == n + 2 * halo
    out = solve_lines_pallas(
        f_ext,
        jnp.asarray(1.0, compute_dtype) / jnp.asarray(dx, compute_dtype),
        scheme,
        sublanes=sublanes,
        interpret=interpret,
    )
    return out.reshape((n,) + bshape).astype(f.dtype)
