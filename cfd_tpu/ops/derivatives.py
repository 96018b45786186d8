"""Single-device compact derivative API (jit/vmap-clean).

The counterpart of the reference's ``CompactFiniteDifferenceSolver.dfdx``
(/root/reference/code/cuda/compact.py:29-44) and the OpenCL variant's
``dfdy``/``dfdz`` (code/ocl/compact.py:41-61) — but with on-device axis
handling (XLA transposes) instead of host round-trip transposes, and with all
RHS-independent solver tables precomputed at trace time instead of per-call
scipy solves on the host (compact.py:150-153).

Array convention follows the reference: fields are ``[..., nz, ny, nx]`` with
x the fastest axis; ``dfdx`` differentiates the last axis.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..schemes import SCHEME4, CompactScheme, lhs_bands
from . import tridiag
from .rhs import compact_rhs

__all__ = [
    "line_factors",
    "derivative",
    "dfdx",
    "dfdy",
    "dfdz",
    "gradient",
    "divergence",
    "curl",
]

_METHODS = ("auto", "pcr", "thomas", "pallas", "matmul")


def resolve_method(method: str, dtype, n: int) -> str:
    """Resolve 'auto' to the fastest backend for this dtype/backend/size.

    On TPU: the dense-operator MXU path wins for line lengths up to ~512
    (measured on v5e; its FLOPs/point grow linearly with n), the fused
    Pallas kernel beyond; float64 and CPU take the XLA-level PCR path.
    """
    if method != "auto":
        return method
    if dtype == jnp.float64 or jax.default_backend() == "cpu":
        return "pcr"
    return "matmul" if n <= 512 else "pallas"


@functools.lru_cache(maxsize=None)
def dense_operator(scheme: CompactScheme, n: int):
    """Dense derivative operator M = T^{-1} B (float64 numpy, (n, n)).

    The compact derivative is linear in f: f' = T^{-1} B f / dx. For line
    lengths up to a few thousand, applying M as a single matmul puts the
    work on the MXU with exactly one read of f and one write of f' — the
    most TPU-native formulation of the scheme (the systolic array trades
    n extra flops/point for zero recurrences and zero layout changes).
    Precomputed once per (scheme, n) in float64.
    """
    from ..schemes import rhs_matrix

    B = rhs_matrix(scheme, n)
    dl, d, du = lhs_bands(scheme, n)
    T = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
    if scheme.periodic:
        T[0, -1] = scheme.alpha
        T[-1, 0] = scheme.alpha
    return np.linalg.solve(T, B)


@functools.lru_cache(maxsize=None)
def line_factors(
    scheme: CompactScheme,
    n: int,
    method: str = "auto",
    first_block: bool = True,
    last_block: bool = True,
):
    """Precomputed solver tables for an ``n``-point line of ``scheme``.

    Cached per (scheme, n, method, block position); the numpy tables become
    trace-time constants, so jitted derivative calls carry zero setup cost —
    the TPU analogue of the reference's per-solver coefficient precompute
    (templated/near_toeplitz.py:109-184) without its host round trips.
    """
    core_method = "thomas" if method == "thomas" else "pcr"
    if method not in _METHODS:
        raise ValueError(f"unknown solver method {method!r}; expected {_METHODS}")
    bands = lhs_bands(scheme, n, first_block=first_block, last_block=last_block)
    if scheme.periodic:
        if not (first_block and last_block):
            raise ValueError("periodic factors are only defined for a full line")
        return tridiag.cyclic_factor(
            *bands, scheme.alpha, scheme.alpha, method=core_method
        )
    return tridiag.factor(*bands, method=core_method)


def _derivative_lines(f, dx, scheme, method, interpret=False):
    """Derivative along axis 0 of ``f`` (n, *batch)."""
    if method == "pallas":
        from .pallas_fused import fused_derivative_lines

        return fused_derivative_lines(f, dx, scheme, interpret=interpret)
    rhs = compact_rhs(f, dx, scheme)
    fac = line_factors(scheme, f.shape[0], method)
    return tridiag.solve(fac, rhs)


def derivative(
    f: jax.Array,
    dx,
    scheme: CompactScheme = SCHEME4,
    *,
    axis: int = -1,
    method: str = "auto",
    matmul_precision: str = "highest",
) -> jax.Array:
    """Compact first derivative of ``f`` along ``axis`` with spacing ``dx``.

    ``method`` selects the backend: 'auto' (default; picks per dtype/backend/
    size, see ``resolve_method``), 'matmul' (dense operator on the MXU),
    'pallas' (fused RHS+Thomas TPU kernel; f32/bf16), 'pcr' (axis-aware
    table-driven parallel cyclic reduction at the XLA level — any backend,
    any dtype) or 'thomas' (scan-based LU).
    """
    if method not in _METHODS:
        raise ValueError(f"unknown solver method {method!r}; expected {_METHODS}")
    axis = axis % f.ndim
    method = resolve_method(method, f.dtype, f.shape[axis])
    if method == "matmul":
        M = jnp.asarray(dense_operator(scheme, f.shape[axis]), f.dtype)
        # MXU passes for f32 inputs: 'highest' (bf16x6, ~1e-6 abs err on
        # smooth fields) is the default; 'high' (bf16x3) halves the MXU cost
        # but coherent truncation on smooth data costs ~1e-4 absolute. bf16
        # inputs always take the fast single pass.
        prec = matmul_precision if f.dtype != jnp.bfloat16 else None
        out = jnp.tensordot(f, M, axes=([axis], [1]), precision=prec)
        # tensordot appends M's free dim at the end; restore the axis position
        out = jnp.moveaxis(out, -1, axis)
        return out / jnp.asarray(dx, f.dtype)
    if method == "pcr":
        # fully axis-aware: stencil and PCR shifts run in the field's native
        # layout — no transposes, every op is a fused shifted multiply-add
        rhs = compact_rhs(f, dx, scheme, axis=axis)
        fac = line_factors(scheme, f.shape[axis], method)
        return tridiag.solve(fac, rhs, axis=axis)
    ft = jnp.moveaxis(f, axis, 0)
    x = _derivative_lines(ft, dx, scheme, method)
    return jnp.moveaxis(x, 0, axis)


def dfdx(f, dx, scheme: CompactScheme = SCHEME4, *, method: str = "auto", **kw):
    """d/dx — derivative along the last axis of ``[..., nz, ny, nx]``."""
    return derivative(f, dx, scheme, axis=-1, method=method, **kw)


def dfdy(f, dy, scheme: CompactScheme = SCHEME4, *, method: str = "auto", **kw):
    """d/dy — derivative along the second-to-last axis."""
    return derivative(f, dy, scheme, axis=-2, method=method, **kw)


def dfdz(f, dz, scheme: CompactScheme = SCHEME4, *, method: str = "auto", **kw):
    """d/dz — derivative along the third-to-last axis."""
    return derivative(f, dz, scheme, axis=-3, method=method, **kw)


def _spacings3(spacing):
    if jnp.ndim(spacing) == 0 or isinstance(spacing, (int, float)):
        return (spacing, spacing, spacing)
    dz, dy, dx = spacing
    return (dz, dy, dx)


def gradient(
    f: jax.Array,
    spacing,
    scheme: CompactScheme = SCHEME4,
    *,
    method: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(df/dx, df/dy, df/dz) of a scalar field ``[..., nz, ny, nx]``.

    ``spacing`` is a scalar or (dz, dy, dx).
    """
    dz, dy, dx = _spacings3(spacing)
    return (
        dfdx(f, dx, scheme, method=method),
        dfdy(f, dy, scheme, method=method),
        dfdz(f, dz, scheme, method=method),
    )


def divergence(
    u: Sequence[jax.Array],
    spacing,
    scheme: CompactScheme = SCHEME4,
    *,
    method: str = "auto",
) -> jax.Array:
    """div(u) for a 3-component vector field (ux, uy, uz)."""
    ux, uy, uz = u
    dz, dy, dx = _spacings3(spacing)
    return (
        dfdx(ux, dx, scheme, method=method)
        + dfdy(uy, dy, scheme, method=method)
        + dfdz(uz, dz, scheme, method=method)
    )


def curl(
    u: Sequence[jax.Array],
    spacing,
    scheme: CompactScheme = SCHEME4,
    *,
    method: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """curl(u) for a 3-component vector field (ux, uy, uz)."""
    ux, uy, uz = u
    dz, dy, dx = _spacings3(spacing)
    duz_dy = dfdy(uz, dy, scheme, method=method)
    duy_dz = dfdz(uy, dz, scheme, method=method)
    dux_dz = dfdz(ux, dz, scheme, method=method)
    duz_dx = dfdx(uz, dx, scheme, method=method)
    duy_dx = dfdx(uy, dx, scheme, method=method)
    dux_dy = dfdy(ux, dy, scheme, method=method)
    return (duz_dy - duy_dz, dux_dz - duz_dx, duy_dx - dux_dy)
