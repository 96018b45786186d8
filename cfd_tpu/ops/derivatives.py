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
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..schemes import SCHEME4, SCHEME4_D2, CompactScheme, lhs_bands
from . import tridiag
from .rhs import compact_rhs

__all__ = [
    "line_factors",
    "derivative",
    "dfdx",
    "dfdy",
    "dfdz",
    "d2fdx2",
    "d2fdy2",
    "d2fdz2",
    "gradient",
    "divergence",
    "curl",
    "laplacian",
    "filter_field",
]

_METHODS = ("auto", "pcr", "thomas", "pallas", "matmul", "stencil")


def resolve_method(
    method: str,
    dtype,
    n: int,
    minor_axis: bool = False,
    second_minor: bool = False,
    derivative_order: int = 1,
    leading: bool = False,
) -> str:
    """Resolve 'auto' to the fastest backend for this dtype/backend/size.

    On TPU (measured, v5e): along the minor (lane) axis the fused lane
    kernel wins wherever it applies (63-70 vs the dense MXU operator's
    48-54 Gpt/s at 256^3, 1.8x at n=512 — ops/pallas_lane.py). Along the
    second-minor axis (dfdy) the sublane kernel wins (65 vs 50 Gpt/s at
    256^3, 81 vs 32 at n=512 — its blocks are contiguous HBM slabs there,
    ops/pallas_sublane.py). Along the *leading* axis (dfdz on 3-D fields)
    the round-3 substructured native-layout kernel wins (75 vs 45 Gpt/s at
    256^3 — ops/pallas_leading.py); on other deep axes (4-D fields) the
    dense-operator MXU path stays ahead up to ``_MATMUL_BLOCK``-length
    lines; past that the sublane kernel's O(128) MACs/point win. float64
    and CPU take the XLA-level PCR path.
    """
    if method != "auto":
        return method
    if dtype == jnp.float64 or jax.default_backend() == "cpu":
        return "pcr"
    if leading and dtype == jnp.float32:
        # f32 leading axis: the native-3D substructured kernel wins at every
        # derivative order (measured interleaved vs matmul at 256^3: d1 75
        # vs 45, d2 73 vs 46, filter 64 vs 46 Gpt/s; at 512^3 d1 39 vs 23).
        # bf16 stays on the single-pass matmul (~10x faster there).
        from .pallas_leading import leading_supported

        if leading_supported(None, n, dtype):
            return "pallas"
    if derivative_order != 1:
        # d2/filters: the lane/sublane *fold* form is table-generic and wins
        # where measured (256^3 f32, same-run interleaved): d2 1.9x/1.3x the
        # dense matmul on minor/second-minor axes with equal-or-better
        # accuracy; filters 1.4x on the second-minor axis, but LOSE on the
        # minor axis (0.272 vs 0.228 ms device — the width-3 filter stencil
        # triples the per-block edge-lane FMAs, which are exposed VPU time
        # in the lane orientation, while the matmul runs at auto-HIGH
        # precision for order 0: 73.5 Gpt/s, filter_v5e.json). Deeper axes
        # and long lines take the dense/blocked MXU operator.
        from .pallas_lane import FOLD_MAX, lane_supported

        # n == 128 single-block lines stay on the dense matmul for 'auto':
        # the nb=1 kernel route exists (for the fused pipelines at 128-point
        # shards) but does the same 128 MACs/point as the dense operator
        fold_ok = (
            dtype in (jnp.float32, jnp.bfloat16)
            and 256 <= n <= FOLD_MAX
            and lane_supported(None, n, dtype)
        )
        if fold_ok and (second_minor or (minor_axis and derivative_order == 2)):
            return "pallas"
        return "matmul"
    if dtype == jnp.float32:
        # f32 only: bf16 fields are fastest through the single-pass MXU
        # matmul (325 vs 91 Gpt/s measured at 256^3 — the fused kernels'
        # f32-internal HIGHEST dots are a pure tax there)
        from .pallas_lane import lane_supported

        if minor_axis and n >= 256 and lane_supported(None, n, dtype):
            return "pallas"
        if second_minor and n >= 256 and lane_supported(None, n, dtype):
            return "pallas"
    return "matmul" if n <= _MATMUL_BLOCK else "pallas"


# Block length for the blocked dense path; lines longer than this are split
# into equal blocks coupled through the reduced interface system, exactly the
# distributed substructuring math run shard-locally with zero collectives.
_MATMUL_BLOCK = 512


@functools.lru_cache(maxsize=None)
def _blocked_tables(scheme: CompactScheme, n: int, nb: int):
    """(tinv (nb,m,m), uh (nb,m), lh (nb,m), rinv (2nb,2nb)) float64."""
    from ..parallel.compact import direction_tables

    t = direction_tables(scheme, n, nb)
    rinv = t.rinv_rows.reshape(2 * nb, 2 * nb)
    return t.tinv, t.uh, t.lh, rinv


def _pick_blocks(n: int) -> int:
    """Block count nb such that n/nb is an integer block length in
    [64, _MATMUL_BLOCK], preferring ~256; returns 1 (whole-line dense
    operator) when no such divisor exists (e.g. prime n)."""
    for target in (256, 128, 512, 64):
        if n % target == 0:
            return n // target
    for nb in range(2, n // 64 + 1):
        if n % nb == 0 and 64 <= n // nb <= _MATMUL_BLOCK:
            return nb
    import warnings

    warnings.warn(
        f"line length {n} has no divisor in [64, {_MATMUL_BLOCK}]; the "
        "'matmul' backend falls back to the full dense (n, n) operator — "
        "O(n) FLOPs/point and an O(n^2) table. Consider method='pcr' (any "
        "n) or padding to a multiple of 128 for the fused lane kernel.",
        stacklevel=3,
    )
    return 1


def _letters(k):
    return "abcdefghmnopqrstuvw"[:k]


def _blocked_matmul_derivative(f, dx, scheme, axis, precision):
    """Blocked dense substructuring along ``axis`` (single device).

    The same math as the distributed solve (parallel/compact.py) with the
    "shards" being contiguous blocks of the local line: per-block dense
    inverses (batched MXU matmul), a (2nb, 2nb) reduced interface matmul,
    and a rank-2 update. FLOPs/point stay O(block) for any n.
    """
    n = f.shape[axis]
    nb = _pick_blocks(n)
    if nb == 1:
        M = jnp.asarray(dense_operator(scheme, n), f.dtype)
        out = jnp.tensordot(f, M, axes=([axis], [1]), precision=precision)
        dxp = jnp.asarray(dx, f.dtype) ** scheme.derivative_order
        return jnp.moveaxis(out, -1, axis) / dxp
    m = n // nb
    dtype = f.dtype
    tinv, uh, lh, rinv = _blocked_tables(scheme, n, nb)
    tinv = jnp.asarray(tinv, dtype)
    uh = jnp.asarray(uh, dtype)
    lh = jnp.asarray(lh, dtype)
    rinv = jnp.asarray(rinv, dtype)

    # full-line RHS (closures included), then split the axis into (nb, m)
    rhs = compact_rhs(f, dx, scheme, axis=axis)
    shape2 = f.shape[:axis] + (nb, m) + f.shape[axis + 1 :]
    r2 = rhs.reshape(shape2)

    nd = r2.ndim
    subs = _letters(nd)
    b, i = subs[axis], subs[axis + 1]
    j = "z"
    # x_R = T_b^{-1} r_b : batched over the block index
    xr = jnp.einsum(
        f"{subs},{b}{j}{i}->{subs.replace(i, j)}", r2, tinv, precision=precision
    )

    # interface faces, negated; identity rows at the physical ends demand
    # zeros there (periodic lines keep all faces)
    face_f = -jax.lax.index_in_dim(xr, 0, axis=axis + 1, keepdims=False)
    face_l = -jax.lax.index_in_dim(xr, m - 1, axis=axis + 1, keepdims=False)
    faces = jnp.stack([face_f, face_l], axis=axis + 1)  # (..., nb, 2, ...)
    fshape = faces.shape[:axis] + (2 * nb,) + faces.shape[axis + 2 :]
    faces = faces.reshape(fshape)
    if not scheme.periodic:
        mask = np.ones(2 * nb)
        mask[0] = 0.0
        mask[-1] = 0.0
        mshape = [1] * faces.ndim
        mshape[axis] = 2 * nb
        faces = faces * jnp.asarray(mask, dtype).reshape(mshape)

    # reduced solve: u = Rinv @ faces over the 2nb dim
    fsubs = _letters(faces.ndim)
    e = fsubs[axis]
    u = jnp.einsum(
        f"{fsubs},y{e}->{fsubs.replace(e, 'y')}", faces, rinv, precision=precision
    )
    ushape = u.shape[:axis] + (nb, 2) + u.shape[axis + 1 :]
    u = u.reshape(ushape)
    alpha = jax.lax.index_in_dim(u, 0, axis=axis + 1, keepdims=True)
    beta = jax.lax.index_in_dim(u, 1, axis=axis + 1, keepdims=True)

    # rank-2 update; uh/lh broadcast over everything but (nb, m)
    tshape = [1] * nd
    tshape[axis] = nb
    tshape[axis + 1] = m
    x = xr + alpha * uh.reshape(tshape) + beta * lh.reshape(tshape)
    return x.reshape(f.shape)


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
def banded_operator(scheme: CompactScheme, n: int, tol: float = 1e-8):
    """Truncated-banded form of the dense operator M = T^{-1} B.

    Rows of M decay geometrically away from the diagonal (the tridiagonal
    inverse decays like r^|i-j| with r ~ 0.27 for alpha=1/4), so M is a
    constant-coefficient banded matrix up to ``tol`` — i.e. the implicit
    compact scheme equals an *explicit* wide stencil to working precision.

    Returns (c, E_top, E_bot, m):
      c      — (2*bw+1,) interior stencil coefficients (center at bw)
      E_top  — (m, m+bw) dense correction rows at the left edge
      E_bot  — (m, m+bw) dense correction rows at the right edge (natural
               orientation: applied to f[n-(m+bw):])
      m      — number of corrected rows per edge (0 for periodic schemes,
               whose M is circulant so the stencil alone is exact)
    """
    M = dense_operator(scheme, n)
    mid = n // 2
    row = M[mid]
    rel = np.abs(row) / np.abs(row).max()
    idx = np.nonzero(rel > tol)[0]
    bw = int(max(mid - idx.min(), idx.max() - mid))
    c = row[mid - bw : mid + bw + 1].copy()
    if scheme.periodic:
        # circulant: wrap-around stencil is exact everywhere
        return c, None, None, 0
    m = bw + scheme.n_closure
    E_top = M[:m, : m + bw].copy()
    E_bot = M[n - m :, n - (m + bw) :].copy()
    return c, E_top, E_bot, m


def _stencil_derivative(f, dx, scheme, axis, tol=1e-8):
    """Explicit wide-stencil evaluation of the compact derivative.

    O(bandwidth) fused multiply-adds per point at f32-exact accuracy
    (truncation below f32 roundoff), independent of line length — the
    bandwidth-optimal path along axes where shifts are cheap."""
    import jax.lax as lax

    n = f.shape[axis]
    c, E_top, E_bot, m = banded_operator(scheme, n, tol)
    bw = (len(c) - 1) // 2
    if n < 2 * (m + bw):
        raise ValueError(f"line length {n} too short for stencil method")
    dtype = f.dtype

    dxp = jnp.asarray(dx, dtype) ** scheme.derivative_order

    if scheme.periodic:
        out = jnp.zeros_like(f)
        for k, ck in enumerate(c):
            if ck != 0.0:
                out = out + jnp.asarray(ck, dtype) * jnp.roll(f, bw - k, axis=axis)
        return out / dxp

    out = jnp.zeros_like(f)
    for k, ck in enumerate(c):
        off = k - bw  # contribution of f[i+off]
        if ck == 0.0:
            continue
        pad = [(0, 0)] * f.ndim
        if off >= 0:
            pad[axis] = (0, off)
            piece = jnp.pad(lax.slice_in_dim(f, off, n, axis=axis), pad)
        else:
            pad[axis] = (-off, 0)
            piece = jnp.pad(lax.slice_in_dim(f, 0, n + off, axis=axis), pad)
        out = out + jnp.asarray(ck, dtype) * piece
    # dense edge corrections (small matmuls; HIGHEST so f32 edges stay
    # f32-accurate on the MXU — measured 0.05 abs error without it)
    prec = jax.lax.Precision.HIGHEST if dtype != jnp.bfloat16 else None
    top = jnp.tensordot(
        jnp.asarray(E_top, dtype),
        lax.slice_in_dim(f, 0, m + bw, axis=axis),
        axes=(1, axis),
        precision=prec,
    )
    bot = jnp.tensordot(
        jnp.asarray(E_bot, dtype),
        lax.slice_in_dim(f, n - (m + bw), n, axis=axis),
        axes=(1, axis),
        precision=prec,
    )
    # tensordot puts the new row dim first; move it to ``axis``
    top = jnp.moveaxis(top, 0, axis)
    bot = jnp.moveaxis(bot, 0, axis)
    mid = lax.slice_in_dim(out, m, n - m, axis=axis)
    out = jnp.concatenate([top, mid, bot], axis=axis)
    return out / dxp


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
    matmul_precision: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Compact derivative of ``f`` along ``axis`` with spacing ``dx``.

    The scheme's ``derivative_order`` selects first (default schemes) or
    second derivative (``get_scheme(..., derivative=2)`` / SCHEME*_D2).

    ``matmul_precision`` (None = auto) sets the MXU pass count of the
    'matmul' backend for f32 fields: derivatives need 'highest' (bf16x6 —
    the O(1/dx**order) scale amplifies rounding), but order-0 filters have
    no spacing amplification, so auto drops them to 'high' (bf16x3): 1.6x
    faster at 256^3 (0.228 vs 0.360 ms device, 73.5 Gpt/s — the HIGHEST
    form is MXU-bound, not HBM-bound) at ~3e-5 relative error against the
    f64 oracle instead of ~6e-7 (benchmarks/results/filter_v5e.json).
    Pass 'highest' explicitly for filters at f32 roundoff.

    ``method`` selects the backend: 'auto' (default; picks per dtype/backend/
    axis/size, see ``resolve_method``), 'matmul' (dense operator on the MXU),
    'pallas' (fused TPU kernels, f32/bf16: the transpose-free lane kernel
    along the last axis — ops/pallas_lane.py — and the RHS+Thomas kernel
    elsewhere), 'pcr' (axis-aware table-driven parallel cyclic reduction at
    the XLA level — any backend, any dtype) or 'thomas' (scan-based LU).
    """
    if method not in _METHODS:
        raise ValueError(f"unknown solver method {method!r}; expected {_METHODS}")
    axis = axis % f.ndim
    minor = axis == f.ndim - 1
    method = resolve_method(
        method,
        f.dtype,
        f.shape[axis],
        minor_axis=minor,
        second_minor=axis == f.ndim - 2,
        derivative_order=scheme.derivative_order,
        # 2-D (n, B) fields keep the sublane route (axis 0 is second-minor
        # there, a contiguous fast case); the leading kernel claims true
        # 3-D+ leading axes, where every alternative pays a relayout
        leading=axis == 0 and f.ndim >= 3,
    )
    if method == "pallas" and minor:
        from .pallas_lane import lane_derivative, lane_supported

        if lane_supported(scheme, f.shape[axis], f.dtype):
            # transpose-free lane-axis kernel: one HBM read + one write
            return lane_derivative(f, dx, scheme, interpret=interpret)
    if method == "pallas" and not minor:
        if axis == 0 and f.ndim >= 3:
            from .pallas_leading import leading_derivative, leading_supported

            if leading_supported(scheme, f.shape[0], f.dtype):
                # leading-axis substructured kernel: native-3D blocks, zero
                # relayouts (the transpose-free dfdz)
                return leading_derivative(f, dx, scheme, interpret=interpret)
        from .pallas_sublane import sublane_derivative, sublane_supported

        if sublane_supported(scheme, f.shape[axis], f.dtype):
            # transpose-free sublane-axis kernel: trailing dims merge into
            # the lane dimension, lines run along sublanes
            return sublane_derivative(
                f, dx, scheme, axis=axis, interpret=interpret
            )
    if method == "matmul":
        # MXU passes for f32 inputs: 'highest' (bf16x6, ~1e-6 abs err on
        # smooth fields) for derivatives; 'high' (bf16x3) for order-0
        # filters (see the docstring — no 1/dx amplification, half the MXU
        # cost). bf16 inputs always take the fast single pass.
        if matmul_precision is None:
            matmul_precision = (
                "high" if scheme.derivative_order == 0 else "highest"
            )
        prec = matmul_precision if f.dtype != jnp.bfloat16 else None
        n = f.shape[axis]
        if n > _MATMUL_BLOCK:
            # long lines: blocked substructuring keeps FLOPs/point O(block)
            return _blocked_matmul_derivative(f, dx, scheme, axis, prec)
        M = jnp.asarray(dense_operator(scheme, n), f.dtype)
        out = jnp.tensordot(f, M, axes=([axis], [1]), precision=prec)
        # tensordot appends M's free dim at the end; restore the axis position
        out = jnp.moveaxis(out, -1, axis)
        return out / jnp.asarray(dx, f.dtype) ** scheme.derivative_order
    if method == "stencil":
        return _stencil_derivative(f, dx, scheme, axis)
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


def filter_field(
    f: jax.Array,
    scheme: CompactScheme = None,
    *,
    axis=None,
    method: str = "auto",
) -> jax.Array:
    """Apply a compact low-pass filter (schemes.get_filter) to ``f``.

    ``axis=None`` filters all three trailing axes sequentially (the standard
    per-direction sweep); an int filters one axis. The filter is the same
    tridiagonal solve as a derivative with ``derivative_order=0`` — no
    spacing scale — so every backend applies.
    """
    if scheme is None:
        from ..schemes import get_filter

        scheme = get_filter()
    if scheme.derivative_order != 0:
        raise ValueError(
            f"scheme {scheme.name!r} is not a filter (derivative_order="
            f"{scheme.derivative_order}); build one with schemes.get_filter"
        )
    axes = (-1, -2, -3) if axis is None else (axis,)
    for ax in axes:
        f = derivative(f, 1.0, scheme, axis=ax, method=method)
    return f


def _d2_scheme(scheme: CompactScheme) -> CompactScheme:
    if scheme.derivative_order != 2:
        raise ValueError(
            f"scheme {scheme.name!r} is a derivative_order="
            f"{scheme.derivative_order} scheme; second-derivative ops need a "
            "derivative_order=2 scheme (e.g. get_scheme(4, derivative=2))"
        )
    return scheme


def d2fdx2(f, dx, scheme: CompactScheme = None, *, method: str = "auto", **kw):
    """d²/dx² — compact second derivative along the last axis."""
    scheme = _d2_scheme(scheme if scheme is not None else SCHEME4_D2)
    return derivative(f, dx, scheme, axis=-1, method=method, **kw)


def d2fdy2(f, dy, scheme: CompactScheme = None, *, method: str = "auto", **kw):
    """d²/dy² — compact second derivative along the second-to-last axis."""
    scheme = _d2_scheme(scheme if scheme is not None else SCHEME4_D2)
    return derivative(f, dy, scheme, axis=-2, method=method, **kw)


def d2fdz2(f, dz, scheme: CompactScheme = None, *, method: str = "auto", **kw):
    """d²/dz² — compact second derivative along the third-to-last axis."""
    scheme = _d2_scheme(scheme if scheme is not None else SCHEME4_D2)
    return derivative(f, dz, scheme, axis=-3, method=method, **kw)


def _spacings3(spacing):
    if isinstance(spacing, (tuple, list)):
        dz, dy, dx = spacing
        return (dz, dy, dx)
    if getattr(spacing, "ndim", 0) == 1:  # array of 3 spacings
        return (spacing[0], spacing[1], spacing[2])
    return (spacing, spacing, spacing)


def gradient(
    f: jax.Array,
    spacing,
    scheme: CompactScheme = SCHEME4,
    *,
    method: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(df/dx, df/dy, df/dz) of a scalar field ``[..., nz, ny, nx]``.

    ``spacing`` is a scalar or (dz, dy, dx). On TPU, f32 'auto' runs
    the fused two-axis pair kernel for (dfdx, dfdy) — one HBM read of f
    instead of two (ops/pallas_pair.py; measured 3-10% on the full
    3-derivative pipeline at 256^3 — the single kernels already run past
    the DMA floor, so read-sharing buys modest, not 25%, wall-clock).
    bf16 fields skip the pair kernel: its f32-internal HIGHEST dots are a
    pure tax there, and the single-pass bf16 matmul path is ~3.5x faster
    per op than what the one saved read could recover.
    """
    dz, dy, dx = _spacings3(spacing)
    if (
        method == "auto"
        and f.ndim >= 3
        and f.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    ):
        from .pallas_pair import gradient_pair, pair_supported

        if pair_supported(scheme, f.shape[-2], f.shape[-1], f.dtype):
            gx, gy = gradient_pair(f, dy, dx, scheme)
            return (gx, gy, dfdz(f, dz, scheme, method=method))
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
    """div(u) for a 3-component vector field (ux, uy, uz).

    On TPU, f32 'auto' with a periodic scheme runs the fused streaming
    route (ops/pallas_vec.divergence_fused): one kernel emits
    ``B_z uz + T_z (d1x ux + d1y uy)`` from a single read of each
    component, and one leading z-solve turns it into div(u) — 6 HBM
    passes / 2 dispatches where the unfused form costs ~10 / 4.
    """
    ux, uy, uz = u
    dz, dy, dx = _spacings3(spacing)
    if (
        method == "auto"
        and ux.ndim == 3
        and ux.shape == uy.shape == uz.shape
        and ux.dtype == uy.dtype == uz.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    ):
        from .pallas_vec import div_fused_supported, divergence_fused

        if div_fused_supported(scheme, *ux.shape, ux.dtype):
            return divergence_fused((ux, uy, uz), dz, dy, dx, scheme)
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
    """curl(u) for a 3-component vector field (ux, uy, uz).

    On TPU, f32 'auto' with a periodic scheme runs the fused streaming
    route (ops/pallas_vec.curl_fused): one kernel reads each component
    once and emits wz plus the two change-of-variables right-hand sides
    whose leading z-solves are wx and wy — 10 HBM passes / 3 dispatches
    where the unfused form costs ~20 / 7. Otherwise the z-component's two
    derivatives (duz/dx, duz/dy) still share one read of uz through the
    pair kernel (bf16 routes through the faster single-pass matmul ops
    instead — see ``gradient``).
    """
    ux, uy, uz = u
    dz, dy, dx = _spacings3(spacing)
    if (
        method == "auto"
        and ux.ndim == 3
        and ux.shape == uy.shape == uz.shape
        and ux.dtype == uy.dtype == uz.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    ):
        from .pallas_vec import curl_fused, curl_fused_supported

        if curl_fused_supported(scheme, *ux.shape, ux.dtype):
            return curl_fused((ux, uy, uz), dz, dy, dx, scheme)
    duz_dx = duz_dy = None
    if (
        method == "auto"
        and uz.ndim >= 3
        and uz.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    ):
        from .pallas_pair import gradient_pair, pair_supported

        if pair_supported(scheme, uz.shape[-2], uz.shape[-1], uz.dtype):
            duz_dx, duz_dy = gradient_pair(uz, dy, dx, scheme)
    if duz_dx is None:
        duz_dy = dfdy(uz, dy, scheme, method=method)
        duz_dx = dfdx(uz, dx, scheme, method=method)
    duy_dz = dfdz(uy, dz, scheme, method=method)
    dux_dz = dfdz(ux, dz, scheme, method=method)
    duy_dx = dfdx(uy, dx, scheme, method=method)
    dux_dy = dfdy(ux, dy, scheme, method=method)
    return (duz_dy - duy_dz, dux_dz - duz_dx, duy_dx - dux_dy)


def laplacian(
    f: jax.Array,
    spacing,
    scheme: CompactScheme = None,
    *,
    method: str = "auto",
) -> jax.Array:
    """Laplacian of a scalar field via compact *second*-derivative schemes.

    One tridiagonal solve per direction — half the derivative evaluations
    (and better high-wavenumber resolution) than the repeated-first-
    derivative form div(grad(f)). ``scheme`` must be a derivative_order=2
    scheme; defaults to the 4th-order Padé d² (``SCHEME4_D2``).

    On TPU, f32 'auto' computes d2x + d2y through the fused pair-sum
    kernel (ops/pallas_pair.d2_pair_sum: one HBM read and one write for
    both axes plus their sum), leaving only d2fdz2 as a second op —
    2 reads + 2 writes total where the unfused form costs 3 + 3 plus add
    passes.
    """
    scheme = _d2_scheme(scheme if scheme is not None else SCHEME4_D2)
    dz, dy, dx = _spacings3(spacing)
    if (
        method == "auto"
        and f.ndim >= 3
        and f.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    ):
        from .pallas_pair import d2_pair_sum, d2_sum_supported

        if d2_sum_supported(scheme, f.shape[-2], f.shape[-1], f.dtype):
            from .pallas_leading import (
                leading_derivative,
                leading_solve,
                leading_supported,
            )

            if f.ndim == 3 and leading_supported(scheme, f.shape[0], f.dtype):
                from .pallas_lap import lap_rhs, lap_rhs_supported

                if lap_rhs_supported(scheme, *f.shape, f.dtype):
                    # four HBM passes: one streaming kernel emits
                    # r = B_z f + T_z (d2x + d2y), one solve-only pass
                    # turns it into the Laplacian (T y = B f + T s has
                    # the solution y = d2z + s) — ops/pallas_lap.py
                    return leading_solve(lap_rhs(f, dz, dy, dx, scheme), scheme)
                # five-pass fallback: d2z with the xy sum as accumuland
                s = d2_pair_sum(f, dy, dx, scheme)
                return leading_derivative(f, dz, scheme, acc=s)
            s = d2_pair_sum(f, dy, dx, scheme)
            return s + d2fdz2(f, dz, scheme, method=method)
    return (
        d2fdx2(f, dx, scheme, method=method)
        + d2fdy2(f, dy, scheme, method=method)
        + d2fdz2(f, dz, scheme, method=method)
    )
