"""Leading-axis substructured compact-derivative kernel (native-3D dfdz).

The z-derivative of a ``[nz, ny, nx]`` field differentiates the *leading*
(untiled) axis. Round 1's leading-axis kernel (ops/pallas_fused.py) already
solved lines along axis 0, but required the batch flattened to ``(n, B)``
and re-split to ``(n, B/128, 128)`` — both physical relayouts on TPU (the
(sublane, lane) tiling changes), costing a full HBM round trip each way on
3-D fields (measured: the relayout pair turns a 0.24 ms kernel into a
0.41 ms op at 256^3, benchmarks/diag_dfdz.py). The round-2 alternative — the
sublane kernel after merging trailing dims — pays the same relayout, and the
dense MXU operator pays O(n) MACs/point at HIGHEST precision (~0.31 ms).

This kernel takes the 3-D field **in its native layout**: blocks are
``(n, S, 128)`` windows of ``(nz, ny, nx)`` indexed by a (ny/S, nx/128)
grid — zero relayouts, every DMA a contiguous tile slab. Measured at 256^3
f32 (chain-slope, interleaved same-run vs the dense MXU operator):
**0.220-0.230 ms = 73-76 Gpt/s** for d1 and d2 vs matmul's 0.36-0.37, and
0.261 ms (64 Gpt/s) for filters vs 0.364 — the `auto` route for every f32
leading-axis op. At 512^3 it rides the machine's large-footprint copy floor
(3.42 ms = 39 Gpt/s, 1.7x the blocked matmul; see docs/RESULTS.md). bf16
keeps the single-pass matmul. The solve is the
same substructuring the rest of the framework uses (parallel/compact.py,
reference /root/reference/code/cuda/compact.py:29-154), specialised to the
register-major axis where MXU matmuls cannot reach (a z-contraction in this
layout needs a sublane-gather relayout that Mosaic cannot compile —
docs/RESULTS.md round-3 diagnosis):

* the line is cut into ``nb`` blocks of ``bz = n/nb`` rows; each block's
  Thomas recurrence runs **interleaved with the other nb-1 blocks**, so the
  VPU sees nb independent dependency chains instead of the single global
  chain that latency-bound round 1's kernel (ILP = nb x S x 128 lanes);
* interface faces come out of the *forward* sweep alone: the block-last
  face is the final forward carry times the last pivot, and the block-first
  face is accumulated against the precomputed first row of the block
  inverse ``T_b^{-1}[0, :]`` (one SMEM-scalar FMA per row) — no extra pass;
* the (2nb, 2nb) reduced interface solve is unrolled SMEM-scalar FMAs
  against the decay-truncated rows of the precomputed reduced inverse
  (reference kernels.cu:115-145 does this serially per thread; here every
  lane of the batch solves its own interface system simultaneously);
* the rank-2 unit-load update ``x += alpha*uh + beta*lh`` (reference
  kernels.cu:49-74 sumSolutions) is folded into the backward sweep as two
  SMEM-scalar FMAs per row — the full (n,) uh/lh tables ride in SMEM, so
  no peeling and no truncation error.

float32/bfloat16 fields (bf16 is converted on entry; the solve is
f32-internal like the lane/sublane kernels). float64 callers take the PCR
path. Tables are precomputed in float64 at trace time from the same
``parallel.compact.direction_tables`` the distributed solver uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..schemes import CompactScheme
from .rhs import closure_ghosts

__all__ = [
    "leading_derivative",
    "leading_dist_derivative",
    "leading_dist_supported",
    "leading_solve",
    "leading_supported",
    "rk3_solve_update",
    "rk3_update_supported",
]

LANE = 128
_MIN_BZ = 32  # shortest sub-block: >= closure stencil and >= 2*width+1


def _pick_nb(n: int) -> int:
    """Sub-block count: 8 independent Thomas chains when the line allows
    (the ILP sweet spot measured on v5e), fewer for short lines."""
    for nb in (8, 4, 2):
        if n % nb == 0 and n // nb >= _MIN_BZ:
            return nb
    return 1


def leading_supported(scheme: CompactScheme, n: int, dtype) -> bool:
    """Whether the leading-axis kernel can differentiate lines of length n."""
    return dtype in (jnp.float32, jnp.bfloat16) and _pick_nb(n) >= 2


@functools.lru_cache(maxsize=None)
def _leading_tables(scheme: CompactScheme, n: int):
    """Kernel tables (float64 math, truncated to float32 at the end).

    Returns (w, invd, du, uh, lh, t0, rinv, rsupport, has_uh, has_lh, nb):
      w/invd/du — (n,) per-sub-block Thomas factors, concatenated
      uh/lh     — (n,) unit-load solutions per sub-block (zero where the
                  block has no coupling on that side)
      t0        — (n,) first rows of the sub-block inverses T_b^{-1}[0, :]
      rinv      — (2nb*2nb,) reduced-matrix inverse, columns 0 and 2nb-1
                  zeroed for non-periodic lines (the face mask of
                  ops/derivatives._blocked_matmul_derivative folded in)
      rsupport  — per reduced unknown j, the tuple of face indices k with
                  |rinv[j,k]| above 1e-12 of the row max (geometric decay
                  across the interface chain; ~8 survive per row)
      has_uh/lh — per block, whether the unit-load table is nonzero
    """
    from ..parallel.compact import direction_tables

    nb = _pick_nb(n)
    t = direction_tables(scheme, n, nb)
    w = np.concatenate(t.tw)
    invd = np.concatenate(t.tinvd)
    du = np.concatenate(t.tdu)
    uh = np.concatenate(t.uh)
    lh = np.concatenate(t.lh)
    t0 = np.concatenate([t.tinv[b][0, :] for b in range(nb)])
    rinv = t.rinv_rows.reshape(2 * nb, 2 * nb).copy()
    if not scheme.periodic:
        rinv[:, 0] = 0.0
        rinv[:, -1] = 0.0
    rsupport = []
    amax = np.abs(rinv).max() or 1.0
    for j in range(2 * nb):
        thresh = 1e-12 * amax
        rsupport.append(
            tuple(int(k) for k in range(2 * nb) if abs(rinv[j, k]) > thresh)
        )
    has_uh = tuple(bool(np.any(t.uh[b])) for b in range(nb))
    has_lh = tuple(bool(np.any(t.lh[b])) for b in range(nb))
    f32 = lambda a: np.asarray(a, np.float32)
    return (
        f32(w),
        f32(invd),
        f32(du),
        f32(uh),
        f32(lh),
        f32(t0),
        f32(rinv.reshape(-1)),
        tuple(rsupport),
        has_uh,
        has_lh,
        nb,
    )


def _stencil(scheme: CompactScheme):
    return (
        tuple(zip(scheme.rhs_offsets, scheme.rhs_weights)),
        scheme.rhs_sign,
        scheme.rhs_center,
        scheme.derivative_order,
    )


def _leading_kernel(
    inv_dx_ref,
    f_ref,
    gl_ref,
    gr_ref,
    w_ref,
    invd_ref,
    du_ref,
    uh_ref,
    lh_ref,
    t0_ref,
    rinv_ref,
    *refs,
    n: int,
    nb: int,
    halo: int,
    stencil,
    rsupport,
    has_uh,
    has_lh,
    has_mul: bool = False,
    has_acc: bool = False,
    rk: bool = False,
    has_q: bool = False,
    ext: bool = False,
):
    """nb interleaved sub-block Thomas chains + in-sweep interface update.

    f_ref/out_ref: (n, S, 128) native-layout block (or (n, W) for 2-D
    batches); gl/gr: (halo, ...) ghost rows; everything else SMEM scalars.
    Epilogues fused into the backward sweep's final write (each an extra
    (n, ...) block input riding along — saves the corresponding elementwise
    HBM pass):
      * ``has_mul``: the result is multiplied pointwise (the advection
        term's uz weight);
      * ``has_acc``: an accumuland is added (the Laplacian's d2x+d2y sum,
        or the advection term's xy part);
      * ``ext``: the line is one shard of a distributed line — refs are
        (suh, slh (SMEM), ab, out); the externally-solved shard interface
        weights ``ab`` (2, ...) apply the outer rank-2 unit-load update
        ``out += ab[0]*suh + ab[1]*slh`` inside the backward sweep
        (parallel/dist_tables.py; the in-kernel tables then describe the
        shard's truncated local system, halos ride in gl/gr);
      * ``rk``: the solve result is a Laplacian and the kernel emits a
        full Williamson RK3 substep — refs are (scal, adv, fin[, q],
        qout, fout) with scal = [a, b, dt, dt*nu] in SMEM, computing
        ``q' = a*q + dt*(nu*lap - adv)`` and ``f' = fin + b*q'``
        (``has_q`` False on the first substep, where a == 0). The qout
        block doubles as the forward-sweep scratch.
    """
    mul_ref = acc_ref = None
    scal_ref = adv_ref = fin_ref = q_ref = fout_ref = None
    suh_ref = slh_ref = ab_ref = None
    if rk:
        scal_ref, adv_ref, fin_ref = refs[:3]
        rest = refs[3:]
        if has_q:
            q_ref, out_ref, fout_ref = rest
        else:
            out_ref, fout_ref = rest
    elif ext:
        suh_ref, slh_ref, ab_ref, out_ref = refs
    else:
        idx = 0
        if has_mul:
            mul_ref = refs[idx]
            idx += 1
        if has_acc:
            acc_ref = refs[idx]
            idx += 1
        out_ref = refs[idx]
    taps, sgn, c0, dord = stencil
    bz = n // nb
    s = 1.0
    for _ in range(dord):
        s = s * inv_dx_ref[0]

    shape1 = (1,) + out_ref.shape[1:]
    zero = jnp.zeros(shape1, out_ref.dtype)

    def row(i):
        """f at global row i, i in [-halo, n+halo), static index."""
        if i < 0:
            return gl_ref[pl.ds(halo + i, 1)]
        if i >= n:
            return gr_ref[pl.ds(i - n, 1)]
        return f_ref[pl.ds(i, 1)]

    def pair(a, b):
        return (a - b) if sgn < 0 else (a + b)

    def rhs_at(load):
        r = None
        for k, wt in taps:
            t = wt * pair(load(k), load(-k))
            r = t if r is None else r + t
        if c0:
            t = c0 * load(0)
            r = t if r is None else r + t
        return r

    def fwd_one(b, g, ys, ffs, static):
        """One forward step of chain b at global row g (static or traced)."""
        if static:
            r = rhs_at(lambda k: row(g + k))
        else:
            r = rhs_at(lambda k: f_ref[pl.ds(g + k, 1)])
        y = r - w_ref[g] * ys[b]
        out_ref[pl.ds(g, 1)] = y
        ys[b] = y
        ffs[b] = ffs[b] + t0_ref[g] * r

    # ---- forward sweeps, nb interleaved chains --------------------------
    ys = [zero] * nb
    ffs = [zero] * nb
    for i in range(halo):  # global edge rows need ghosts: peel (static)
        for b in range(nb):
            fwd_one(b, b * bz + i, ys, ffs, static=True)

    def fwd_step(i, carry):
        ys = list(carry[0])
        ffs = list(carry[1])
        for b in range(nb):
            fwd_one(b, b * bz + i, ys, ffs, static=False)
        return tuple(ys), tuple(ffs)

    ys, ffs = jax.lax.fori_loop(
        halo, bz - halo, fwd_step, (tuple(ys), tuple(ffs))
    )
    ys, ffs = list(ys), list(ffs)
    for i in range(bz - halo, bz):  # peel (static)
        for b in range(nb):
            fwd_one(b, b * bz + i, ys, ffs, static=True)

    # ---- interface faces + redundant reduced solve ----------------------
    # faces[2b] = -x_R at block-first row (accumulated via T_b^{-1}[0, :]);
    # faces[2b+1] = -x_R at block-last row (= final forward carry * pivot)
    faces = []
    for b in range(nb):
        faces.append(-ffs[b])
        faces.append(-(ys[b] * invd_ref[(b + 1) * bz - 1]))
    us = []
    for j in range(2 * nb):
        acc = None
        for k in rsupport[j]:
            term = rinv_ref[j * 2 * nb + k] * faces[k]
            acc = term if acc is None else acc + term
        us.append(zero if acc is None else acc)

    # ---- backward sweeps with the rank-2 update folded in ---------------
    def bwd_step(j, xs):
        xs = list(xs)
        for b in range(nb):
            g = b * bz + (bz - 1) - j
            x = (out_ref[pl.ds(g, 1)] - du_ref[g] * xs[b]) * invd_ref[g]
            tot = x
            if has_uh[b]:
                tot = tot + us[2 * b] * uh_ref[g]
            if has_lh[b]:
                tot = tot + us[2 * b + 1] * lh_ref[g]
            if rk:
                # tot IS the Laplacian (solve-only: s == 1); emit the
                # Williamson substep: q' = a*q + dt*nu*lap - dt*adv,
                # f' = fin + b*q' — all on resident rows, no extra pass
                qn = scal_ref[3] * tot - scal_ref[2] * adv_ref[pl.ds(g, 1)]
                if has_q:
                    qn = qn + scal_ref[0] * q_ref[pl.ds(g, 1)]
                out_ref[pl.ds(g, 1)] = qn
                fout_ref[pl.ds(g, 1)] = fin_ref[pl.ds(g, 1)] + scal_ref[1] * qn
            else:
                res = tot * s
                if ext:
                    # outer rank-2 update: the shard-level unit loads are
                    # scale-free (the dx power lives in ab via the scaled
                    # faces), so they apply after the stencil scaling
                    res = (
                        res
                        + ab_ref[pl.ds(0, 1)] * suh_ref[g]
                        + ab_ref[pl.ds(1, 1)] * slh_ref[g]
                    )
                if has_mul:
                    res = res * mul_ref[pl.ds(g, 1)]
                if has_acc:
                    res = res + acc_ref[pl.ds(g, 1)]
                out_ref[pl.ds(g, 1)] = res
            xs[b] = x
        return tuple(xs)

    jax.lax.fori_loop(0, bz, bwd_step, (zero,) * nb)


def _auto_sublanes(n: int, b1: int, n_blocks: int = 2) -> int:
    """Largest sublane count S (16 or 8) dividing b1 with all resident
    (n, S, 128) blocks (``n_blocks`` arrays, double-buffered) under ~12 MB
    of VMEM."""
    budget = 12 * 1024 * 1024
    for s in (16, 8):
        if b1 % s == 0 and 2 * n_blocks * n * s * LANE * 4 <= budget:
            return s
    return 0


@functools.partial(
    jax.jit,
    static_argnames=("scheme", "n", "nb", "halo", "interpret", "solve_only"),
)
def _call_leading(
    f, gl, gr, inv_dx, acc=None, mul=None, *, scheme, n, nb, halo, interpret,
    solve_only=False,
):
    """f: (n, B1, B2) with B2 % 128 == 0 and B1 % 8 == 0, or (n, B) with
    B % 1024 == 0. ``mul`` multiplies / ``acc`` adds into the output."""
    w, invd, du, uh, lh, t0, rinv, rsupport, has_uh, has_lh, _ = _leading_tables(
        scheme, n
    )
    kernel = functools.partial(
        _leading_kernel,
        n=n,
        nb=nb,
        halo=halo,
        # solve-only: the input IS the RHS — identity stencil (c0=1, no
        # taps, derivative order 0 so the inv_dx scale is 1)
        stencil=((), 1.0, 1.0, 0) if solve_only else _stencil(scheme),
        rsupport=rsupport,
        has_uh=has_uh,
        has_lh=has_lh,
        has_mul=mul is not None,
        has_acc=acc is not None,
    )
    n_extra = (acc is not None) + (mul is not None)
    if f.ndim == 3:
        B1, B2 = f.shape[1:]
        S = _auto_sublanes(n, B1, 2 + n_extra)
        grid = (B1 // S, B2 // LANE)
        block = lambda lead: pl.BlockSpec(
            (lead, S, LANE), lambda j, k: (0, j, k), memory_space=pltpu.VMEM
        )
    else:
        B = f.shape[1]
        W = 16 * LANE
        grid = (B // W,)
        block = lambda lead: pl.BlockSpec(
            (lead, W), lambda j: (0, j), memory_space=pltpu.VMEM
        )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    cdt = jnp.float32
    extras = [a for a in (mul, acc) if a is not None]  # kernel unpack order
    extra_specs = [block(n)] * len(extras)
    extra_args = [a.astype(cdt) for a in extras]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(f.shape, cdt),
        grid=grid,
        in_specs=[smem(), block(n), block(halo), block(halo)]
        + [smem()] * 7
        + extra_specs,
        out_specs=block(n),
        cost_estimate=pl.CostEstimate(
            flops=12 * f.size,
            bytes_accessed=(2 + n_extra) * f.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(inv_dx, cdt).reshape(1),
        f.astype(cdt),
        gl.astype(cdt),
        gr.astype(cdt),
        *(jnp.asarray(a) for a in (w, invd, du, uh, lh, t0, rinv)),
        *extra_args,
    )
    return out


def leading_derivative(
    f: jax.Array,
    dx,
    scheme: CompactScheme,
    *,
    acc: jax.Array = None,
    mul: jax.Array = None,
    interpret: bool = False,
    solve_only: bool = False,
) -> jax.Array:
    """Derivative along axis 0 of ``f`` (n, *batch) — relayout-free on
    native (nz, ny, nx) fields with ny % 8 == 0 and nx % 128 == 0.

    ``acc`` / ``mul`` (same shape as f) fuse into the kernel's final
    write as ``out = mul * deriv + acc`` — ``laplacian`` passes the
    d2x+d2y sum as ``acc``; the fused RK3 advection term passes the uz
    velocity as ``mul`` and the xy advection part as ``acc``. Each saves
    its elementwise pass over HBM.
    """
    if f.dtype not in (jnp.float32, jnp.bfloat16):
        raise ValueError(
            "the Pallas path supports float32/bfloat16 only; use method='pcr' "
            "for float64 (oracle-parity) runs"
        )
    for name, a in (("acc", acc), ("mul", mul)):
        if a is not None and a.shape != f.shape:
            raise ValueError(f"{name} shape {a.shape} != field shape {f.shape}")
    n = f.shape[0]
    nb = _pick_nb(n)
    if nb < 2:
        raise ValueError(
            f"line length {n} too short for the leading-axis substructured "
            f"kernel (needs n divisible into >= 2 blocks of >= {_MIN_BZ})"
        )
    bshape = f.shape[1:]
    # native 3-D path when the trailing dims tile cleanly; otherwise flatten
    # the batch (XLA inserts the relayout the native path exists to avoid —
    # still correct, just not the fast path)
    n_blocks = 2 + (acc is not None) + (mul is not None)
    if (
        f.ndim >= 3
        and f.shape[-1] % LANE == 0
        and int(np.prod(bshape[:-1])) % 8 == 0
        and _auto_sublanes(n, int(np.prod(bshape[:-1])), n_blocks)
    ):
        reshape = lambda a: a.reshape(n, int(np.prod(bshape[:-1])), a.shape[-1])
    else:
        B = int(np.prod(bshape))
        W = 16 * LANE
        Bp = -(-B // W) * W

        def reshape(a):
            a = a.reshape(n, B)
            return jnp.pad(a, ((0, 0), (0, Bp - B))) if Bp != B else a

    fx = reshape(f)
    if solve_only:
        # input is the precomputed RHS: no stencil, no ghosts (one zero
        # ghost row keeps the block specs non-degenerate; never read)
        gl = gr = jnp.zeros((1,) + fx.shape[1:], fx.dtype)
        halo = 1
    else:
        gl, gr = closure_ghosts(fx, scheme)
        halo = gl.shape[0]
    out = _call_leading(
        fx,
        gl,
        gr,
        jnp.asarray(1.0, jnp.float32) / jnp.asarray(dx, jnp.float32),
        reshape(acc) if acc is not None else None,
        reshape(mul) if mul is not None else None,
        scheme=scheme,
        n=n,
        nb=nb,
        halo=halo,
        interpret=interpret,
        solve_only=solve_only,
    )
    if out.ndim == 2 and out.shape[1] != int(np.prod(bshape)):
        out = out[:, : int(np.prod(bshape))]
    return out.reshape((n,) + bshape).astype(f.dtype)


def leading_solve(
    rhs: jax.Array,
    scheme: CompactScheme,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Solve ``T x = rhs`` along axis 0 with the scheme's LHS operator.

    The substructured leading-axis machinery with the in-kernel RHS
    stencil replaced by the identity — the second dispatch of the
    four-pass Laplacian (ops/pallas_lap.py), and a general batched
    tridiagonal solve for any precomputed right-hand side in native
    (n, ny, nx) layout.
    """
    return leading_derivative(
        rhs, 1.0, scheme, interpret=interpret, solve_only=True
    )


# ---------------------------------------------------------------------------
# distributed shard-local solve: halos in, outer interface weights fused in
# ---------------------------------------------------------------------------


def leading_dist_supported(scheme: CompactScheme, nl: int, dtype) -> bool:
    """Whether the kernel can run one shard's local solve of ``nl`` rows."""
    return (
        dtype in (jnp.float32, jnp.bfloat16)
        and nl >= max(scheme.min_points(), 2 * scheme.stencil_width + 2)
    )


def _call_leading_dist(
    f,
    gl,
    gr,
    ab,
    inv_dx,
    tabs,
    *,
    stencil,
    n,
    nb,
    halo,
    rsupport,
    has_uh,
    has_lh,
    interpret,
):
    """Dispatch the ext-mode kernel; ``tabs`` is the traced SMEM table tuple
    (w, invd, du, uh, lh, t0, rinv, suh, slh) of THIS shard's local system."""
    kernel = functools.partial(
        _leading_kernel,
        n=n,
        nb=nb,
        halo=halo,
        stencil=stencil,
        rsupport=rsupport,
        has_uh=has_uh,
        has_lh=has_lh,
        ext=True,
    )
    if f.ndim == 3:
        B1, B2 = f.shape[1:]
        S = _auto_sublanes(n, B1, 2)
        grid = (B1 // S, B2 // LANE)
        block = lambda lead: pl.BlockSpec(
            (lead, S, LANE), lambda j, k: (0, j, k), memory_space=pltpu.VMEM
        )
    else:
        B = f.shape[1]
        W = 16 * LANE
        grid = (B // W,)
        block = lambda lead: pl.BlockSpec(
            (lead, W), lambda j: (0, j), memory_space=pltpu.VMEM
        )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    cdt = jnp.float32
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(f.shape, cdt),
        grid=grid,
        in_specs=[smem(), block(n), block(halo), block(halo)]
        + [smem()] * 9
        + [block(2)],
        out_specs=block(n),
        cost_estimate=pl.CostEstimate(
            flops=14 * f.size,
            bytes_accessed=2 * f.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(inv_dx, cdt).reshape(1),
        f.astype(cdt),
        gl.astype(cdt),
        gr.astype(cdt),
        *(t.astype(cdt) for t in tabs),
        ab.astype(cdt),
    )


def leading_dist_derivative(
    fl: jax.Array,
    gl: jax.Array,
    gr: jax.Array,
    ab: jax.Array,
    inv_dx,
    tabs,
    scheme: CompactScheme,
    *,
    nb: int,
    rsupport,
    has_uh,
    has_lh,
    interpret: bool = False,
) -> jax.Array:
    """One shard's local solve of a distributed leading-axis derivative.

    ``fl`` (nl, *batch) is the shard-local block in native layout; ``gl`` /
    ``gr`` (w, *batch) are halo rows from the neighbour shards (closure
    ghosts at physical ends); ``ab`` (2, *batch) are the shard's outer
    interface weights from the all_gather'd reduced solve; ``tabs`` is this
    shard's slice of parallel/dist_tables.ShardKernelTables.KERNEL_FIELDS.
    Replaces the round-1 route (moveaxis relayout + flat kernel + two
    separate XLA phases) with one relayout-free dispatch — the reference
    runs its best solver shard-locally too (code/cuda/compact.py:18,171).
    """
    n = fl.shape[0]
    bshape = fl.shape[1:]
    halo = gl.shape[0]
    if (
        fl.ndim >= 3
        and fl.shape[-1] % LANE == 0
        and int(np.prod(bshape[:-1])) % 8 == 0
        and _auto_sublanes(n, int(np.prod(bshape[:-1])), 2)
    ):
        reshape = lambda a: a.reshape(
            a.shape[0], int(np.prod(bshape[:-1])), a.shape[-1]
        )
        unpad = lambda o: o
    else:
        B = int(np.prod(bshape))
        W = 16 * LANE
        Bp = -(-B // W) * W

        def reshape(a):
            a = a.reshape(a.shape[0], B)
            return jnp.pad(a, ((0, 0), (0, Bp - B))) if Bp != B else a

        unpad = (lambda o: o[:, :B]) if Bp != B else (lambda o: o)
    out = _call_leading_dist(
        reshape(fl),
        reshape(gl),
        reshape(gr),
        reshape(ab),
        inv_dx,
        tabs,
        stencil=_stencil(scheme),
        n=n,
        nb=nb,
        halo=halo,
        rsupport=rsupport,
        has_uh=has_uh,
        has_lh=has_lh,
        interpret=interpret,
    )
    return unpad(out).reshape((n,) + bshape).astype(fl.dtype)


# ---------------------------------------------------------------------------
# fused RK3 substep: Laplacian solve + Williamson update in one dispatch
# ---------------------------------------------------------------------------


def rk3_update_supported(scheme: CompactScheme, shape, dtype, has_q=True) -> bool:
    """Whether the fused solve+RK-update kernel applies to a (nz, ny, nx)
    field: the leading kernel's constraints plus VMEM room for the six
    resident block streams (r, adv, fin, q, q', f')."""
    if len(shape) != 3 or dtype != jnp.float32:
        return False
    nz, ny, nx = shape
    if not leading_supported(scheme, nz, dtype):
        return False
    n_blocks = 6 if has_q else 5  # r, adv, fin (+q) in; q', f' out
    return (
        nx % LANE == 0
        and ny % 8 == 0
        and _auto_sublanes(nz, ny, n_blocks) > 0
    )


@functools.partial(
    jax.jit, static_argnames=("scheme", "n", "nb", "interpret", "has_q")
)
def _call_rk3(r, adv, fin, q, scal, *, scheme, n, nb, interpret, has_q):
    """r/adv/fin/q: (n, B1, B2) blocks; scal = [a, b, dt, dt*nu] (SMEM).

    Returns (q', f') of the Williamson substep with lap = T^{-1} r.
    """
    w, invd, du, uh, lh, t0, rinv, rsupport, has_uh, has_lh, _ = _leading_tables(
        scheme, n
    )
    kernel = functools.partial(
        _leading_kernel,
        n=n,
        nb=nb,
        halo=1,
        stencil=((), 1.0, 1.0, 0),  # solve-only: input IS the RHS
        rsupport=rsupport,
        has_uh=has_uh,
        has_lh=has_lh,
        rk=True,
        has_q=has_q,
    )
    B1, B2 = r.shape[1:]
    # resident block streams: r, adv, fin (+q) in, q' + f' out
    S = _auto_sublanes(n, B1, 6 if has_q else 5)
    grid = (B1 // S, B2 // LANE)
    block = lambda lead: pl.BlockSpec(
        (lead, S, LANE), lambda j, k: (0, j, k), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    cdt = jnp.float32
    extra = [adv.astype(cdt), fin.astype(cdt)]
    extra_specs = [block(n), block(n)]
    if has_q:
        extra.append(q.astype(cdt))
        extra_specs.append(block(n))
    gl = jnp.zeros((1,) + r.shape[1:], cdt)  # never read (solve-only)
    qout, fout = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(r.shape, cdt),
            jax.ShapeDtypeStruct(r.shape, cdt),
        ),
        grid=grid,
        in_specs=[smem(), block(n), block(1), block(1)]
        + [smem()] * 7
        + [smem()]
        + extra_specs,
        out_specs=(block(n), block(n)),
        cost_estimate=pl.CostEstimate(
            flops=16 * r.size,
            bytes_accessed=(6 if has_q else 5) * r.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.ones((1,), cdt),  # inv_dx unused at derivative order 0
        r.astype(cdt),
        gl,
        gl,
        *(jnp.asarray(a) for a in (w, invd, du, uh, lh, t0, rinv)),
        scal.astype(cdt),
        *extra,
    )
    return qout, fout


def rk3_solve_update(
    r: jax.Array,
    adv: jax.Array,
    q,
    fin: jax.Array,
    scheme: CompactScheme,
    *,
    a,
    b,
    dt,
    nu,
    interpret: bool = False,
):
    """Fused Williamson RK3 substep finisher: one dispatch computes
    ``lap = T_z^{-1} r`` (the four-pass Laplacian's solve, with ``r``
    from ops/pallas_lap.lap_rhs) and emits

        q' = a*q + dt*(nu*lap - adv)        f' = fin + b*q'

    inside the backward sweep — the solve's 1 read + 1 write grows to
    4 reads + 2 writes, but the separate 9-read elementwise RK pass
    disappears entirely. ``q=None`` encodes the first substep (a == 0).
    Returns ``(q', f')`` in ``fin``'s dtype.
    """
    if r.ndim != 3:
        raise ValueError(f"rk3_solve_update needs (nz, ny, nx) fields, got {r.shape}")
    if not rk3_update_supported(scheme, r.shape, r.dtype, has_q=q is not None):
        raise ValueError(
            f"rk3 update kernel unsupported for shape {r.shape} dtype "
            f"{r.dtype} scheme {scheme.name}"
        )
    for name, arr in (("adv", adv), ("fin", fin)) + (
        (("q", q),) if q is not None else ()
    ):
        if arr.shape != r.shape:
            raise ValueError(f"{name} shape {arr.shape} != rhs shape {r.shape}")
    n = r.shape[0]
    nb = _pick_nb(n)
    scal = jnp.stack(
        [
            jnp.asarray(a, jnp.float32),
            jnp.asarray(b, jnp.float32),
            jnp.asarray(dt, jnp.float32),
            jnp.asarray(dt, jnp.float32) * jnp.asarray(nu, jnp.float32),
        ]
    )
    qout, fout = _call_rk3(
        r,
        adv,
        fin,
        q if q is not None else r,  # placeholder, unused when has_q=False
        scal,
        scheme=scheme,
        n=n,
        nb=nb,
        interpret=interpret,
        has_q=q is not None,
    )
    return qout.astype(fin.dtype), fout.astype(fin.dtype)
