"""Mega leading-axis kernel: d1z + Laplacian solve + RK update, one pass.

The four-dispatch fused RK3 substep (ops/fused_step.py) still walks the
leading axis twice: once for the advection term's dfdz (the leading d1
kernel with mul/acc epilogue — f, axy, uz in, adv out: 4 HBM passes) and
once for the Laplacian solve + update (rk3_solve_update — r, adv, q, f
in, q', f' out: 6 passes). Both are substructured Thomas sweeps down the
same axis over the same blocks, and the second needs the first's output
only POINTWISE, row by row, in exactly the order the backward sweeps
emit rows. So one kernel can run BOTH sweep families interleaved:

    forward:  yA = Thomas fwd of B1_z f   (d1 stencil, ghosts)
              yB = Thomas fwd of r        (identity: r is the RHS)
    backward: fz  = backsolve(yA) / dz    -> adv = axy + uz * fz
              lap = backsolve(yB)
              q'  = a q + dt (nu lap - adv);   f' = f + b q'

7 HBM passes (f, r, axy, uz, q in; q', f' out) instead of 10, and one
dispatch instead of two — per substep the whole step becomes THREE
dispatches / 13 passes. The two output buffers double as the two forward
sweeps' scratch (each backward row reads its scratch value before
overwriting it), so the kernel needs no extra VMEM beyond the streamed
blocks: 7 double-buffered (n, S, 128) streams = 14.7 MB at 256^3 S=8 —
inside the ~16 MB VMEM but over the conservative 12 MB budget the other
kernels use, hence the dedicated budget constant below. Sub-block
interleaving, in-sweep interface faces, the SMEM reduced solve and the
folded rank-2 update are exactly ops/pallas_leading.py's (same tables,
both sweep families).

Reference lineage: fuses what the reference runs as separate computeRHS/
CR-solve/sumSolutions launches per derivative plus host elementwise
arithmetic (/root/reference/code/cuda/compact.py:29-44, kernels.cu:4-74)
— an aggregate the reference never fused; its production shape is the
repeated-dfdx harness (perf-test/multi-GPU/PyCUDA/run.py:47-58).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..schemes import CompactScheme
from .pallas_leading import (
    LANE,
    _leading_tables,
    _pick_nb,
    _stencil,
    leading_supported,
)
from .rhs import closure_ghosts

__all__ = ["rk3_mega", "rk3_mega_supported"]

# 7 streams double-buffered: allow up to ~15 MB of the ~16 MB VMEM
_VMEM_MEGA = 15 * 1024 * 1024


def _mega_sublanes(n: int, b1: int, halves: int) -> int:
    """Largest sublane count whose VMEM footprint fits the budget.

    ``halves`` counts (n, s, LANE) f32 buffers in HALF-stream units: a
    double-buffered HBM stream costs 2, a single-buffered VMEM scratch 1.
    """
    for s in (16, 8):
        if b1 % s == 0 and halves * n * s * LANE * 4 <= _VMEM_MEGA:
            return s
    return 0


def rk3_mega_supported(
    scheme1: CompactScheme, scheme2: CompactScheme, shape, dtype, has_q=True
) -> bool:
    """Whether the one-dispatch d1z+solve+update kernel applies."""
    if len(shape) != 3 or dtype != jnp.float32:
        return False
    nz, ny, nx = shape
    if not (
        leading_supported(scheme1, nz, dtype)
        and leading_supported(scheme2, nz, dtype)
    ):
        return False
    n_streams = 7 if has_q else 6
    return (
        nx % LANE == 0
        and ny % 8 == 0
        and _mega_sublanes(nz, ny, 2 * n_streams) > 0
    )


def _mega_kernel(
    inv_dz_ref,
    f_ref,
    gl_ref,
    gr_ref,
    # d1 tables, then d2 tables (SMEM)
    w1_ref, invd1_ref, du1_ref, uh1_ref, lh1_ref, t01_ref, rinv1_ref,
    w2_ref, invd2_ref, du2_ref, uh2_ref, lh2_ref, t02_ref, rinv2_ref,
    scal_ref,
    r_ref,
    axy_ref,
    *refs,
    uz_is_f: bool,
    write_q: bool,
    n: int,
    nb: int,
    halo: int,
    stencil1,
    rsup1,
    has_uh1,
    has_lh1,
    rsup2,
    has_uh2,
    has_lh2,
    has_q: bool,
):
    """Two interleaved substructured sweep families + the RK epilogue.

    qout doubles as sweep B's forward scratch, fout as sweep A's. On the
    last RK3 substep (write_q=False) q' is dead, so qout is a VMEM
    scratch buffer instead of an HBM output — one fewer HBM pass.
    """
    # uz aliased to f (a Burgers component advected by itself): no separate
    # uz input stream — the epilogue reads the velocity from f's own block
    if uz_is_f:
        uz_ref = f_ref
    else:
        uz_ref, *refs = refs
    if has_q:
        q_ref, *refs = refs
    else:
        q_ref = None
    if write_q:
        qout_ref, fout_ref = refs
    else:
        fout_ref, qout_ref = refs  # scratch refs come after outputs
    taps, sgn, c0, _ = stencil1
    bz = n // nb

    shape1 = (1,) + qout_ref.shape[1:]
    zero = jnp.zeros(shape1, qout_ref.dtype)

    def row(i):
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

    def fwd_one(b, g, st, static):
        ysA, ffsA, ysB, ffsB = st
        if static:
            rA = rhs_at(lambda k: row(g + k))
        else:
            rA = rhs_at(lambda k: f_ref[pl.ds(g + k, 1)])
        yA = rA - w1_ref[g] * ysA[b]
        fout_ref[pl.ds(g, 1)] = yA
        ysA[b] = yA
        ffsA[b] = ffsA[b] + t01_ref[g] * rA
        rB = r_ref[pl.ds(g, 1)]
        yB = rB - w2_ref[g] * ysB[b]
        qout_ref[pl.ds(g, 1)] = yB
        ysB[b] = yB
        ffsB[b] = ffsB[b] + t02_ref[g] * rB

    # ---- forward sweeps, 2 families x nb interleaved chains --------------
    st = ([zero] * nb, [zero] * nb, [zero] * nb, [zero] * nb)
    for i in range(halo):  # edge rows need ghosts: peel (static)
        for b in range(nb):
            fwd_one(b, b * bz + i, st, static=True)

    def fwd_step(i, carry):
        st = tuple(list(c) for c in carry)
        for b in range(nb):
            fwd_one(b, b * bz + i, st, static=False)
        return tuple(tuple(c) for c in st)

    st = jax.lax.fori_loop(
        halo, bz - halo, fwd_step, tuple(tuple(c) for c in st)
    )
    st = tuple(list(c) for c in st)
    for i in range(bz - halo, bz):  # peel (static)
        for b in range(nb):
            fwd_one(b, b * bz + i, st, static=True)
    ysA, ffsA, ysB, ffsB = st

    # ---- interface faces + redundant reduced solves (per family) ---------
    def reduced(ys, ffs, invd_ref, rinv_ref, rsup):
        faces = []
        for b in range(nb):
            faces.append(-ffs[b])
            faces.append(-(ys[b] * invd_ref[(b + 1) * bz - 1]))
        us = []
        for j in range(2 * nb):
            acc = None
            for k in rsup[j]:
                term = rinv_ref[j * 2 * nb + k] * faces[k]
                acc = term if acc is None else acc + term
            us.append(zero if acc is None else acc)
        return us

    usA = reduced(ysA, ffsA, invd1_ref, rinv1_ref, rsup1)
    usB = reduced(ysB, ffsB, invd2_ref, rinv2_ref, rsup2)

    # ---- backward sweeps + epilogue ---------------------------------------
    def bwd_step(j, carry):
        xsA, xsB = list(carry[0]), list(carry[1])
        for b in range(nb):
            g = b * bz + (bz - 1) - j
            xA = (fout_ref[pl.ds(g, 1)] - du1_ref[g] * xsA[b]) * invd1_ref[g]
            totA = xA
            if has_uh1[b]:
                totA = totA + usA[2 * b] * uh1_ref[g]
            if has_lh1[b]:
                totA = totA + usA[2 * b + 1] * lh1_ref[g]
            xB = (qout_ref[pl.ds(g, 1)] - du2_ref[g] * xsB[b]) * invd2_ref[g]
            totB = xB
            if has_uh2[b]:
                totB = totB + usB[2 * b] * uh2_ref[g]
            if has_lh2[b]:
                totB = totB + usB[2 * b + 1] * lh2_ref[g]
            # totA*inv_dz = dfdz; totB = laplacian (solve-only family)
            adv = axy_ref[pl.ds(g, 1)] + uz_ref[pl.ds(g, 1)] * (
                totA * inv_dz_ref[0]
            )
            qn = scal_ref[3] * totB - scal_ref[2] * adv
            if has_q:
                qn = qn + scal_ref[0] * q_ref[pl.ds(g, 1)]
            if write_q:
                qout_ref[pl.ds(g, 1)] = qn
            fout_ref[pl.ds(g, 1)] = f_ref[pl.ds(g, 1)] + scal_ref[1] * qn
            xsA[b] = xA
            xsB[b] = xB
        return tuple(xsA), tuple(xsB)

    jax.lax.fori_loop(0, bz, bwd_step, ((zero,) * nb, (zero,) * nb))


@functools.partial(
    jax.jit,
    static_argnames=(
        "scheme1", "scheme2", "n", "nb", "halo", "interpret", "has_q",
        "uz_is_f", "write_q",
    ),
)
def _call_mega(
    f, gl, gr, r, axy, uz, q, scal, inv_dz,
    *, scheme1, scheme2, n, nb, halo, interpret, has_q, uz_is_f, write_q,
):
    t1 = _leading_tables(scheme1, n)
    t2 = _leading_tables(scheme2, n)
    (w1, invd1, du1, uh1, lh1, t01, rinv1, rsup1, has_uh1, has_lh1, _) = t1
    (w2, invd2, du2, uh2, lh2, t02, rinv2, rsup2, has_uh2, has_lh2, _) = t2
    kernel = functools.partial(
        _mega_kernel,
        uz_is_f=uz_is_f,
        write_q=write_q,
        n=n,
        nb=nb,
        halo=halo,
        stencil1=_stencil(scheme1),
        rsup1=rsup1,
        has_uh1=has_uh1,
        has_lh1=has_lh1,
        rsup2=rsup2,
        has_uh2=has_uh2,
        has_lh2=has_lh2,
        has_q=has_q,
    )
    B1, B2 = f.shape[1:]
    n_streams = (7 if has_q else 6) - (1 if uz_is_f else 0)
    hbm_streams = n_streams - (0 if write_q else 1)
    halves = 2 * hbm_streams + (0 if write_q else 1)  # scratch: single-buffered
    S = _mega_sublanes(n, B1, halves)
    grid = (B1 // S, B2 // LANE)
    block = lambda lead: pl.BlockSpec(
        (lead, S, LANE), lambda j, k: (0, j, k), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    cdt = jnp.float32
    extra = [r.astype(cdt), axy.astype(cdt)]
    if not uz_is_f:
        extra.append(uz.astype(cdt))
    extra_specs = [block(n)] * len(extra)
    if has_q:
        extra.append(q.astype(cdt))
        extra_specs.append(block(n))
    n_out = 2 if write_q else 1
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(f.shape, cdt) for _ in range(n_out)
        ),
        grid=grid,
        in_specs=[smem(), block(n), block(halo), block(halo)]
        + [smem()] * 14
        + [smem()]
        + extra_specs,
        out_specs=tuple(block(n) for _ in range(n_out)),
        scratch_shapes=(
            [] if write_q else [pltpu.VMEM((n, S, LANE), cdt)]
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * f.size,
            bytes_accessed=hbm_streams * f.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(inv_dz, cdt).reshape(1),
        f.astype(cdt),
        gl.astype(cdt),
        gr.astype(cdt),
        *(jnp.asarray(a) for a in (w1, invd1, du1, uh1, lh1, t01, rinv1)),
        *(jnp.asarray(a) for a in (w2, invd2, du2, uh2, lh2, t02, rinv2)),
        scal.astype(cdt),
        *extra,
    )
    return (out[0], out[1]) if write_q else (None, out[0])


def rk3_mega(
    f: jax.Array,
    r: jax.Array,
    axy: jax.Array,
    uz: jax.Array,
    q,
    scheme1: CompactScheme,
    scheme2: CompactScheme,
    dz,
    *,
    a,
    b,
    dt,
    nu,
    write_q: bool = True,
    interpret: bool = False,
):
    """One dispatch: dfdz of ``f``, Laplacian = T2^{-1} r, and the RK3
    substep update

        q' = a q + dt (nu lap - (axy + uz * dfdz));   f' = f + b q'

    Returns ``(q', f')``. ``q=None`` encodes the first substep (a == 0).
    ``write_q=False`` encodes the LAST substep: q' is dead there, so its
    buffer becomes VMEM scratch instead of an HBM output (one fewer HBM
    pass, f' bit-identical) and ``None`` is returned in its place.
    All arrays (nz, ny, nx); requires ``rk3_mega_supported``.

    When ``uz`` IS ``f`` (same array object — a Burgers z-component
    advected by itself), the separate uz input stream is dropped and the
    epilogue reads the velocity from f's own block: 6 HBM passes instead
    of 7, bit-identical output.
    """
    if f.ndim != 3:
        raise ValueError(f"rk3_mega needs (nz, ny, nx) fields, got {f.shape}")
    if not rk3_mega_supported(
        scheme1, scheme2, f.shape, f.dtype, has_q=q is not None
    ):
        raise ValueError(
            f"rk3 mega kernel unsupported for shape {f.shape} dtype "
            f"{f.dtype} schemes {scheme1.name}/{scheme2.name}"
        )
    for name, arr in (("r", r), ("axy", axy), ("uz", uz)) + (
        (("q", q),) if q is not None else ()
    ):
        if arr.shape != f.shape:
            raise ValueError(f"{name} shape {arr.shape} != field shape {f.shape}")
    uz_is_f = uz is f
    n = f.shape[0]
    nb = _pick_nb(n)
    gl, gr = closure_ghosts(f, scheme1)
    halo = gl.shape[0]
    scal = jnp.stack(
        [
            jnp.asarray(a, jnp.float32),
            jnp.asarray(b, jnp.float32),
            jnp.asarray(dt, jnp.float32),
            jnp.asarray(dt, jnp.float32) * jnp.asarray(nu, jnp.float32),
        ]
    )
    inv_dz = jnp.asarray(1.0, jnp.float32) / jnp.asarray(dz, jnp.float32)
    qout, fout = _call_mega(
        f,
        gl,
        gr,
        r,
        axy,
        uz,
        q if q is not None else f,  # placeholder, untraced when has_q=False
        scal,
        inv_dz,
        scheme1=scheme1,
        scheme2=scheme2,
        n=n,
        nb=nb,
        halo=halo,
        interpret=interpret,
        has_q=q is not None,
        uz_is_f=uz_is_f,
        write_q=write_q,
    )
    return (
        qout.astype(f.dtype) if write_q else None,
        fout.astype(f.dtype),
    )
