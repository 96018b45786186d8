"""Lane-axis fused compact-derivative Pallas kernel (d/dx without transposes).

The headline op dfdx differentiates the *minor* axis of ``[..., nz, ny, nx]``
fields — the TPU lane dimension. Round 1 served it either with the dense
(n, n) operator on the MXU (n multiply-adds per point) or with the
leading-axis fused kernel wrapped in two full transposes (~4 extra HBM
passes). This kernel removes both taxes: the field never changes layout and
the MXU work drops from n to 128 MACs per point.

Design rules, each measured on v5e at 256^3 f32 (the HBM floor — one read of
f, one write of f' — is 0.12-0.16 ms depending on chip load):

* **K=128 block matmuls hide behind the DMA** when the kernel advertises a
  memory-biased cost estimate: a dots-only kernel times like a pure copy.
  Substantiated by device timeline, not just chain slopes: the committed
  profiler capture (benchmarks/results/trace_dfdx_256, parse with
  ``cfd_tpu.utils.xplane``) shows the fold kernel at 0.2087 ms mean vs
  0.2043 ms for a pure elementwise read+write of the same 256^3 f32 array
  in the same capture — the kernel's MXU/VPU work costs 2% over the copy
  floor; the roll form reads 0.2253 ms (+10%, the exposed lane rolls).
* **Extra in-kernel matmuls do NOT hide.** Each additional dot costs full
  (K-tile x M-tile x 6-pass) quanta of schedule time; routing the interface
  and closure corrections through two more dots measured +0.2 ms even with
  all shapes 128-aligned. The corrections therefore stay on the VPU as a
  handful of rank-1 broadcast-FMAs.
* **The cyclic lane rolls are the dominant exposed VPU cost.** Folding the
  RHS stencil into the per-block operators (``M_b = T_b^{-1} B_b`` plus
  rank-1 edge-lane columns) removes every roll and measured 0.168 ms vs
  0.240 ms (100 vs 70 Gpt/s) at 256^3 — at an accuracy price (next rule),
  so the kernel ships both forms: ``fold`` for short lines, rolls beyond.
* **Folding the O(1/dx) stencil into the matmul costs smooth-field digits
  that grow with n — unless the demeaned residual tracks the output
  scale.** On smooth fields the exact stencil cancels to O(dx f'), but
  the folded dot's rounding is relative to the operand magnitude. With a
  full-*line* mean subtracted the residual stays O(1) while the output
  shrinks like dx, so the relative error grew ~n/256 (1.3e-6 at 256 ->
  5.2e-5 at 2048) and round 2 capped the fold at ``FOLD_MAX``. Round 3's
  **per-block demean** (see next rule) keeps the residual at
  O(block-extent x f') and cuts the n=2048 error 4.3x (1.2e-5); rough
  fields never paid the penalty. The roll form's ``f[i+k] - f[i-k]``
  differences remain the most accurate (n-independent ~1e-6), so the
  fold/roll routing is now purely a speed choice.
* **Demeaning is mandatory in the fold form, and per-block is both exact
  and better-conditioned.** Every row of B annihilates constants
  (closures included), and row i of B is supported on exactly the
  in-block + edge columns block b's fold reads — so subtracting *block
  b's own mean* from those reads leaves the result unchanged while
  spending the f32 mantissa on the local fluctuation. Skipping demeaning
  entirely costs 20x at n=256 (2.4e-5 vs 1.3e-6 measured); the extra VPU
  passes are ~2% of kernel time. Filters (order 0) must NOT demean.
* **Every per-line scalar must be a functional of local differences**
  (roll form). Closure deltas built from f lose a factor O(n) to f's O(1)
  mean (measured 2e-5 at the boundary lane at n=1024); built from the
  first differences ``g[i] = f[i+1] - f[i]`` they are n-independent ~1e-6.

**Fold form** (auto for n <= ``FOLD_MAX``; any n on request), per (R, n)
row-block:

1. ``mu_b = mean(f_b)`` per 128-lane block (lane reduction)       (VPU)
2. ``xr_b = (f_b - mu_b) @ (M_b^T / dx)`` with ``M_b = T_b^{-1} B_bb``
   per 128-lane block                                        (MXU, K=128)
3. ``xr_b += (f[:, j] - mu_b) x col_{b,j}`` for each edge lane j of
   the neighbouring blocks that B couples in (bandwidth many per side;
   closures live inside B so need no special handling)            (VPU)
4. interface faces -> correction via D (as below)                 (VPU)

**Roll form** (n > ``_FOLD_MAX``), per (R, n) row-block (tables
precomputed in float64 — the same substructuring tables as the
distributed solver, parallel/compact.direction_tables):

1. ``g = roll(f,-1) - f``; ``rhs[i] = sum_k w_k (f[i+k]-f[i-k])`` as
   windowed sums of g (single-offset schemes fold w into the tables, so
   the in-kernel RHS is a bare difference)                        (VPU)
2. ``xr_b = rhs_b @ (tinv_b^T w/dx)`` per 128-lane block     (MXU, K=128)
3. closure-row RHS deltas from sparse g-taps (true closure stencil minus
   the wrapped interior stencil, both local in g-space), each applied as
   ``delta_c x (w/dx) T^{-1}[:, j_c]`` — the exact full-line inverse
   response of the patched row, restricted to the blocks where it is
   numerically nonzero (geometric decay)                          (VPU)
4. interface faces from xr block-edge lanes; reduced interface solve +
   rank-2 unit-load update collapsed into one faces-to-output map
   ``out += faces @ D``, one broadcast-FMA per *nonzero* row of D
   (physical line ends drop statically — the identity rows of the
   reduced matrix, reference kernels.cu:106-111)                  (VPU)
5. ``out_b = xr_b + corr_b``                                      (VPU)

The linearity behind step 3: the true RHS is ``rhs_wrapped + sum delta_j
e_j`` and the solve is linear, so the output is the wrapped-RHS solve plus
``delta_j`` times the inverse response of row j.

This is the TPU formulation of the reference's fused CUDA aspiration
(kernels.cu computeRHS + CR solve + sumSolutions in one pass): HBM-bound by
construction, with the sequential Thomas recurrence replaced by MXU block
solves so nothing is latency-bound. float32/bfloat16 fields only (float64
callers take the PCR path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..schemes import CompactScheme, lhs_bands, rhs_matrix

__all__ = ["lane_derivative", "lane_supported", "BLOCK_LANES", "FOLD_MAX"]

BLOCK_LANES = 128  # substructuring block length = one lane group

# longest line for which 'auto' picks the fold form over the roll form —
# a speed preference (at larger volumes both run at the machine's copy
# floor; the roll form's differences stay the accuracy champion), not a
# correctness cap: since the per-block demean (round 3) the fold form is
# accuracy-safe at any n and serves d2/filter schemes there too
FOLD_MAX = 256


def lane_supported(scheme: CompactScheme, n: int, dtype) -> bool:
    """Whether the lane kernel can differentiate lines of length ``n``.

    d2 and filter schemes run the table-generic fold form at any supported
    n (the roll form's in-kernel RHS assumes the antisymmetric
    first-derivative stencil): B annihilates constants for d2 so the
    per-block demean stays valid (measured 1.9x the dense matmul at 256^3
    with equal accuracy); filters skip demeaning (their B preserves
    constants) and have no cancellation to lose.

    n == 128 (round 5) is the single-block case: one block cyclically
    coupled to itself — direction_tables builds the self-coupled 2x2
    reduced system, and the kernels run unchanged with nb=1. This is what
    lets the fused pipelines (pair/vec/megastep) serve 128-point lines,
    e.g. the shards of a 256^3 grid on a 2x2x2 mesh.
    """
    return (
        dtype in (jnp.float32, jnp.bfloat16)
        and n % BLOCK_LANES == 0
        and n // BLOCK_LANES >= 1
    )


@functools.lru_cache(maxsize=None)
def _full_inverse(scheme: CompactScheme, n: int) -> np.ndarray:
    """Dense inverse of the full-line LHS (float64, cached)."""
    dl, d, du = lhs_bands(scheme, n)
    T = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
    if scheme.periodic:
        T[0, -1] = scheme.alpha
        T[-1, 0] = scheme.alpha
    return np.linalg.inv(T)


@functools.lru_cache(maxsize=None)
def _lane_tables(scheme: CompactScheme, n: int):
    """Kernel tables (float64 math, truncated to float32 at the end).

    The caller scales Tm and Q by ``wfold/dx`` at trace time (D maps
    already-scaled faces, so it stays unscaled).

    Returns (Tm, D, Q, closure_taps, closure_blocks, d_nonzero, wfold):
      Tm — (nb, 128, 128) transposed dense block inverses
      D  — (2nb, n) faces-to-output correction
           (``D[k] = rinv[2b,k] uh_b + rinv[2b+1,k] lh_b``; rows 0/2nb-1
           zeroed for non-periodic)
      Q  — (nc, n) exact full-line inverse responses T^{-1}[:, j]^T of
           the closure rows, or None for periodic schemes
      closure_taps   — per closure row, ((g-lane, coeff), ...) of the
           delta functional in g-space (g[i] = f[i+1] - f[i], cyclic)
      closure_blocks — per closure row, tuple of block indices where the
           response Q is numerically nonzero (geometric decay)
      d_nonzero — indices of rows of D that are not identically zero
      wfold — interior weight folded out of the in-kernel stencil
    """
    from .derivatives import _blocked_tables

    nb = n // BLOCK_LANES
    m = BLOCK_LANES
    tinv, uh, lh, rinv = _blocked_tables(scheme, n, nb)
    Tm = np.ascontiguousarray(np.transpose(tinv, (0, 2, 1)))

    D = np.zeros((2 * nb, n))
    for b in range(nb):
        sl = slice(m * b, m * (b + 1))
        D[:, sl] = np.outer(rinv[2 * b], uh[b]) + np.outer(rinv[2 * b + 1], lh[b])
    if not scheme.periodic:
        D[0, :] = 0.0
        D[-1, :] = 0.0
    d_nonzero = tuple(int(k) for k in range(2 * nb) if np.any(D[k]))

    single = len(scheme.rhs_offsets) == 1
    wfold = scheme.rhs_weights[0] if single else 1.0

    Q = None
    closure_taps = ()
    closure_blocks = ()
    if not scheme.periodic and scheme.left_rows:
        rows = []  # closure line indices
        trues = []  # true RHS functional in g-space
        for j, row in enumerate(scheme.left_rows):
            rows.append(j)
            # sum_m c_m f[m] = sum_t C_t g[t],  C_t = sum_{m>t} c_m
            c = np.asarray(row.rhs_stencil) / wfold
            t = np.zeros(n)
            t[: len(c) - 1] = np.cumsum(c[::-1])[::-1][1:]
            trues.append(t)
        for jr, row in enumerate(scheme.right_rows):
            rows.append(n - 1 - jr)
            # stencil applied to f[n-mlen:] reversed (rhs_matrix convention)
            st = np.asarray(row.rhs_stencil[::-1]) / wfold
            t = np.zeros(n)
            t[n - len(st) : n - 1] = np.cumsum(st[::-1])[::-1][1:]
            trues.append(t)
        taps, blocks = [], []
        Tinv = _full_inverse(scheme, n)
        for j, t in zip(rows, trues):
            s = t.copy()
            # subtract the wrapped interior stencil the kernel computes:
            # rhs[j] = sum_k (w_k/wfold) sum_{sh=1-k..k} g[(j-sh) mod n]
            for k, wt in zip(scheme.rhs_offsets, scheme.rhs_weights):
                for sh in range(1 - k, k + 1):
                    s[(j - sh) % n] -= wt / wfold
            taps.append(
                tuple(
                    (int(t_), float(s[t_]))
                    for t_ in np.nonzero(np.abs(s) > 1e-14)[0]
                )
            )
            resp = Tinv[:, j]
            blocks.append(
                tuple(
                    b
                    for b in range(nb)
                    if np.abs(resp[m * b : m * (b + 1)]).max() > 1e-12
                )
            )
        Q = np.stack([Tinv[:, j] for j in rows])
        closure_taps = tuple(taps)
        closure_blocks = tuple(blocks)

    f32 = lambda a: None if a is None else np.asarray(a, np.float32)
    return (
        f32(Tm),
        f32(D),
        f32(Q),
        closure_taps,
        closure_blocks,
        d_nonzero,
        float(wfold),
    )


@functools.lru_cache(maxsize=None)
def d_block_map(scheme: CompactScheme, n: int):
    """Per-interface-row block support of the faces-to-output map D.

    Each row of D is numerically supported on ~2 of the nb blocks (the
    unit-load responses uh/lh decay inside their block and the
    reduced-inverse rows decay across blocks — measured exactly 2 blocks
    above 1e-12 of the row max for every n up to 2048). Applying the
    correction only there caps its cost at O(1) FMAs/point for any line
    length, where the dense form grows as O(nb) — the dominant exposed
    VPU cost at n >= 512.

    Returns {row k: (block indices)} as a tuple-of-tuples aligned with
    ``d_nonzero``.
    """
    _, D, _, _, _, d_nonzero, _ = _lane_tables(scheme, n)
    m = BLOCK_LANES
    nb = n // m
    bm = np.abs(np.asarray(D, np.float64)).reshape(D.shape[0], nb, m).max(-1)
    out = []
    for k in d_nonzero:
        thresh = 1e-12 * bm[k].max()
        out.append(tuple(int(b) for b in range(nb) if bm[k, b] > thresh))
    return tuple(out)


def _apply_sparse_corr(xr, d_ref, d_nonzero, d_blocks, nb, m, faces_axis):
    """Shared sparse interface correction for the lane/sublane bodies.

    ``faces_axis`` = 1 for (R, n) row tiles (lane), 0 for (n, C) column
    tiles (sublane). Returns the corrected list of blocks.
    """
    faces = []
    for k in d_nonzero:
        b, e = divmod(k, 2)
        edge = 0 if e == 0 else m - 1
        if faces_axis == 1:
            faces.append(-xr[b][:, edge : edge + 1])  # (R, 1)
        else:
            faces.append(-xr[b][edge : edge + 1, :])  # (1, C)
    out = []
    for b2 in range(nb):
        blk = xr[b2]
        sl = slice(m * b2, m * (b2 + 1))
        for i, k in enumerate(d_nonzero):
            if b2 not in d_blocks[i]:
                continue
            if faces_axis == 1:
                blk = blk + faces[i] * d_ref[k : k + 1, sl]
            else:
                blk = blk + d_ref[sl, k : k + 1] * faces[i]
        out.append(blk)
    return out


@functools.lru_cache(maxsize=None)
def _fold_tables(scheme: CompactScheme, n: int):
    """Fold-form tables (float64 math, truncated to float32 at the end).

    Returns (Mt, E, edges_meta):
      Mt — (nb, 128, 128) transposed folded block operators
           ``(T_b^{-1} B_bb)^T`` (caller scales by 1/dx)
      E  — (ne, n) edge-column rows: one per (block b, out-of-block lane j)
           that B couples into b, holding ``T_b^{-1} B[b-rows, j]`` in
           block b's lanes (caller scales by 1/dx)
      edges_meta — per block, tuple of the source lanes j, in E row order
    """
    from .derivatives import _blocked_tables

    nb = n // BLOCK_LANES
    m = BLOCK_LANES
    tinv, _, _, _ = _blocked_tables(scheme, n, nb)
    B = rhs_matrix(scheme, n)
    Mt = np.empty((nb, m, m))
    e_rows = []
    edges_meta = []
    for b in range(nb):
        sl = slice(m * b, m * (b + 1))
        Mt[b] = (tinv[b] @ B[sl, sl]).T
        outside = np.ones(n, bool)
        outside[sl] = False
        idx = np.nonzero(outside)[0]
        js = tuple(int(j) for j in idx[np.any(B[sl][:, idx] != 0.0, axis=0)])
        for j in js:
            row = np.zeros(n)
            row[sl] = tinv[b] @ B[sl, j]
            e_rows.append(row)
        edges_meta.append(js)
    E = np.stack(e_rows) if e_rows else np.zeros((1, n))
    return (
        np.asarray(Mt, np.float32),
        np.asarray(E, np.float32),
        tuple(edges_meta),
    )


def _lane_fold_kernel(
    f_ref,
    t_ref,
    d_ref,
    e_ref,
    out_ref,
    *,
    n: int,
    nb: int,
    edges_meta,
    d_nonzero,
    compute_dtype,
    demean="block",
    d_blocks=None,
):
    """One (R, n) row-block, fold form; see module docstring."""
    blocks = lane_fold_blocks(
        f_ref[:],
        t_ref,
        d_ref,
        e_ref,
        nb=nb,
        edges_meta=edges_meta,
        d_nonzero=d_nonzero,
        compute_dtype=compute_dtype,
        demean=demean,
        d_blocks=d_blocks,
    )
    m = BLOCK_LANES
    for b in range(nb):
        out_ref[:, m * b : m * (b + 1)] = blocks[b].astype(out_ref.dtype)


def lane_fold_blocks(
    f,
    t_ref,
    d_ref,
    e_ref,
    *,
    nb: int,
    edges_meta,
    d_nonzero,
    compute_dtype,
    demean="block",
    d_blocks=None,
):
    """Fold-form compute on a loaded (R, n) tile -> list of nb (R, m) blocks.

    Shared between the lane kernel and the fused two-axis pair kernel
    (ops/pallas_pair.py): table refs/arrays index identically, so the same
    body serves both.
    """
    m = BLOCK_LANES
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=compute_dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    f = f.astype(compute_dtype)
    # Demeaning: derivative B annihilates constants, so any constant may be
    # subtracted before the folded dot — in f32 this spends the mantissa on
    # the fluctuation instead of the O(1) offset (20x accuracy at n=256 —
    # module docstring). Filters (order 0) must NOT demean: their B
    # preserves constants.
    #
    # 'block' subtracts each 128-lane block's own mean from that block's
    # columns AND from the edge lanes its operator couples in. This is
    # exact for the same reason the line mean is: row i of B is supported
    # on exactly the in-block + edge columns the fold computes, and sums
    # to zero over them. The payoff is the *scale* of the residual: the
    # line-demeaned fluctuation is O(1) for a smooth field spanning the
    # domain, so the folded dot's rounding is O(eps)/O(dx f') ~ n and the
    # fold form had to stop at FOLD_MAX=256; the block-demeaned residual
    # is O(m dx f') — proportional to the output scale — making the
    # relative error n-independent (measured: 1.2e-6 at 256 through 2048,
    # where 'line' grows 1.3e-6 -> 8e-5).
    if demean == "line":
        fc = f - jnp.mean(f, axis=1, keepdims=True)
        mus = None
    elif demean:  # 'block' (default for derivative schemes)
        fc = f
        mus = [
            jnp.mean(f[:, m * b : m * (b + 1)], axis=1, keepdims=True)
            for b in range(nb)
        ]
    else:
        fc = f
        mus = None

    xr = []
    ei = 0
    for b in range(nb):
        mu = mus[b] if mus is not None else None
        fb = fc[:, m * b : m * (b + 1)]
        if mu is not None:
            fb = fb - mu
        x = dot(fb, t_ref[b])
        for j in edges_meta[b]:
            fj = fc[:, j : j + 1]
            if mu is not None:
                fj = fj - mu
            x = x + fj * e_ref[ei : ei + 1, m * b : m * (b + 1)]
            ei += 1
        xr.append(x)

    if d_blocks is not None:
        # sparse form: each D row touches ~2 blocks (d_block_map) — O(1)
        # FMAs/point at any n, vs O(nb) for the dense sweep below
        return _apply_sparse_corr(xr, d_ref, d_nonzero, d_blocks, nb, m, 1)
    corr = None
    for k in d_nonzero:
        b, e = divmod(k, 2)
        lane = 0 if e == 0 else m - 1
        face = -xr[b][:, lane : lane + 1]  # (R, 1)
        t = face * d_ref[k : k + 1, :]  # (R, n) broadcast-FMA
        corr = t if corr is None else corr + t

    if corr is None:
        return xr
    return [
        xr[b] + corr[:, m * b : m * (b + 1)] for b in range(nb)
    ]


def _lane_kernel(
    f_ref,
    t_ref,
    d_ref,
    q_ref,
    out_ref,
    *,
    n: int,
    nb: int,
    scheme: CompactScheme,
    closure_taps,
    closure_blocks,
    d_nonzero,
    wfold: float,
    compute_dtype,
    d_blocks=None,
):
    """One (R, n) row-block; see module docstring for the step list."""
    blocks = lane_roll_blocks(
        f_ref[:],
        t_ref,
        d_ref,
        q_ref,
        n=n,
        nb=nb,
        scheme=scheme,
        closure_taps=closure_taps,
        closure_blocks=closure_blocks,
        d_nonzero=d_nonzero,
        wfold=wfold,
        compute_dtype=compute_dtype,
        d_blocks=d_blocks,
    )
    m = BLOCK_LANES
    for b in range(nb):
        out_ref[:, m * b : m * (b + 1)] = blocks[b].astype(out_ref.dtype)


def lane_roll_blocks(
    f,
    t_ref,
    d_ref,
    q_ref,
    *,
    n: int,
    nb: int,
    scheme: CompactScheme,
    closure_taps,
    closure_blocks,
    d_nonzero,
    wfold: float,
    compute_dtype,
    d_blocks=None,
):
    """Roll-form compute on a loaded (R, n) tile -> list of nb (R, m)
    blocks (see module docstring for the step list; shared with the fused
    pair kernel)."""
    m = BLOCK_LANES
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=compute_dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    f = f.astype(compute_dtype)

    # 1. first differences + compact RHS as windowed sums of g
    g = pltpu.roll(f, n - 1, 1) - f
    rhs = None
    for k, wt in zip(scheme.rhs_offsets, scheme.rhs_weights):
        term = None
        for s in range(1 - k, k + 1):
            piece = g if s == 0 else pltpu.roll(g, s % n, 1)
            term = piece if term is None else term + piece
        if wt != wfold:
            term = (wt / wfold) * term
        rhs = term if rhs is None else rhs + term

    # 2. per-block dense solves (MXU, K = 128 exactly)
    xr = [dot(rhs[:, m * b : m * (b + 1)], t_ref[b]) for b in range(nb)]

    # 3. closure-row deltas (sparse g-taps) x inverse responses
    for c, taps in enumerate(closure_taps):
        delta = None
        for lane, w in taps:
            piece = w * g[:, lane : lane + 1]
            delta = piece if delta is None else delta + piece
        for b in closure_blocks[c]:
            xr[b] = xr[b] + delta * q_ref[c : c + 1, m * b : m * (b + 1)]

    # 4./5. interface faces -> correction + assemble
    if d_blocks is not None:
        return _apply_sparse_corr(xr, d_ref, d_nonzero, d_blocks, nb, m, 1)
    corr = None
    for k in d_nonzero:
        b, e = divmod(k, 2)
        lane = 0 if e == 0 else m - 1
        face = -xr[b][:, lane : lane + 1]  # (R, 1)
        t = face * d_ref[k : k + 1, :]  # (R, n) broadcast-FMA
        corr = t if corr is None else corr + t

    if corr is None:
        return xr
    return [xr[b] + corr[:, m * b : m * (b + 1)] for b in range(nb)]


def _pick_rows(n: int, itemsize: int) -> int:
    """Row-block size: in/out double-buffered + g/rhs/xr/corr temps, ~12 MB."""
    budget = 12 * 1024 * 1024
    r = 1024
    while r > 256 and 7 * r * n * itemsize > budget:
        r //= 2
    return r


@functools.partial(
    jax.jit, static_argnames=("scheme", "n", "rows", "interpret", "demean")
)
def _call_lane_fold(f2, Mt, D, E, *, scheme, n, rows, interpret, demean=None):
    B = f2.shape[0]
    nb = n // BLOCK_LANES
    _, _, edges_meta = _fold_tables(scheme, n)
    _, _, _, _, _, d_nonzero, _ = _lane_tables(scheme, n)
    if demean is None:
        demean = "block" if scheme.derivative_order != 0 else False
    kernel = functools.partial(
        _lane_fold_kernel,
        n=n,
        nb=nb,
        edges_meta=edges_meta,
        d_nonzero=d_nonzero,
        compute_dtype=jnp.float32,
        demean=demean,
        d_blocks=d_block_map(scheme, n),
    )
    whole = lambda *shape: pl.BlockSpec(
        shape, lambda j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n), f2.dtype),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, n), lambda j: (j, 0), memory_space=pltpu.VMEM),
            whole(nb, BLOCK_LANES, BLOCK_LANES),
            whole(D.shape[0], n),
            whole(E.shape[0], n),
        ],
        out_specs=pl.BlockSpec(
            (rows, n), lambda j: (j, 0), memory_space=pltpu.VMEM
        ),
        # same memory-biased estimate as the roll form: the K=128 dots
        # hide behind the HBM DMA
        cost_estimate=pl.CostEstimate(
            flops=8 * n * B,
            bytes_accessed=2 * n * B * f2.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(f2, Mt, D, E)


@functools.partial(jax.jit, static_argnames=("scheme", "n", "rows", "interpret"))
def _call_lane(f2, Tm, D, Q, *, scheme, n, rows, interpret):
    B = f2.shape[0]
    nb = n // BLOCK_LANES
    _, _, _, closure_taps, closure_blocks, d_nonzero, wfold = _lane_tables(
        scheme, n
    )
    kernel = functools.partial(
        _lane_kernel,
        n=n,
        nb=nb,
        scheme=scheme,
        closure_taps=closure_taps,
        closure_blocks=closure_blocks,
        d_nonzero=d_nonzero,
        wfold=wfold,
        compute_dtype=jnp.float32,
        d_blocks=d_block_map(scheme, n),
    )
    nc = Q.shape[0]
    whole = lambda *shape: pl.BlockSpec(
        shape, lambda j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n), f2.dtype),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, n), lambda j: (j, 0), memory_space=pltpu.VMEM),
            whole(nb, BLOCK_LANES, BLOCK_LANES),
            whole(2 * nb, n),
            whole(nc, n),
        ],
        out_specs=pl.BlockSpec(
            (rows, n), lambda j: (j, 0), memory_space=pltpu.VMEM
        ),
        # memory-biased estimate: the MXU work hides behind the HBM DMA and
        # biasing the scheduler toward bandwidth measures ~15% faster than
        # advertising the true (6-pass) flop count
        cost_estimate=pl.CostEstimate(
            flops=8 * n * B,
            bytes_accessed=2 * n * B * f2.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(f2, Tm, D, Q)


def lane_derivative(
    f: jax.Array,
    dx,
    scheme: CompactScheme,
    *,
    rows: int = None,
    interpret: bool = False,
    fold: bool = None,
    demean=None,
) -> jax.Array:
    """Compact derivative along the last axis of ``f`` (..., n), fused.

    float32/bfloat16, n a multiple of 128 with at least two blocks
    (``lane_supported``); callers fall back to the other backends otherwise.
    ``fold`` picks the roll-free folded-operator form (default: lines up to
    ``FOLD_MAX`` — 1.4x faster, smooth-field rounding grows with n; see the
    module docstring).
    """
    if f.dtype == jnp.float64:
        raise ValueError(
            "the lane Pallas path supports float32/bfloat16 only; use "
            "method='pcr' for float64 runs"
        )
    n = f.shape[-1]
    if not lane_supported(scheme, n, f.dtype):
        raise ValueError(
            f"lane kernel needs n % {BLOCK_LANES} == 0; got n={n}"
        )
    if scheme.derivative_order != 1:
        if fold is False:
            raise ValueError(
                "the roll form is first-derivative only; d2/filter schemes "
                "run the fold form (n <= FOLD_MAX)"
            )
        fold = True
    if fold is None:
        fold = n <= FOLD_MAX
    bshape = f.shape[:-1]
    B = int(np.prod(bshape)) if bshape else 1
    f2 = f.reshape(B, n)
    if rows is None:
        rows = _pick_rows(n, f.dtype.itemsize)
    rows = min(rows, max(8, -(-B // 8) * 8))
    Bp = -(-B // rows) * rows
    if Bp != B:
        f2 = jnp.pad(f2, ((0, Bp - B), (0, 0)))
    if fold:
        Mt, E, _ = _fold_tables(scheme, n)
        _, D, _, _, _, _, _ = _lane_tables(scheme, n)
        inv_dx = (
            jnp.asarray(1.0, jnp.float32) / jnp.asarray(dx, jnp.float32)
        ) ** scheme.derivative_order
        out = _call_lane_fold(
            f2,
            jnp.asarray(Mt) * inv_dx,
            jnp.asarray(D),
            jnp.asarray(E) * inv_dx,
            scheme=scheme,
            n=n,
            rows=rows,
            interpret=interpret,
            demean=demean,
        )
    else:
        Tm, D, Q, _, _, _, wfold = _lane_tables(scheme, n)
        if Q is None:  # periodic: keep the kernel signature static
            Q = np.zeros((1, n), np.float32)
        scale = jnp.asarray(wfold, jnp.float32) / jnp.asarray(dx, jnp.float32)
        out = _call_lane(
            f2,
            jnp.asarray(Tm) * scale,
            jnp.asarray(D),
            jnp.asarray(Q) * scale,
            scheme=scheme,
            n=n,
            rows=rows,
            interpret=interpret,
        )
    if Bp != B:
        out = out[:B]
    return out.reshape(f.shape)
