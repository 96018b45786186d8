"""Shard-local solver tables for the distributed fused Pallas kernels.

Round 3 made every single-device axis transpose-free (lane / sublane /
native-3D leading kernels); this module supplies the tables that let those
same kernels run the *sharded-line local solve* — the reference runs its
best single-GPU solver shard-locally (default 'templated' shared-mem CR,
/root/reference/code/cuda/compact.py:18,171-173), and the TPU build must
too.

The distributed solve is hierarchical substructuring:

* **outer level** (across shards, parallel/compact.py): each shard solves
  its truncated local block ``T_r x_R = rhs_r``, two interface faces per
  shard ride one ``all_gather``, a (2, 2p) matmul against precomputed
  reduced-inverse rows yields the shard's (alpha, beta), and the rank-2
  unit-load update closes the system.
* **inner level** (inside the kernel): the shard's local block is itself
  split into ``nb`` sub-blocks so the Thomas recurrence runs as nb
  interleaved dependency chains (ops/pallas_leading.py) or 128-lane MXU
  block solves (ops/pallas_lane.py) — with its own intra-shard reduced
  interface system, resolved entirely in-kernel.

Superposition makes the two levels independent: the kernel solves
``T_r`` *exactly* (inner substructuring is exact), and the outer correction
``x = x_R + alpha * UH_r + beta * LH_r`` uses the shard-level unit loads
``UH_r = T_r^{-1}(-alpha e_0)`` precomputed here in float64.

The outer faces need only the first/last row of ``x_R = T_r^{-1} rhs`` —
and tridiagonal inverse rows decay geometrically away from the diagonal
(ratio ~0.27 for alpha = 1/4), so ``x_R[0]`` is a K ~ 24-term functional of
the first K RHS rows. ``fw`` holds those truncated rows: the faces phase
reads ~2K/nl of the field instead of running a full extra solve, cutting
the distributed derivative to ~2 + 4K/nl shard-local HBM passes
(read f -> kernel solve -> write x, plus the two face slabs).

All tables are per-shard because shard 0 / shard p-1 carry the boundary
closure rows for non-periodic schemes (reference compact.py:159-166 patches
per-rank the same way); they ship through ``shard_map`` as stacked (p, ...)
arrays so the traced program stays SPMD-uniform — structure (sub-block
count, reduced support, unit-load flags) is unioned across shards, values
differ per shard.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..ops import tridiag
from ..schemes import CompactScheme, lhs_bands

__all__ = [
    "ShardKernelTables",
    "shard_kernel_tables",
    "LaneShardTables",
    "shard_lane_tables",
    "pick_nb",
]

_MIN_BZ = 32  # shortest sub-block: >= closure depth and >= 2*width+1
# truncation threshold for the face functionals: tridiagonal inverse rows
# decay geometrically, and the distributed Pallas path is f32/bf16-only —
# 1e-9 relative leaves the truncation two decades below f32 resolution
_FACE_TOL = 1e-9


def pick_nb(nl: int) -> int:
    """Sub-block count for a local line of length ``nl``: 8 interleaved
    Thomas chains when the line allows (ops/pallas_leading._pick_nb's ILP
    sweet spot), fewer for short lines, 1 as the always-valid floor."""
    for nb in (8, 4, 2):
        if nl % nb == 0 and nl // nb >= _MIN_BZ:
            return nb
    return 1


def _local_bands(scheme: CompactScheme, nl: int, first: bool, last: bool):
    """Bands of one shard's truncated local system (float64)."""
    return lhs_bands(scheme, nl, first_block=first, last_block=last)


def _dense(dl, d, du):
    return np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)


@functools.lru_cache(maxsize=None)
def local_block_tables(
    scheme: CompactScheme, nl: int, first: bool, last: bool, nb: int
):
    """Inner-level substructuring tables of one truncated local block.

    Returns float64 numpy arrays
    ``(w, invd, du, t0, uh, lh, rinv, rsupport)``:

      w/invd/du — (nl,) per-sub-block Thomas factors, concatenated
      t0        — (nl,) first rows of the sub-block inverses (the forward
                  sweep accumulates the sub-block-first face against these)
      uh/lh     — (nl,) intra-shard unit-load solutions (zero where a
                  sub-block has no intra coupling on that side)
      rinv      — (2nb, 2nb) intra reduced-matrix inverse with columns
                  0 / 2nb-1 zeroed (the block's outer ends carry no *intra*
                  load — couplings to neighbour shards live at the outer
                  level via the shard unit loads)
      rsupport  — per reduced unknown, indices of faces with weight above
                  1e-12 of the row max (geometric decay across sub-blocks)

    The sub-block boundary couplings are read off the band arrays (always
    the interior ``alpha`` — closure rows sit strictly inside the first /
    last sub-block since ``bz >= _MIN_BZ`` > closure depth).
    """
    if nl % nb:
        raise ValueError(f"local extent {nl} not divisible into {nb} blocks")
    ws, invds, dus, t0s, uhs, lhs_ = [], [], [], [], [], []
    for bands, Tinv, uh_b, lh_b in _sub_blocks(scheme, nl, first, last, nb):
        tf = tridiag.thomas_factor(*bands)
        ws.append(tf.w)
        invds.append(tf.invd)
        dus.append(tf.du)
        t0s.append(Tinv[0])
        uhs.append(uh_b)
        lhs_.append(lh_b)
    uh = np.stack(uhs)
    lh = np.stack(lhs_)
    rinv = _intra_reduced(uh, lh, nb)
    m = 2 * nb
    amax = np.abs(rinv).max() or 1.0
    rsupport = tuple(
        tuple(
            int(k) for k in range(m) if abs(rinv[j, k]) > 1e-12 * amax
        )
        for j in range(m)
    )
    return (
        np.concatenate(ws),
        np.concatenate(invds),
        np.concatenate(dus),
        np.concatenate(t0s),
        np.concatenate(uh),
        np.concatenate(lh),
        rinv,
        rsupport,
    )


def _intra_reduced(uh: np.ndarray, lh: np.ndarray, nb: int):
    """Masked inverse of the intra-shard reduced interface matrix.

    ``uh``/``lh`` are (nb, bz) unit-load solutions; the block's outer ends
    are identity unknowns (their couplings belong to the outer, cross-shard
    level), hence the identity end rows and the zeroed end columns.
    """
    m = 2 * nb
    R = np.zeros((m, m))
    for b in range(nb):
        er, orow = 2 * b, 2 * b + 1
        R[er, er] = uh[b, 0]
        R[er, orow] = lh[b, 0]
        if b > 0:
            R[er, er - 1] = -1.0
        R[orow, er] = uh[b, -1]
        R[orow, orow] = lh[b, -1]
        if b < nb - 1:
            R[orow, orow + 1] = -1.0
    R[0, :] = 0.0
    R[0, 0] = 1.0
    R[m - 1, :] = 0.0
    R[m - 1, m - 1] = 1.0
    rinv = np.linalg.inv(R)
    rinv[:, 0] = 0.0
    rinv[:, -1] = 0.0
    return rinv


def _sub_blocks(scheme, nl: int, first: bool, last: bool, nb: int):
    """Split a truncated local system into nb sub-blocks: per block the
    zero-ended bands, the dense inverse, and the intra unit loads."""
    dl, d, du = _local_bands(scheme, nl, first, last)
    bz = nl // nb
    out = []
    for b in range(nb):
        s, e = b * bz, (b + 1) * bz
        sdl = dl[s:e].copy()
        sdu = du[s:e].copy()
        up_c = sdl[0]
        lo_c = du[e - 1] if e < nl else 0.0
        sdl[0] = 0.0
        sdu[-1] = 0.0
        Tinv = np.linalg.inv(_dense(sdl, d[s:e], sdu))
        ev = np.zeros(bz)
        if b > 0:
            ev[0] = -up_c
            uh_b = Tinv @ ev
            ev[0] = 0.0
        else:
            uh_b = np.zeros(bz)
        if b < nb - 1:
            ev[-1] = -lo_c
            lh_b = Tinv @ ev
        else:
            lh_b = np.zeros(bz)
        out.append(((sdl, d[s:e].copy(), sdu), Tinv, uh_b, lh_b))
    return out


@dataclasses.dataclass(frozen=True)
class ShardKernelTables:
    """Stacked (p, ...) float64 tables + SPMD-uniform static metadata."""

    # inner level (per-shard values of local_block_tables)
    w: np.ndarray  # (p, nl)
    invd: np.ndarray
    du: np.ndarray
    t0: np.ndarray
    uh: np.ndarray
    lh: np.ndarray
    rinv: np.ndarray  # (p, 2nb*2nb), flattened for SMEM
    # outer level
    suh: np.ndarray  # (p, nl) shard unit loads T_r^{-1}(-alpha e_0)
    slh: np.ndarray  # (p, nl)
    fw: np.ndarray  # (p, 2, K) truncated face rows of T_r^{-1}
    fv: np.ndarray  # (p, 2, K+2w) folded face vectors (stencil @ fw):
    #   fv[r, 0] applies to [left_halo(w); f[:K+w]], fv[r, 1] to
    #   [f[nl-K-w:]; right_halo(w)] — one dot each, no stencil pass
    rinv_rows: np.ndarray  # (p, 2, 2p) outer reduced-inverse rows
    # static (unioned across shards)
    nb: int
    K: int
    rsupport: tuple
    has_uh: tuple
    has_lh: tuple

    KERNEL_FIELDS = ("w", "invd", "du", "uh", "lh", "t0", "rinv", "suh", "slh")
    FIELDS = KERNEL_FIELDS + ("fv", "rinv_rows")


@functools.lru_cache(maxsize=None)
def shard_kernel_tables(scheme: CompactScheme, n: int, p: int) -> ShardKernelTables:
    """All per-shard tables for a global line of ``n`` points over ``p``
    shards, ready to ship through shard_map with P(axis_name) specs."""
    from .compact import direction_tables

    if n % p:
        raise ValueError(f"global extent {n} not divisible by mesh axis {p}")
    nl = n // p
    nb = pick_nb(nl)
    periodic = scheme.periodic
    outer = direction_tables(scheme, n, p)  # validates nl vs closures too

    per = {k: [] for k in ("w", "invd", "du", "t0", "uh", "lh", "rinv")}
    face_rows = []
    rsupport = [set() for _ in range(2 * nb)]
    for r in range(p):
        first = (r == 0) and not periodic
        last = (r == p - 1) and not periodic
        w_, invd_, du_, t0_, uh_, lh_, rinv_, rs_ = local_block_tables(
            scheme, nl, first, last, nb
        )
        for k, v in zip(
            ("w", "invd", "du", "t0", "uh", "lh"),
            (w_, invd_, du_, t0_, uh_, lh_),
        ):
            per[k].append(v)
        per["rinv"].append(rinv_.reshape(-1))
        for j, s in enumerate(rs_):
            rsupport[j].update(s)
        Tinv = np.linalg.inv(_dense(*_local_bands(scheme, nl, first, last)))
        face_rows.append(np.stack([Tinv[0], Tinv[-1]]))

    rows = np.stack(face_rows)  # (p, 2, nl)
    # truncation: the first row decays rightward, the last leftward
    amax = np.abs(rows).max() or 1.0
    keep0 = np.abs(rows[:, 0, :]).max(0) > _FACE_TOL * amax
    keep1 = np.abs(rows[:, 1, ::-1]).max(0) > _FACE_TOL * amax
    K = int(
        max(
            np.nonzero(keep0)[0].max() + 1 if keep0.any() else 1,
            np.nonzero(keep1)[0].max() + 1 if keep1.any() else 1,
        )
    )
    if K > nl - scheme.stencil_width:
        K = nl  # short lines: keep the full rows (one whole-slab stencil)
    fw = np.stack(
        [rows[:, 0, :K], rows[:, 1, nl - K :]], axis=1
    )  # (p, 2, K)

    # folded face vectors: with S the (K, K+2w) uniform interior stencil
    # over the halo-extended slab (closures ride in ghost rows, exactly
    # like the kernels), the face is fw . (S ext) = (S^T fw) . ext — one
    # dot against the raw slab, no separate stencil pass. The caller
    # multiplies by inv_dx**derivative_order at runtime.
    w_st = scheme.stencil_width
    S = np.zeros((K, K + 2 * w_st))
    sgn = float(scheme.rhs_sign)
    for i in range(K):
        for k, wk in zip(scheme.rhs_offsets, scheme.rhs_weights):
            S[i, w_st + i + k] += wk
            S[i, w_st + i - k] += sgn * wk
        if scheme.rhs_center:
            S[i, w_st + i] += scheme.rhs_center
    fv = np.einsum("ij,pi->pj", S, fw[:, 0])  # (p, K+2w)
    fv1 = np.einsum("ij,pi->pj", S, fw[:, 1])
    fv = np.stack([fv, fv1], axis=1)  # (p, 2, K+2w)

    return ShardKernelTables(
        w=np.stack(per["w"]),
        invd=np.stack(per["invd"]),
        du=np.stack(per["du"]),
        t0=np.stack(per["t0"]),
        uh=np.stack(per["uh"]),
        lh=np.stack(per["lh"]),
        rinv=np.stack(per["rinv"]),
        suh=outer.uh,
        slh=outer.lh,
        fw=fw,
        fv=fv,
        rinv_rows=outer.rinv_rows,
        nb=nb,
        K=K,
        rsupport=tuple(tuple(sorted(s)) for s in rsupport),
        has_uh=tuple(b > 0 for b in range(nb)),
        has_lh=tuple(b < nb - 1 for b in range(nb)),
    )


# ---------------------------------------------------------------------------
# lane/sublane-form shard tables (dfdx / dfdy with the line axis sharded)
# ---------------------------------------------------------------------------

_LANE = 128


@functools.lru_cache(maxsize=None)
def local_lane_tables(scheme: CompactScheme, nl: int, first: bool, last: bool):
    """128-lane-block substructuring of one truncated local system — the
    distributed counterpart of ops/pallas_lane._lane_tables.

    Returns float64 ``(Tm, D, Qd, d_nonzero, d_blocks, q_blocks)``:

      Tm — (nb, 128, 128) transposed dense sub-block inverses (the caller
           scales by wfold/dx at ship time)
      D  — (2nb, nl) intra faces-to-output correction map (outer-end rows
           zeroed: cross-shard couplings live at the outer level)
      Qd — (2w, nl) exact inverse responses T_local^{-1}[:, j] of the 2w
           cut rows (w per side) whose wrapped in-kernel stencil needs a
           halo-lane delta (caller scales by wfold/dx like the closure
           responses of the single-device kernel)
      d_nonzero / d_blocks / q_blocks — numeric support metadata
    """
    m = _LANE
    if nl % m:
        raise ValueError(f"local extent {nl} not a multiple of {m}")
    nb = nl // m
    w = scheme.stencil_width
    subs = _sub_blocks(scheme, nl, first, last, nb)
    Tm = np.stack([Tinv.T for _, Tinv, _, _ in subs])
    uh = np.stack([u for _, _, u, _ in subs])
    lh = np.stack([l for _, _, _, l in subs])
    rinv = _intra_reduced(uh, lh, nb)
    D = np.zeros((2 * nb, nl))
    for b in range(nb):
        sl = slice(m * b, m * (b + 1))
        D[:, sl] = np.outer(rinv[2 * b], uh[b]) + np.outer(
            rinv[2 * b + 1], lh[b]
        )
    d_nonzero = tuple(int(k) for k in range(2 * nb) if np.any(D[k]))
    bmax = np.abs(D).reshape(2 * nb, nb, m).max(-1)
    d_blocks = tuple(
        tuple(
            int(b)
            for b in range(nb)
            if bmax[k, b] > 1e-12 * (bmax[k].max() or 1.0)
        )
        for k in d_nonzero
    )
    Tinv_full = np.linalg.inv(_dense(*_local_bands(scheme, nl, first, last)))
    cut_rows = tuple(range(w)) + tuple(range(nl - w, nl))
    Qd = np.stack([Tinv_full[:, j] for j in cut_rows])
    qmax = np.abs(Qd).reshape(len(cut_rows), nb, m).max(-1)
    q_blocks = tuple(
        tuple(
            int(b)
            for b in range(nb)
            if qmax[c, b] > 1e-12 * (qmax[c].max() or 1.0)
        )
        for c in range(len(cut_rows))
    )
    return Tm, D, Qd, d_nonzero, d_blocks, q_blocks


@dataclasses.dataclass(frozen=True)
class LaneShardTables:
    """Stacked (p, ...) float64 lane-form tables + unioned static metadata."""

    Tm: np.ndarray  # (p, nb, 128, 128)
    D: np.ndarray  # (p, 2nb, nl)
    Qd: np.ndarray  # (p, 2w, nl)
    suh: np.ndarray  # (p, nl)
    slh: np.ndarray  # (p, nl)
    fv: np.ndarray  # (p, 2, K+2w) folded face vectors
    rinv_rows: np.ndarray  # (p, 2, 2p)
    nb: int
    K: int
    d_nonzero: tuple
    d_blocks: tuple
    q_blocks: tuple
    su_blocks: tuple
    sl_blocks: tuple
    cut_meta: tuple  # per cut row: (qd_row, ((src, lane, coeff), ...))

    KERNEL_FIELDS = ("Tm", "D", "Qd", "suh", "slh")
    FIELDS = KERNEL_FIELDS + ("fv", "rinv_rows")


def _cut_meta(scheme: CompactScheme, nl: int):
    """Static tap lists for the halo-lane RHS deltas at the 2w cut rows.

    The in-kernel roll-form RHS wraps cyclically inside the shard tile;
    the true RHS reads halo lanes. Row j's delta (in the kernel's
    wfold-normalized units) is a short sum of direct lane differences:

      left  (j < w):    sum_{k > j}    (w_k/wf) * sgn * (hl[w+j-k] - f[(j-k) % nl])
      right (j >= nl-w): sum_{k: j+k >= nl} (w_k/wf) * (hr[j+k-nl] - f[(j+k) % nl])

    Each tap is (src, lane, coeff) with src 'f' (the tile), 'l'/'r' (the
    halo arrays). Structure is shard-independent: shard 0's halo lanes are
    closure ghosts, so the uniform stencil stays valid there too.
    """
    w = scheme.stencil_width
    if scheme.derivative_order != 1:
        raise ValueError("lane/sublane dist kernels are roll-form (d1) only")
    single = len(scheme.rhs_offsets) == 1
    wfold = scheme.rhs_weights[0] if single else 1.0
    sgn = float(scheme.rhs_sign)
    meta = []
    for c, j in enumerate(range(w)):
        taps = []
        for k, wk in zip(scheme.rhs_offsets, scheme.rhs_weights):
            if k > j:
                coeff = sgn * wk / wfold
                taps.append(("l", w + j - k, coeff))
                taps.append(("f", (j - k) % nl, -coeff))
        meta.append((c, tuple(taps)))
    for c, j in enumerate(range(nl - w, nl)):
        taps = []
        for k, wk in zip(scheme.rhs_offsets, scheme.rhs_weights):
            if j + k >= nl:
                coeff = wk / wfold
                taps.append(("r", j + k - nl, coeff))
                taps.append(("f", (j + k) % nl, -coeff))
        meta.append((w + c, tuple(taps)))
    return tuple(meta)


@functools.lru_cache(maxsize=None)
def shard_lane_tables(scheme: CompactScheme, n: int, p: int) -> LaneShardTables:
    """Stacked lane-form tables for a global line of ``n`` over ``p``
    shards (shares the outer-level fw / rinv_rows / shard unit loads with
    the leading-form tables)."""
    if scheme.derivative_order != 1:
        raise ValueError("lane/sublane dist kernels are roll-form (d1) only")
    if n % p:
        raise ValueError(f"global extent {n} not divisible by mesh axis {p}")
    nl = n // p
    nb = nl // _LANE
    periodic = scheme.periodic
    base = shard_kernel_tables(scheme, n, p)  # fw, rinv_rows, suh, slh

    Tms, Ds, Qds = [], [], []
    d_nz, q_blocks = set(), [set() for _ in range(2 * scheme.stencil_width)]
    d_blocks_map = {}
    for r in range(p):
        first = (r == 0) and not periodic
        last = (r == p - 1) and not periodic
        Tm, D, Qd, dnz, dbl, qbl = local_lane_tables(scheme, nl, first, last)
        Tms.append(Tm)
        Ds.append(D)
        Qds.append(Qd)
        for k, bl in zip(dnz, dbl):
            d_nz.add(k)
            d_blocks_map.setdefault(k, set()).update(bl)
        for c, bl in enumerate(qbl):
            q_blocks[c].update(bl)
    d_nonzero = tuple(sorted(d_nz))
    d_blocks = tuple(tuple(sorted(d_blocks_map[k])) for k in d_nonzero)

    def _support(rows):  # (p, nl) -> blocks with numeric weight
        bmax = np.abs(rows).reshape(p, nb, _LANE).max((0, 2))
        thr = 1e-12 * (bmax.max() or 1.0)
        return tuple(int(b) for b in range(nb) if bmax[b] > thr)

    return LaneShardTables(
        Tm=np.stack(Tms),
        D=np.stack(Ds),
        Qd=np.stack(Qds),
        suh=base.suh,
        slh=base.slh,
        fv=base.fv,
        rinv_rows=base.rinv_rows,
        nb=nb,
        K=base.K,
        d_nonzero=d_nonzero,
        d_blocks=d_blocks,
        q_blocks=tuple(tuple(sorted(s)) for s in q_blocks),
        su_blocks=_support(base.suh),
        sl_blocks=_support(base.slh),
        cut_meta=_cut_meta(scheme, nl),
    )


# ---------------------------------------------------------------------------
# fold-form lane/sublane shard tables (d2 / filter schemes on minor axes)
# ---------------------------------------------------------------------------


def _local_rhs_matrix(scheme: CompactScheme, nl: int, first: bool, last: bool):
    """(nl, nl + 2w) RHS operator of one shard: interior stencil rows over
    halo-extended columns, true closure rows at physical ends (they read no
    halo columns — one-sided inward stencils)."""
    w = scheme.stencil_width
    B = np.zeros((nl, nl + 2 * w))
    sgn = float(scheme.rhs_sign)
    for i in range(nl):
        for k, wk in zip(scheme.rhs_offsets, scheme.rhs_weights):
            B[i, w + i + k] += wk
            B[i, w + i - k] += sgn * wk
        if scheme.rhs_center:
            B[i, w + i] += scheme.rhs_center
    if first:
        for j, row in enumerate(scheme.left_rows):
            st = np.asarray(row.rhs_stencil, np.float64)
            B[j, :] = 0.0
            B[j, w : w + len(st)] = st
    if last:
        for j, row in enumerate(scheme.right_rows):
            i = nl - 1 - j
            st = np.asarray(row.rhs_stencil[::-1], np.float64)
            B[i, :] = 0.0
            B[i, w + nl - len(st) : w + nl] = st
    return B


@functools.lru_cache(maxsize=None)
def local_lane_fold_tables(
    scheme: CompactScheme, nl: int, first: bool, last: bool
):
    """Fold-form lane tables of one truncated local system (the distributed
    counterpart of ops/pallas_lane._fold_tables): returns
    ``(Mt, e_cols, D, d_nonzero, d_blocks)`` where ``Mt`` is the (nb, m, m)
    transposed folded operator ``(T_b^{-1} B_bb)^T``, and ``e_cols`` maps
    (block, src, lane) -> the (m,) edge-column response ``T_b^{-1} B[b, col]``
    with src 'f' (in-shard lane), 'l'/'r' (halo lanes)."""
    m = _LANE
    nb = nl // m
    w = scheme.stencil_width
    B = _local_rhs_matrix(scheme, nl, first, last)
    subs = _sub_blocks(scheme, nl, first, last, nb)
    uh = np.stack([u for _, _, u, _ in subs])
    lh = np.stack([l for _, _, _, l in subs])
    rinv = _intra_reduced(uh, lh, nb)
    D = np.zeros((2 * nb, nl))
    for b in range(nb):
        sl = slice(m * b, m * (b + 1))
        D[:, sl] = np.outer(rinv[2 * b], uh[b]) + np.outer(
            rinv[2 * b + 1], lh[b]
        )
    d_nonzero = tuple(int(k) for k in range(2 * nb) if np.any(D[k]))
    bmax = np.abs(D).reshape(2 * nb, nb, m).max(-1)
    d_blocks = tuple(
        tuple(
            int(b)
            for b in range(nb)
            if bmax[k, b] > 1e-12 * (bmax[k].max() or 1.0)
        )
        for k in d_nonzero
    )
    Mt = np.empty((nb, m, m))
    e_cols = {}
    for b, (bands, Tinv, _, _) in enumerate(subs):
        rows = slice(m * b, m * (b + 1))
        incols = slice(w + m * b, w + m * (b + 1))
        Mt[b] = (Tinv @ B[rows, incols]).T
        outside = np.ones(nl + 2 * w, bool)
        outside[incols] = False
        for col in np.nonzero(outside)[0]:
            if not np.any(B[rows, col]):
                continue
            if col < w:
                src, lane = "l", int(col)
            elif col >= w + nl:
                src, lane = "r", int(col - w - nl)
            else:
                src, lane = "f", int(col - w)
            e_cols[(b, src, lane)] = Tinv @ B[rows, col]
    return Mt, e_cols, D, d_nonzero, d_blocks


@dataclasses.dataclass(frozen=True)
class LaneFoldShardTables:
    """Stacked (p, ...) fold-form tables + unioned static metadata.

    ``edges_meta``: per block, the ordered tuple of (src, lane) edge
    columns (union over shards — shards missing a column carry zero rows
    in ``E``). ``E`` rows align with the flattened edges order.
    """

    Mt: np.ndarray  # (p, nb, 128, 128)
    E: np.ndarray  # (p, ne, nl)
    D: np.ndarray  # (p, 2nb, nl)
    suh: np.ndarray  # (p, nl)
    slh: np.ndarray  # (p, nl)
    fv: np.ndarray  # (p, 2, K+2w) folded face vectors
    rinv_rows: np.ndarray  # (p, 2, 2p)
    nb: int
    K: int
    edges_meta: tuple
    d_nonzero: tuple
    d_blocks: tuple
    su_blocks: tuple
    sl_blocks: tuple
    demean: bool

    KERNEL_FIELDS = ("Mt", "E", "D", "suh", "slh")
    FIELDS = KERNEL_FIELDS + ("fv", "rinv_rows")


@functools.lru_cache(maxsize=None)
def shard_lane_fold_tables(
    scheme: CompactScheme, n: int, p: int
) -> LaneFoldShardTables:
    """Stacked fold-form tables for any scheme order (the roll-form builder
    shard_lane_tables serves d1; this one serves d2/filters — and d1 too,
    though the roll form is the accuracy champion there)."""
    if n % p:
        raise ValueError(f"global extent {n} not divisible by mesh axis {p}")
    nl = n // p
    nb = nl // _LANE
    periodic = scheme.periodic
    base = shard_kernel_tables(scheme, n, p)

    per = []
    keys = [set() for _ in range(nb)]
    d_nz, d_blocks_map = set(), {}
    for r in range(p):
        first = (r == 0) and not periodic
        last = (r == p - 1) and not periodic
        Mt, e_cols, D, dnz, dbl = local_lane_fold_tables(
            scheme, nl, first, last
        )
        per.append((Mt, e_cols, D))
        for b, src, lane in e_cols:
            keys[b].add((src, lane))
        for k, bl in zip(dnz, dbl):
            d_nz.add(k)
            d_blocks_map.setdefault(k, set()).update(bl)
    edges_meta = tuple(tuple(sorted(s)) for s in keys)
    ne = sum(len(e) for e in edges_meta) or 1
    E = np.zeros((p, ne, nl))
    for r, (_, e_cols, _) in enumerate(per):
        ei = 0
        for b in range(nb):
            for src, lane in edges_meta[b]:
                col = e_cols.get((b, src, lane))
                if col is not None:
                    E[r, ei, _LANE * b : _LANE * (b + 1)] = col
                ei += 1
    d_nonzero = tuple(sorted(d_nz))
    d_blocks = tuple(tuple(sorted(d_blocks_map[k])) for k in d_nonzero)

    def _support(rows):
        bmax = np.abs(rows).reshape(p, nb, _LANE).max((0, 2))
        thr = 1e-12 * (bmax.max() or 1.0)
        return tuple(int(b) for b in range(nb) if bmax[b] > thr)

    return LaneFoldShardTables(
        Mt=np.stack([t[0] for t in per]),
        E=E,
        D=np.stack([t[2] for t in per]),
        suh=base.suh,
        slh=base.slh,
        fv=base.fv,
        rinv_rows=base.rinv_rows,
        nb=nb,
        K=base.K,
        edges_meta=edges_meta,
        d_nonzero=d_nonzero,
        d_blocks=d_blocks,
        su_blocks=_support(base.suh),
        sl_blocks=_support(base.slh),
        demean=scheme.derivative_order != 0,
    )
