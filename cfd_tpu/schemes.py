"""Compact finite-difference scheme definitions.

A compact (Padé) first-derivative scheme couples unknown derivatives through a
tridiagonal left-hand side:

    alpha * f'[i-1] + f'[i] + alpha * f'[i+1] = RHS(f)[i] / dx

with an antisymmetric interior RHS stencil

    RHS(f)[i] = sum_k  w_k * (f[i+k] - f[i-k])

and, for non-periodic boundaries, one-sided closure rows near each edge.

The reference implementation hard-codes the 4th-order interior scheme with a
3rd-order closure (see /root/reference/code/cuda/solvers/templated/
near_toeplitz.py:8-32 and kernels.cu:34-46, paraphrased in SURVEY.md §0).
This module generalises it into data: each scheme is a table of interior
weights plus explicit boundary rows, so solvers and kernels are
scheme-agnostic.

Schemes provided:

* ``SCHEME4``  — classic 4th-order Padé: alpha = 1/4, w1 = 3/4, with the
  reference's 3rd-order one-sided closure row at each end
  (kernels.cu:36-46).
* ``SCHEME6``  — 6th-order tridiagonal (Lele 1992, eq. 2.1.7): alpha = 1/3,
  w1 = 7/9, w2 = 1/36, closed with a 5th-order one-sided row at the wall and
  the 4th-order Padé row at the first interior point.
* periodic variants of both (no closure rows; cyclic tridiagonal LHS).

The right-edge closures are generated from the left ones by the mirror
antisymmetry of the first derivative (x -> -x flips the sign of f').
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

__all__ = [
    "BoundaryRow",
    "CompactScheme",
    "SCHEME4",
    "SCHEME6",
    "SCHEME4_PERIODIC",
    "SCHEME6_PERIODIC",
    "get_scheme",
    "lhs_bands",
    "rhs_matrix",
]


@dataclasses.dataclass(frozen=True)
class BoundaryRow:
    """One closure row of the scheme, expressed from the *left* edge.

    ``lhs`` is the (sub, diag, super) entry of the tridiagonal LHS for this
    row; ``rhs_stencil`` are dense weights over the first ``len(rhs_stencil)``
    grid values, so the equation for row j is

        lhs[0]*f'[j-1] + lhs[1]*f'[j] + lhs[2]*f'[j+1]
            = sum_m rhs_stencil[m] * f[m] / dx
    """

    lhs: Tuple[float, float, float]
    rhs_stencil: Tuple[float, ...]


@dataclasses.dataclass(frozen=True)
class CompactScheme:
    """A compact first-derivative scheme (interior + closures)."""

    name: str
    order: int
    periodic: bool
    alpha: float
    rhs_offsets: Tuple[int, ...]
    rhs_weights: Tuple[float, ...]
    left_rows: Tuple[BoundaryRow, ...] = ()

    @property
    def stencil_width(self) -> int:
        """Halo width required by the interior RHS stencil."""
        return max(self.rhs_offsets)

    @property
    def n_closure(self) -> int:
        return len(self.left_rows)

    @property
    def right_rows(self) -> Tuple[BoundaryRow, ...]:
        """Closure rows at the right edge, mirrored from the left ones.

        Row j from the right: lhs reversed, RHS stencil reversed and negated
        (first-derivative antisymmetry), indexing f from the right edge
        inward. Matches the reference's explicit right closure
        (kernels.cu:42-46: the negated mirror of the left row).
        """
        out = []
        for row in self.left_rows:
            a, b, c = row.lhs
            out.append(
                BoundaryRow(
                    lhs=(c, b, a),
                    rhs_stencil=tuple(-w for w in row.rhs_stencil),
                )
            )
        return tuple(out)

    def min_points(self) -> int:
        if self.periodic:
            return 2 * self.stencil_width + 1
        widest = max(
            [len(r.rhs_stencil) for r in self.left_rows] + [2 * self.stencil_width + 1]
        )
        return max(widest, 2 * self.n_closure + 1)


# ---------------------------------------------------------------------------
# Scheme tables
# ---------------------------------------------------------------------------

# 4th-order Padé interior:  (1/4, 1, 1/4) f' = (3/4)(f[i+1]-f[i-1])/dx
# 3rd-order closure:        f'[0] + 2 f'[1] = (-5 f0 + 4 f1 + f2) / (2 dx)
SCHEME4 = CompactScheme(
    name="pade4",
    order=4,
    periodic=False,
    alpha=0.25,
    rhs_offsets=(1,),
    rhs_weights=(0.75,),
    left_rows=(BoundaryRow(lhs=(0.0, 1.0, 2.0), rhs_stencil=(-2.5, 2.0, 0.5)),),
)

SCHEME4_PERIODIC = dataclasses.replace(
    SCHEME4, name="pade4_periodic", periodic=True, left_rows=()
)

# 6th-order tridiagonal interior (Lele 1992 eq. 2.1.7):
#   (1/3, 1, 1/3) f' = (14/9)(f[i+1]-f[i-1])/(2dx) + (1/9)(f[i+2]-f[i-2])/(4dx)
# Wall closure (5th-order, Lele eq. 4.1.4 family):
#   f'[0] + 5 f'[1] = (-197/60 f0 - 5/12 f1 + 5 f2 - 5/3 f3 + 5/12 f4 - 1/20 f5)/dx
# Next-to-wall row: the 4th-order Padé interior row (only needs f[0..2]).
SCHEME6 = CompactScheme(
    name="lele6",
    order=6,
    periodic=False,
    alpha=1.0 / 3.0,
    rhs_offsets=(1, 2),
    rhs_weights=(7.0 / 9.0, 1.0 / 36.0),
    left_rows=(
        BoundaryRow(
            lhs=(0.0, 1.0, 5.0),
            rhs_stencil=(
                -197.0 / 60.0,
                -5.0 / 12.0,
                5.0,
                -5.0 / 3.0,
                5.0 / 12.0,
                -1.0 / 20.0,
            ),
        ),
        BoundaryRow(lhs=(0.25, 1.0, 0.25), rhs_stencil=(-0.75, 0.0, 0.75)),
    ),
)

SCHEME6_PERIODIC = dataclasses.replace(
    SCHEME6, name="lele6_periodic", periodic=True, left_rows=()
)

_SCHEMES = {
    (4, False): SCHEME4,
    (4, True): SCHEME4_PERIODIC,
    (6, False): SCHEME6,
    (6, True): SCHEME6_PERIODIC,
}


def get_scheme(order: int = 4, periodic: bool = False) -> CompactScheme:
    try:
        return _SCHEMES[(order, periodic)]
    except KeyError:
        raise ValueError(
            f"no compact scheme of order {order} (periodic={periodic}); "
            f"available: {sorted(_SCHEMES)}"
        ) from None


# ---------------------------------------------------------------------------
# Dense/banded assembly helpers (numpy; used by oracles, factor precompute
# and tests — never inside jit-traced code)
# ---------------------------------------------------------------------------


def lhs_bands(
    scheme: CompactScheme,
    n: int,
    *,
    first_block: bool = True,
    last_block: bool = True,
    dtype=np.float64,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return the (dl, d, du) bands of the scheme's LHS for an ``n``-row block.

    ``first_block`` / ``last_block`` control whether boundary-closure rows are
    installed at the top/bottom. For a distributed line split into blocks,
    interior blocks take plain interior rows (the coupling to neighbouring
    blocks is carried by the substructuring method, mirroring the per-rank
    patching in the reference at code/cuda/compact.py:159-166).

    Convention: dl[i] multiplies x[i-1] (dl[0] unused = 0), du[i] multiplies
    x[i+1] (du[n-1] unused = 0). For periodic schemes the cyclic corner
    couplings (row 0 -> x[n-1], row n-1 -> x[0]) are *not* representable in
    the bands; the cyclic solver accounts for them via alpha corners.
    """
    if n < scheme.min_points():
        raise ValueError(f"n={n} too small for scheme {scheme.name}")
    dl = np.full(n, scheme.alpha, dtype=dtype)
    d = np.ones(n, dtype=dtype)
    du = np.full(n, scheme.alpha, dtype=dtype)
    dl[0] = 0.0
    du[-1] = 0.0
    if not scheme.periodic:
        if first_block:
            for j, row in enumerate(scheme.left_rows):
                a, b, c = row.lhs
                if j > 0:
                    dl[j] = a
                d[j] = b
                if j < n - 1:
                    du[j] = c
        if last_block:
            for j, row in enumerate(scheme.right_rows):
                i = n - 1 - j
                a, b, c = row.lhs
                if i > 0:
                    dl[i] = a
                d[i] = b
                if i < n - 1:
                    du[i] = c
    return dl, d, du


def rhs_matrix(scheme: CompactScheme, n: int, dtype=np.float64) -> np.ndarray:
    """Dense (n, n) matrix B with RHS = B @ f / dx (single full line).

    Oracle/test helper — O(n^2) storage, never used on the hot path.
    """
    B = np.zeros((n, n), dtype=dtype)
    for k, w in zip(scheme.rhs_offsets, scheme.rhs_weights):
        for i in range(n):
            ip = (i + k) % n if scheme.periodic else i + k
            im = (i - k) % n if scheme.periodic else i - k
            if scheme.periodic or (0 <= ip < n and 0 <= im < n):
                if scheme.periodic:
                    B[i, ip] += w
                    B[i, im] -= w
                else:
                    B[i, ip] += w
                    B[i, im] -= w
    if not scheme.periodic:
        # zero out and install closure rows
        for j, row in enumerate(scheme.left_rows):
            B[j, :] = 0.0
            B[j, : len(row.rhs_stencil)] = row.rhs_stencil
        for j, row in enumerate(scheme.right_rows):
            i = n - 1 - j
            B[i, :] = 0.0
            m = len(row.rhs_stencil)
            B[i, n - m :] = row.rhs_stencil[::-1]
        # interior rows whose symmetric stencil would poke outside the domain
        # do not exist for valid n (guarded by min_points), except rows within
        # stencil_width of a closure region when n_closure < stencil_width.
        for i in range(scheme.n_closure, scheme.stencil_width):
            raise ValueError(
                f"scheme {scheme.name}: row {i} needs offsets beyond the "
                "boundary but has no closure row"
            )
    return B
