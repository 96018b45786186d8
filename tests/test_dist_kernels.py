"""Distributed shard-local solves through the round-3 kernel suite.

The round-4 fast path (parallel/compact._dist_leading_pallas +
ops/pallas_leading.leading_dist_derivative): when the differentiated axis is
sharded, the local solve runs the native-layout substructured kernel with
halos in and the outer interface update fused into its backward sweep —
no moveaxis relayout, no separate reduced/update XLA phases. These tests
drive it in interpret mode on the virtual CPU mesh against the float64 PCR
path (which carries oracle parity at 1e-10 in test_parallel.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import schemes
from cfd_tpu.parallel import Grid, make_mesh
from cfd_tpu.parallel import compact as pc
from cfd_tpu.parallel.compact import DistributedCompactSolver
from cfd_tpu.parallel.dist_tables import shard_kernel_tables

SHAPE = (256, 8, 128)
SPACING = (0.11, 0.13, 0.17)


def _field():
    rng = np.random.default_rng(7)
    return rng.standard_normal(SHAPE)


def _rel_err(a, b):
    return float(np.max(np.abs(a - b)) / np.max(np.abs(b)))


def _run(scheme, mesh_shape, dtype=jnp.float32, axis=0):
    f64 = _field()
    mesh = make_mesh(mesh_shape)
    grid = Grid(mesh, SHAPE, SPACING, scheme)
    fast = DistributedCompactSolver(grid, method="pallas", interpret=True)
    ref = DistributedCompactSolver(grid, method="pcr")
    out = np.asarray(fast.apply(jnp.asarray(f64, dtype), axis), np.float64)
    want = np.asarray(ref.apply(jnp.asarray(f64), axis))
    return _rel_err(out, want)


CASES = [
    # (label, scheme, mesh, tol): p=8 exercises nb=1 sub-blocking (nl=32),
    # p=2 exercises nb=4 interleaved chains (nl=128)
    ("d1-periodic", schemes.SCHEME4_PERIODIC, (8, 1, 1), 2e-6),
    ("d1-periodic", schemes.SCHEME4_PERIODIC, (2, 2, 2), 2e-6),
    ("d1-closure", schemes.SCHEME4, (8, 1, 1), 2e-6),
    ("d1-closure", schemes.SCHEME4, (2, 2, 2), 2e-6),
    ("d2-periodic", schemes.get_scheme(4, True, 2), (2, 2, 2), 2e-6),
    ("d2-closure", schemes.get_scheme(4, False, 2), (8, 1, 1), 2e-5),
    ("filter-periodic", schemes.get_filter(6, periodic=True), (8, 1, 1), 5e-6),
    ("filter-closure", schemes.get_filter(6, periodic=False), (2, 2, 2), 1e-4),
]


@pytest.mark.parametrize(
    "label,scheme,mesh_shape,tol",
    CASES,
    ids=[f"{c[0]}-{'x'.join(map(str, c[2]))}" for c in CASES],
)
def test_dist_leading_kernel_matches_pcr(label, scheme, mesh_shape, tol):
    assert _run(scheme, mesh_shape) < tol


MINOR_CASES = [
    # (label, scheme, mesh, shape, axis, tol): the lane form needs
    # nl % 128 == 0, so the sharded extent is 256 over p=2
    ("dfdx-periodic", schemes.SCHEME4_PERIODIC, (1, 1, 2), (8, 16, 256), 2, 2e-6),
    ("dfdx-closure", schemes.SCHEME4, (1, 1, 2), (8, 16, 256), 2, 2e-6),
    ("dfdy-periodic", schemes.SCHEME4_PERIODIC, (1, 2, 1), (8, 256, 128), 1, 2e-6),
    ("dfdy-closure", schemes.SCHEME4, (1, 2, 1), (8, 256, 128), 1, 2e-6),
    # fold form: d2 and filters on sharded minor axes
    ("d2x-periodic", schemes.get_scheme(4, True, 2), (1, 1, 2), (8, 16, 256), 2, 2e-6),
    ("d2x-closure", schemes.get_scheme(4, False, 2), (1, 1, 2), (8, 16, 256), 2, 2e-6),
    ("filtx-closure", schemes.get_filter(6, periodic=False), (1, 1, 2), (8, 16, 256), 2, 5e-6),
    ("filty-periodic", schemes.get_filter(6, periodic=True), (1, 2, 1), (8, 256, 128), 1, 5e-6),
]


@pytest.mark.parametrize(
    "label,scheme,mesh_shape,shape,axis,tol",
    MINOR_CASES,
    ids=[c[0] for c in MINOR_CASES],
)
def test_dist_minor_kernel_matches_pcr(label, scheme, mesh_shape, shape, axis, tol):
    rng = np.random.default_rng(5)
    f64 = rng.standard_normal(shape)
    mesh = make_mesh(mesh_shape)
    grid = Grid(mesh, shape, SPACING, scheme)
    fast = DistributedCompactSolver(grid, method="pallas", interpret=True)
    ref = DistributedCompactSolver(grid, method="pcr")
    out = np.asarray(fast.apply(jnp.asarray(f64, jnp.float32), axis), np.float64)
    want = np.asarray(ref.apply(jnp.asarray(f64), axis))
    assert _rel_err(out, want) < tol


def test_dist_gradient_all_axes_sharded():
    """Every axis sharded at once: each direction routes through its own
    axis-native dist kernel in one program."""
    shape = (64, 256, 256)
    rng = np.random.default_rng(9)
    f64 = rng.standard_normal(shape)
    mesh = make_mesh((2, 2, 2))
    grid = Grid(mesh, shape, SPACING, schemes.SCHEME4)
    fast = DistributedCompactSolver(grid, method="pallas", interpret=True)
    ref = DistributedCompactSolver(grid, method="pcr")
    outs = fast.gradient(jnp.asarray(f64, jnp.float32))
    wants = ref.gradient(jnp.asarray(f64))
    for o, w_ in zip(outs, wants):
        assert _rel_err(np.asarray(o, np.float64), np.asarray(w_)) < 2e-6


def test_dist_leading_kernel_bf16():
    # bf16 fields upcast to f32 in-kernel; accuracy is input-resolution bound
    err = _run(schemes.SCHEME4_PERIODIC, (8, 1, 1), dtype=jnp.bfloat16)
    assert err < 5e-2


def test_dist_route_actually_taken(monkeypatch):
    """The z-sharded pallas route must go through the fused dist kernel,
    not silently fall back to the round-1 flat path."""
    calls = []
    orig = pc._dist_leading_pallas

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pc, "_dist_leading_pallas", spy)
    _run(schemes.SCHEME4_PERIODIC, (2, 1, 1))
    assert calls


def test_face_truncation_is_tight():
    """The truncated face functionals must reproduce the exact local-solve
    faces to float32 resolution (the outer reduced system consumes them)."""
    scheme = schemes.SCHEME4
    n, p = 256, 4
    skt = shard_kernel_tables(scheme, n, p)
    nl = n // p
    assert skt.K < nl  # the truncation must actually truncate at this size
    rng = np.random.default_rng(3)
    rhs = rng.standard_normal(nl)
    from cfd_tpu.parallel.dist_tables import _dense, _local_bands

    for r in (0, 1, p - 1):
        first = r == 0
        last = r == p - 1
        Tinv = np.linalg.inv(_dense(*_local_bands(scheme, nl, first, last)))
        exact = Tinv @ rhs
        f0 = skt.fw[r, 0] @ rhs[: skt.K]
        f1 = skt.fw[r, 1] @ rhs[nl - skt.K :]
        assert abs(f0 - exact[0]) < 1e-8 * np.abs(exact).max()
        assert abs(f1 - exact[-1]) < 1e-8 * np.abs(exact).max()


def test_local_block_tables_solve_exactly():
    """Inner substructuring must solve the truncated local system exactly
    (float64): forward/backward Thomas per sub-block + intra reduced solve
    + unit-load update == dense solve."""
    from cfd_tpu.parallel.dist_tables import (
        _dense,
        _local_bands,
        local_block_tables,
        pick_nb,
    )

    scheme = schemes.SCHEME4
    nl = 128
    nb = pick_nb(nl)
    assert nb >= 2
    rng = np.random.default_rng(11)
    rhs = rng.standard_normal(nl)
    for first, last in ((True, False), (False, False), (False, True)):
        w, invd, du, t0, uh, lh, rinv, _ = local_block_tables(
            scheme, nl, first, last, nb
        )
        T = _dense(*_local_bands(scheme, nl, first, last))
        want = np.linalg.solve(T, rhs)
        bz = nl // nb
        # emulate the kernel: per-block Thomas, faces, reduced, update
        x = np.empty(nl)
        faces = np.empty(2 * nb)
        for b in range(nb):
            s, e = b * bz, (b + 1) * bz
            y = np.empty(bz)
            ff = 0.0
            for i in range(bz):
                y[i] = rhs[s + i] - w[s + i] * (y[i - 1] if i else 0.0)
                ff += t0[s + i] * rhs[s + i]
            xb = np.empty(bz)
            xb[-1] = y[-1] * invd[e - 1]
            for i in range(bz - 2, -1, -1):
                xb[i] = (y[i] - du[s + i] * xb[i + 1]) * invd[s + i]
            x[s:e] = xb
            faces[2 * b] = -ff
            faces[2 * b + 1] = -xb[-1]
        us = rinv.reshape(2 * nb, 2 * nb) @ faces
        for b in range(nb):
            s, e = b * bz, (b + 1) * bz
            x[s:e] += us[2 * b] * uh[s:e] + us[2 * b + 1] * lh[s:e]
        assert np.max(np.abs(x - want)) < 1e-12 * np.abs(want).max()
