"""Four-pass Laplacian: streaming RHS kernel + solve-only leading pass.

``ops/pallas_lap.lap_rhs`` emits ``r = B_z f + T_z (d2x f + d2y f)`` in
one pass; ``ops/pallas_leading.leading_solve`` turns it into the
Laplacian (T y = B f + T s  =>  y = d2z + s). Interpret mode on CPU; the
real-TPU path is exercised by bench/verify runs.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

import cfd_tpu
from cfd_tpu.oracle import derivative_np
from cfd_tpu.ops.pallas_lap import lap_rhs, lap_rhs_supported
from cfd_tpu.ops.pallas_leading import leading_solve
from cfd_tpu.schemes import (
    SCHEME4_D2,
    SCHEME4_D2_PERIODIC,
    SCHEME4_PERIODIC,
    get_scheme,
    lhs_bands,
)

D2P = [SCHEME4_D2_PERIODIC, get_scheme(6, True, 2)]


def _lap_np(scheme, f64, dz, dy, dx):
    return (
        derivative_np(scheme, f64, dx, axis=-1)
        + derivative_np(scheme, f64, dy, axis=-2)
        + derivative_np(scheme, f64, dz, axis=-3)
    )


@pytest.mark.parametrize("scheme", D2P, ids=[s.name for s in D2P])
def test_lap_rhs_solve_matches_oracle(rng, scheme):
    nz, ny, nx = 64, 256, 256
    f64 = np.float64(np.float32(rng.standard_normal((nz, ny, nx)) + 0.5))
    dz, dy, dx = 0.04, 0.03, 0.02
    assert lap_rhs_supported(scheme, nz, ny, nx, jnp.float32)
    r = lap_rhs(jnp.asarray(f64, jnp.float32), dz, dy, dx, scheme, interpret=True)
    got = np.asarray(leading_solve(r, scheme, interpret=True), np.float64)
    ex = _lap_np(scheme, f64, dz, dy, dx)
    assert np.abs(got - ex).max() / np.abs(ex).max() < 5e-4


def test_lap_rhs_smooth_field(rng):
    """Smooth + mean-offset field: error stays at the f32 d2 quantization
    floor (the scale where input rounding x the scheme gain lands)."""
    nz, ny, nx = 64, 256, 256
    z = np.linspace(0, 2 * np.pi, nz, endpoint=False)[:, None, None]
    y = np.linspace(0, 2 * np.pi, ny, endpoint=False)[None, :, None]
    x = np.linspace(0, 2 * np.pi, nx, endpoint=False)[None, None, :]
    dz, dy, dx = float(z[1, 0, 0]), float(y[0, 1, 0]), float(x[0, 0, 1])
    f64 = np.sin(x) * np.cos(2 * y) + np.sin(z) + 3.0
    scheme = SCHEME4_D2_PERIODIC
    r = lap_rhs(jnp.asarray(f64, jnp.float32), dz, dy, dx, scheme, interpret=True)
    got = np.asarray(leading_solve(r, scheme, interpret=True), np.float64)
    ex = _lap_np(scheme, np.float64(np.float32(f64)), dz, dy, dx)
    assert np.abs(got - ex).max() / np.abs(ex).max() < 5e-3


@pytest.mark.parametrize("periodic", [True, False])
def test_leading_solve_vs_banded(rng, periodic):
    """Solve-only mode == scipy/dense solve of T x = rhs along axis 0."""
    scheme = get_scheme(4, periodic, 2)
    n = 64
    rhs = rng.standard_normal((n, 8, 128))
    dl, d, du = lhs_bands(scheme, n)
    if periodic:
        T = np.diag(d) + np.diag(du[:-1], 1) + np.diag(dl[1:], -1)
        T[0, -1] = scheme.alpha
        T[-1, 0] = scheme.alpha
        ex = np.linalg.solve(T, rhs.reshape(n, -1)).reshape(rhs.shape)
    else:
        ab = np.zeros((3, n))
        ab[0, 1:] = du[:-1]
        ab[1] = d
        ab[2, :-1] = dl[1:]
        ex = scipy.linalg.solve_banded(
            (1, 1), ab, rhs.reshape(n, -1)
        ).reshape(rhs.shape)
    got = np.asarray(
        leading_solve(jnp.asarray(rhs, jnp.float32), scheme, interpret=True),
        np.float64,
    )
    assert np.abs(got - ex).max() / np.abs(ex).max() < 1e-5


@pytest.mark.parametrize("order,nz", [(4, 8), (4, 12), (6, 12)])
def test_lap_rhs_ring_wrap_small_nbz(rng, order, nz):
    """1-3 slab grids exercise the ring's periodic wrap arithmetic; the
    RHS is checked directly against the dense f64 operators (nz < the
    leading solver's minimum line)."""
    from cfd_tpu.schemes import rhs_matrix

    scheme = get_scheme(order, True, 2)
    ny = nx = 256
    assert lap_rhs_supported(scheme, nz, ny, nx, jnp.float32)
    f64 = np.float64(np.float32(rng.standard_normal((nz, ny, nx)) + 0.5))
    dz, dy, dx = 0.04, 0.03, 0.02
    r = lap_rhs(jnp.asarray(f64, jnp.float32), dz, dy, dx, scheme, interpret=True)
    B = rhs_matrix(scheme, nz) / dz**2
    dl, d, du = lhs_bands(scheme, nz)
    T = np.diag(d) + np.diag(du[:-1], 1) + np.diag(dl[1:], -1)
    T[0, -1] = scheme.alpha
    T[-1, 0] = scheme.alpha
    s = derivative_np(scheme, f64, dx, axis=-1) + derivative_np(
        scheme, f64, dy, axis=-2
    )
    r_ref = np.einsum("ij,jkl->ikl", B, f64) + np.einsum("ij,jkl->ikl", T, s)
    rel = np.abs(np.asarray(r, np.float64) - r_ref).max() / np.abs(r_ref).max()
    assert rel < 1e-5


def test_lap_rhs_supported_gates():
    f32, f64 = jnp.float32, jnp.float64
    assert lap_rhs_supported(SCHEME4_D2_PERIODIC, 64, 256, 256, f32)
    # non-periodic closures are accuracy-hostile (module docstring)
    assert not lap_rhs_supported(SCHEME4_D2, 64, 256, 256, f32)
    # first-derivative scheme
    assert not lap_rhs_supported(SCHEME4_PERIODIC, 64, 256, 256, f32)
    # dtype
    assert not lap_rhs_supported(SCHEME4_D2_PERIODIC, 64, 256, 256, f64)
    # ny = 128 takes the round-5 single-block sublane form; shorter (or
    # non-multiple-of-128) lines stay unsupported
    assert lap_rhs_supported(SCHEME4_D2_PERIODIC, 64, 128, 256, f32)
    assert not lap_rhs_supported(SCHEME4_D2_PERIODIC, 64, 64, 256, f32)
    assert not lap_rhs_supported(SCHEME4_D2_PERIODIC, 64, 192, 256, f32)


# ---------------------------------------------------------------------------
# merged advection + lap-RHS kernel (adv_lap_rhs)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nz", [6, 16], ids=["wrap-nbz3", "deep"])
def test_adv_lap_rhs_matches_separate_kernels(rng, nz):
    """The merged streaming kernel returns bit-identical results to the
    two dispatches it replaces (advection_pair + lap_rhs): same block
    bodies, same tables, only the pass structure differs. nz=6 runs a
    3-slab grid, exercising the wrapped arrival index map's revisits."""
    from cfd_tpu.ops.pallas_lap import adv_lap_rhs, adv_lap_supported
    from cfd_tpu.ops.pallas_pair import advection_pair

    s1 = SCHEME4_PERIODIC
    s2 = SCHEME4_D2_PERIODIC
    ny = nx = 256
    assert adv_lap_supported(s1, s2, nz, ny, nx, jnp.float32)
    f = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
    ux = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
    uy = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
    dz, dy, dx = 0.04, 0.03, 0.02
    axy0 = advection_pair(f, ux, uy, dy, dx, s1, interpret=True)
    r0 = lap_rhs(f, dz, dy, dx, s2, interpret=True)
    axy, r = adv_lap_rhs(f, ux, uy, dz, dy, dx, s1, s2, interpret=True)
    assert float(jnp.max(jnp.abs(axy - axy0))) == 0.0
    assert float(jnp.max(jnp.abs(r - r0))) == 0.0


def test_adv_lap_rhs_aliased_velocity(rng):
    """When ux/uy IS f (a Burgers component advected by itself) the kernel
    drops the duplicate input stream and reads the velocity from f's own
    slab — output must be bit-identical to the unaliased call."""
    from cfd_tpu.ops.pallas_lap import adv_lap_rhs

    s1, s2 = SCHEME4_PERIODIC, SCHEME4_D2_PERIODIC
    nz, ny, nx = 6, 256, 256
    dz, dy, dx = 0.04, 0.03, 0.02
    f = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
    fcopy = f + 0.0  # same values, distinct object -> unaliased baseline

    a0, r0 = adv_lap_rhs(f, fcopy, u, dz, dy, dx, s1, s2, interpret=True)
    a1, r1 = adv_lap_rhs(f, f, u, dz, dy, dx, s1, s2, interpret=True)
    assert jnp.array_equal(a0, a1) and jnp.array_equal(r0, r1)

    a0, r0 = adv_lap_rhs(f, u, fcopy, dz, dy, dx, s1, s2, interpret=True)
    a1, r1 = adv_lap_rhs(f, u, f, dz, dy, dx, s1, s2, interpret=True)
    assert jnp.array_equal(a0, a1) and jnp.array_equal(r0, r1)


def test_adv_lap_supported_gates():
    from cfd_tpu.ops.pallas_lap import adv_lap_supported

    f32, f64 = jnp.float32, jnp.float64
    s1, s2 = SCHEME4_PERIODIC, SCHEME4_D2_PERIODIC
    assert adv_lap_supported(s1, s2, 64, 256, 256, f32)
    # schemes in the wrong slots
    assert not adv_lap_supported(s2, s2, 64, 256, 256, f32)
    assert not adv_lap_supported(s1, s1, 64, 256, 256, f32)
    # non-periodic d2 (closure-hostile change of variables)
    assert not adv_lap_supported(s1, SCHEME4_D2, 64, 256, 256, f32)
    # dtype / short-axis gates ride the pair predicates (ny = 128 is the
    # round-5 single-block sublane form; shorter stays unsupported)
    assert not adv_lap_supported(s1, s2, 64, 256, 256, f64)
    assert adv_lap_supported(s1, s2, 64, 128, 256, f32)
    assert not adv_lap_supported(s1, s2, 64, 64, 256, f32)
