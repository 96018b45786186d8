"""Fused vector-calculus kernels: divergence and curl (ops/pallas_vec.py).

``div_rhs`` emits ``r = B_z uz + T_z (d1x ux + d1y uy)`` in one streaming
pass; a leading solve turns it into div(u). ``curl_rhs`` emits the curl's
z-component plus the two change-of-variables right-hand sides whose
leading solves are wx and wy. Interpret mode on CPU; the real-TPU path is
exercised by bench/verify runs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.oracle import derivative_np
from cfd_tpu.ops.pallas_vec import (
    curl_fused,
    curl_fused_supported,
    curl_rhs,
    curl_rhs_supported,
    div_fused_supported,
    div_rhs,
    div_rhs_supported,
    divergence_fused,
)
from cfd_tpu.schemes import (
    SCHEME4,
    SCHEME4_D2_PERIODIC,
    SCHEME4_PERIODIC,
    get_scheme,
    lhs_bands,
    rhs_matrix,
)

D1P = [SCHEME4_PERIODIC, get_scheme(6, True, 1)]
DZ, DY, DX = 0.04, 0.03, 0.02


def _u3(rng, shape):
    return tuple(
        np.float64(np.float32(rng.standard_normal(shape) + 0.3))
        for _ in range(3)
    )


def _div_np(scheme, u, dz, dy, dx):
    ux, uy, uz = u
    return (
        derivative_np(scheme, ux, dx, axis=-1)
        + derivative_np(scheme, uy, dy, axis=-2)
        + derivative_np(scheme, uz, dz, axis=-3)
    )


def _curl_np(scheme, u, dz, dy, dx):
    ux, uy, uz = u
    return (
        derivative_np(scheme, uz, dy, axis=-2)
        - derivative_np(scheme, uy, dz, axis=-3),
        derivative_np(scheme, ux, dz, axis=-3)
        - derivative_np(scheme, uz, dx, axis=-1),
        derivative_np(scheme, uy, dx, axis=-1)
        - derivative_np(scheme, ux, dy, axis=-2),
    )


def _dense_TB(scheme, n, d):
    B = rhs_matrix(scheme, n) / d
    dl, diag, du = lhs_bands(scheme, n)
    T = np.diag(diag) + np.diag(du[:-1], 1) + np.diag(dl[1:], -1)
    T[0, -1] = scheme.alpha
    T[-1, 0] = scheme.alpha
    return T, B


@pytest.mark.parametrize("scheme", D1P, ids=[s.name for s in D1P])
def test_div_fused_matches_oracle(rng, scheme):
    nz, ny, nx = 64, 256, 256
    u = _u3(rng, (nz, ny, nx))
    assert div_fused_supported(scheme, nz, ny, nx, jnp.float32)
    got = np.asarray(
        divergence_fused(
            tuple(jnp.asarray(a, jnp.float32) for a in u),
            DZ, DY, DX, scheme, interpret=True,
        ),
        np.float64,
    )
    ex = _div_np(scheme, u, DZ, DY, DX)
    assert np.abs(got - ex).max() / np.abs(ex).max() < 2e-4


@pytest.mark.parametrize("order,nz", [(4, 6), (4, 8), (6, 12)])
def test_div_rhs_ring_wrap_small_nbz(rng, order, nz):
    """1-3 slab grids exercise the two rings' periodic wrap arithmetic;
    the RHS is checked directly against the dense f64 operators."""
    scheme = get_scheme(order, True, 1)
    ny = nx = 256
    assert div_rhs_supported(scheme, nz, ny, nx, jnp.float32)
    ux, uy, uz = _u3(rng, (nz, ny, nx))
    r = div_rhs(
        jnp.asarray(ux, jnp.float32),
        jnp.asarray(uy, jnp.float32),
        jnp.asarray(uz, jnp.float32),
        DZ, DY, DX, scheme, interpret=True,
    )
    T, B = _dense_TB(scheme, nz, DZ)
    s = derivative_np(scheme, ux, DX, axis=-1) + derivative_np(
        scheme, uy, DY, axis=-2
    )
    r_ref = np.einsum("ij,jkl->ikl", B, uz) + np.einsum("ij,jkl->ikl", T, s)
    rel = np.abs(np.asarray(r, np.float64) - r_ref).max() / np.abs(r_ref).max()
    assert rel < 1e-5


@pytest.mark.parametrize("scheme", D1P, ids=[s.name for s in D1P])
def test_curl_fused_matches_oracle(rng, scheme):
    nz, ny, nx = 64, 256, 256
    u = _u3(rng, (nz, ny, nx))
    assert curl_fused_supported(scheme, nz, ny, nx, jnp.float32)
    got = curl_fused(
        tuple(jnp.asarray(a, jnp.float32) for a in u),
        DZ, DY, DX, scheme, interpret=True,
    )
    ex = _curl_np(scheme, u, DZ, DY, DX)
    for g, e in zip(got, ex):
        assert (
            np.abs(np.asarray(g, np.float64) - e).max() / np.abs(e).max()
            < 2e-4
        )


@pytest.mark.parametrize("order,nz", [(4, 6), (6, 12)])
def test_curl_rhs_ring_wrap_small_nbz(rng, order, nz):
    scheme = get_scheme(order, True, 1)
    ny = nx = 256
    assert curl_rhs_supported(scheme, nz, ny, nx, jnp.float32)
    ux, uy, uz = _u3(rng, (nz, ny, nx))
    wz, ra, rb = curl_rhs(
        jnp.asarray(ux, jnp.float32),
        jnp.asarray(uy, jnp.float32),
        jnp.asarray(uz, jnp.float32),
        DZ, DY, DX, scheme, interpret=True,
    )
    T, B = _dense_TB(scheme, nz, DZ)
    wz_ref = derivative_np(scheme, uy, DX, axis=-1) - derivative_np(
        scheme, ux, DY, axis=-2
    )
    sa = derivative_np(scheme, uz, DY, axis=-2)
    sb = derivative_np(scheme, uz, DX, axis=-1)
    ra_ref = np.einsum("ij,jkl->ikl", T, sa) - np.einsum("ij,jkl->ikl", B, uy)
    rb_ref = np.einsum("ij,jkl->ikl", B, ux) - np.einsum("ij,jkl->ikl", T, sb)
    for g, e in ((wz, wz_ref), (ra, ra_ref), (rb, rb_ref)):
        rel = np.abs(np.asarray(g, np.float64) - e).max() / np.abs(e).max()
        assert rel < 1e-5


def test_vec_supported_gates():
    f32, f64 = jnp.float32, jnp.float64
    for sup in (div_rhs_supported, curl_rhs_supported):
        assert sup(SCHEME4_PERIODIC, 64, 256, 256, f32)
        # non-periodic closures keep the exact unfused route
        assert not sup(SCHEME4, 64, 256, 256, f32)
        # second-derivative scheme in the d1 slot
        assert not sup(SCHEME4_D2_PERIODIC, 64, 256, 256, f32)
        # dtype
        assert not sup(SCHEME4_PERIODIC, 64, 256, 256, f64)
        # ny = 128 runs the single-block sublane route (round 5)
        assert sup(SCHEME4_PERIODIC, 64, 128, 256, f32)
        # non-multiple of 128 stays unsupported
        assert not sup(SCHEME4_PERIODIC, 64, 100, 256, f32)
    # the fused wrappers additionally need the leading solver's line length
    assert not div_fused_supported(SCHEME4_PERIODIC, 8, 256, 256, f32)
    assert not curl_fused_supported(SCHEME4_PERIODIC, 8, 256, 256, f32)


def test_div_fused_routed_by_divergence(rng, monkeypatch):
    """ops.derivatives.divergence auto-routes through the fused path on
    TPU; here (CPU) we call the router's fused branch directly and check
    it agrees with the generic path on the same inputs."""
    import cfd_tpu

    nz, ny, nx = 64, 256, 256
    scheme = SCHEME4_PERIODIC
    u = tuple(
        jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
        for _ in range(3)
    )
    fused = divergence_fused(u, DZ, DY, DX, scheme, interpret=True)
    generic = cfd_tpu.divergence(u, (DZ, DY, DX), scheme, method="matmul")
    rel = float(jnp.max(jnp.abs(fused - generic))) / float(
        jnp.max(jnp.abs(generic))
    )
    assert rel < 1e-4
