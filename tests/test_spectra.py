"""Spectral diagnostics: Parseval exactness, shell placement, physics identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.models import taylor_green
from cfd_tpu.ops import (
    dissipation,
    energy_spectrum,
    enstrophy,
    scalar_spectrum,
    spectrum_shells,
)
from cfd_tpu.schemes import SCHEME4_PERIODIC, SCHEME6_PERIODIC


def _grid(n, L=2 * np.pi):
    d = L / n
    c = jnp.arange(n, dtype=jnp.float64) * d
    return c, d


def test_scalar_spectrum_parseval_random():
    # sum over shells == mean(f^2) exactly (Parseval with Hermitian weights)
    n = 32
    _, d = _grid(n)
    f = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float64)
    p = scalar_spectrum(f, d)
    assert np.isclose(float(jnp.sum(p)), float(jnp.mean(f * f)), rtol=1e-12)


def test_scalar_spectrum_single_mode_placement():
    # sin(3x): all power in the |k| = 3 shell, value mean(f^2) = 1/2
    n = 32
    c, d = _grid(n)
    f = jnp.sin(3 * c)[None, None, :] * jnp.ones((n, n, 1), jnp.float64)
    p = scalar_spectrum(f, d)
    k = spectrum_shells((n, n, n), d)
    idx = int(np.argmin(np.abs(k - 3.0)))
    assert np.isclose(float(p[idx]), 0.5, rtol=1e-12)
    off = float(jnp.sum(p) - p[idx])
    assert abs(off) < 1e-14


def test_scalar_spectrum_nyquist_weighting():
    # cos(pi x / dx) (the Nyquist mode along x) lives in its self-conjugate
    # column: weight 1, not 2 — Parseval still exact
    n = 16
    c, d = _grid(n)
    f = jnp.cos((n // 2) * c)[None, None, :] * jnp.ones((n, n, 1), jnp.float64)
    p = scalar_spectrum(f, d)
    assert np.isclose(float(jnp.sum(p)), float(jnp.mean(f * f)), rtol=1e-12)


def test_energy_spectrum_taylor_green():
    # TG energy sits entirely in the sqrt(3) shell; sum == KE
    n = 32
    c, d = _grid(n)
    u = tuple(a.astype(jnp.float64) for a in taylor_green(c, c, c))
    E = energy_spectrum(u, d)
    ke = 0.5 * sum(float(jnp.mean(a * a)) for a in u)
    assert np.isclose(float(jnp.sum(E)), ke, rtol=1e-12)
    k = spectrum_shells((n, n, n), d)
    idx = int(np.argmin(np.abs(k - np.sqrt(3.0))))
    assert float(E[idx]) / ke > 0.999


def test_spectrum_batch_axis():
    n = 16
    _, d = _grid(n)
    f = jax.random.normal(jax.random.PRNGKey(1), (2, n, n, n), jnp.float64)
    p = scalar_spectrum(f, d)
    assert p.shape[1:] == (2,)
    for b in range(2):
        assert np.isclose(
            float(jnp.sum(p[:, b])), float(jnp.mean(f[b] * f[b])), rtol=1e-12
        )


def test_anisotropic_spacing_shells():
    # a 4x-longer x box adds shells at k = 0.25 spacing; mode sin(y) still
    # lands at |k| = 1 and Parseval holds
    nz, ny, nx = 8, 16, 32
    Lx = 8 * np.pi
    dy = 2 * np.pi / ny
    dz = 2 * np.pi / nz
    dx = Lx / nx
    y = jnp.arange(ny, dtype=jnp.float64) * dy
    f = jnp.sin(y)[None, :, None] * jnp.ones((nz, 1, nx), jnp.float64)
    p = scalar_spectrum(f, (dz, dy, dx))
    k = spectrum_shells((nz, ny, nx), (dz, dy, dx))
    assert np.isclose(k[1], 0.25, rtol=1e-12)  # kmin from the long axis
    idx = int(np.argmin(np.abs(k - 1.0)))
    assert np.isclose(float(p[idx]), 0.5, rtol=1e-12)
    assert np.isclose(float(jnp.sum(p)), float(jnp.mean(f * f)), rtol=1e-12)


@pytest.mark.parametrize("scheme", [SCHEME4_PERIODIC, SCHEME6_PERIODIC])
def test_enstrophy_dissipation_identity(scheme):
    # Taylor-Green: exact enstrophy 0.5*mean|curl u|^2 = 3/8 spectrally;
    # compact operators reproduce it to truncation, and for this
    # solenoidal field dissipation == 2 nu enstrophy to truncation
    n = 48
    c, d = _grid(n)
    u = tuple(a.astype(jnp.float64) for a in taylor_green(c, c, c))
    Z = float(enstrophy(u, d, scheme))
    assert np.isclose(Z, 0.375, rtol=1e-4)
    nu = 7e-3
    eps = float(dissipation(u, d, scheme, nu))
    assert np.isclose(eps, 2 * nu * Z, rtol=1e-4)
