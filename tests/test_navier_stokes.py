"""Incompressible Navier–Stokes model (models/navier_stokes.py).

The 2-D Taylor–Green vortex is special for this discretization: every
first derivative acts on single-mode fields, the advection term lands
mode-parallel to the discrete wavenumber vector (so the projection kills
it EXACTLY, as in the continuum), and the viscous operator is diagonal —
the semi-discrete solution stays TG-shaped with the *discrete* decay rate
nu * 2 * k''(dx)/dx^2. The error budget is therefore time-integration +
rounding only, and the gates below are tight (f64, CPU mesh).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import cfd_tpu
from cfd_tpu.models import NavierStokes, taylor_green_2d
from cfd_tpu.schemes import get_scheme, transfer_function


def _grid(n):
    d = 2 * np.pi / n
    c = jnp.asarray(np.arange(n) * d, jnp.float64)
    return c, d


def _tg_state(n, t, nu):
    c, d = _grid(n)
    (u, v, w), p = taylor_green_2d(c, c, c, t=t, nu=nu)
    return tuple(a.astype(jnp.float64) for a in (u, v, w)), p, d


@pytest.mark.parametrize("order", [4, 6])
def test_tg_decay_matches_discrete_rate(order):
    nu, dt, steps, n = 0.1, 2e-3, 25, 32
    u0, _, d = _tg_state(n, 0.0, nu)
    scheme = get_scheme(order, True, 1)
    ns = NavierStokes.single_device((d, d, d), scheme, nu=nu)
    u = u0
    for _ in range(steps):
        u = ns.step(u, dt)
    # discrete viscous rate: the d2 Laplacian acts on modes (1,1,0)
    d2 = get_scheme(order, True, 2)
    kpp = float(transfer_function(d2, np.array([d]))[0])
    rate = nu * 2.0 * kpp / d**2
    F = np.exp(-rate * dt * steps)
    c, _ = _grid(n)
    (ue, ve, we), _ = taylor_green_2d(c, c, c)
    for got, exact in zip(u, (ue * F, ve * F, we * F)):
        err = float(jnp.max(jnp.abs(got - exact.astype(jnp.float64))))
        assert err < 1e-9, err
    div = ns.divergence(u)
    assert float(jnp.max(jnp.abs(div))) < 1e-11


def test_divergence_free_invariant_random_field(rng):
    n, d = 16, 0.3
    scheme = get_scheme(4, True, 1)
    ns = NavierStokes.single_device((d, d, d), scheme, nu=5e-3)
    u = tuple(
        jnp.asarray(rng.standard_normal((n, n, n)) * 0.1) for _ in range(3)
    )
    u = ns.project(u)
    assert float(jnp.max(jnp.abs(ns.divergence(u)))) < 1e-12
    e0 = float(ns.kinetic_energy(u))
    for _ in range(4):
        u = ns.step(u, 1e-2)
        assert float(jnp.max(jnp.abs(ns.divergence(u)))) < 1e-11
    assert float(ns.kinetic_energy(u)) < e0  # viscous decay


def test_tg_pressure_diagnostic():
    """For TG the advection term is single-mode per axis; the recovered
    pressure matches the analytic -(cos2x + cos2y)/4 up to the modified-
    wavenumber factor k'(d)^2 / (k'(2d) * 2/(2d)) per mode — i.e. to
    truncation order. Gate at the 4th-order truncation level for n=48."""
    n, nu = 48, 0.0
    u, p_exact, d = _tg_state(n, 0.0, nu)
    ns = NavierStokes.single_device((d, d, d), get_scheme(4, True, 1))
    p = ns.pressure(u)
    err = float(jnp.max(jnp.abs(p - p_exact.astype(jnp.float64))))
    assert err < 5e-4, err
    assert abs(float(jnp.mean(p))) < 1e-13


def test_run_scan_matches_python_loop():
    n, d, dt, nu = 16, 0.4, 5e-3, 1e-2
    u0, _, _ = _tg_state(n, 0.0, nu)
    ns = NavierStokes.single_device((d, d, d), get_scheme(4, True, 1), nu=nu)
    via_scan = ns.run(u0, dt, 3)
    u = u0
    for _ in range(3):
        u = ns.step(u, dt)
    for a, b in zip(via_scan, u):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-13


def test_rejects_nonperiodic_scheme():
    from cfd_tpu.models import Derivs
    from cfd_tpu.schemes import SCHEME4

    d = Derivs.single_device(0.1, SCHEME4)
    with pytest.raises(ValueError):
        NavierStokes(derivs=d, spacing=(0.1, 0.1, 0.1), scheme=SCHEME4)
