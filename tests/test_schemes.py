"""Scheme-table sanity: polynomial exactness and formal order of closures."""

import numpy as np
import pytest

from cfd_tpu.oracle import derivative_np
from cfd_tpu.schemes import SCHEME4, SCHEME6, get_scheme, lhs_bands, rhs_matrix


def _poly_exactness(scheme, deg, n=32):
    """Max error of the full-line scheme on x**deg (exact for deg <= order)."""
    rng = np.random.default_rng(0)
    x = np.linspace(0.3, 1.7, n)
    dx = x[1] - x[0]
    f = x**deg
    df_exact = deg * x ** (deg - 1) if deg > 0 else np.zeros_like(x)
    df = derivative_np(scheme, f, dx)
    return np.max(np.abs(df - df_exact))


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_scheme4_polynomial_exact(deg):
    # 4th-order interior + 3rd-order closure: exact through cubic
    assert _poly_exactness(SCHEME4, deg) < 1e-10


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4, 5])
def test_scheme6_polynomial_exact(deg):
    # 6th-order interior + 5th-order wall row + 4th-order next-to-wall row:
    # globally exact through degree 5? The next-to-wall Padé row is exact
    # only through degree 4, so assert through 4 globally...
    if deg <= 4:
        assert _poly_exactness(SCHEME6, deg) < 1e-9


def test_scheme6_interior_degree5_exact():
    # Interior rows of the 6th-order scheme must be exact on x^5 away from
    # the closure region.
    n = 64
    x = np.linspace(0.3, 1.7, n)
    dx = x[1] - x[0]
    df = derivative_np(SCHEME6, x**5, dx)
    err = np.abs(df - 5 * x**4)
    assert np.max(err[8:-8]) < 1e-8


@pytest.mark.parametrize("order,periodic", [(4, False), (4, True), (6, False), (6, True)])
def test_get_scheme(order, periodic):
    s = get_scheme(order, periodic)
    assert s.order == order and s.periodic == periodic


def test_get_scheme_unknown():
    with pytest.raises(ValueError):
        get_scheme(8)


def test_lhs_bands_scheme4():
    dl, d, du = lhs_bands(SCHEME4, 8)
    assert d[0] == 1.0 and du[0] == 2.0  # left closure row (1, 2)
    assert dl[-1] == 2.0 and d[-1] == 1.0  # right closure row (2, 1)
    assert np.all(dl[1:-1] == 0.25) and np.all(du[1:-1] == 0.25)


def test_lhs_bands_interior_block():
    # interior blocks of a distributed line carry no closure rows
    dl, d, du = lhs_bands(SCHEME4, 8, first_block=False, last_block=False)
    assert np.all(d == 1.0)
    assert np.all(dl[1:] == 0.25) and np.all(du[:-1] == 0.25)


def test_periodic_rhs_matrix_antisymmetric_circulant():
    B = rhs_matrix(get_scheme(4, periodic=True), 16)
    # circulant: every row is a rotation of the first
    for i in range(1, 16):
        assert np.allclose(B[i], np.roll(B[0], i))


@pytest.mark.parametrize("order", [4, 6])
def test_periodic_spectral_accuracy(order):
    # periodic scheme on sin(x): error should be tiny and drop with order
    n = 64
    L = 2 * np.pi
    x = np.arange(n) * (L / n)
    dx = L / n
    scheme = get_scheme(order, periodic=True)
    df = derivative_np(scheme, np.sin(x), dx)
    err = np.max(np.abs(df - np.cos(x)))
    assert err < (1e-6 if order == 4 else 1e-9)


def test_modified_wavenumber_first_derivative():
    """k'(k) matches the measured spectral response of the actual solver,
    approaches k at low k with the scheme's order, and Lele's published
    resolving efficiencies are reproduced."""
    import math

    import jax.numpy as jnp

    import cfd_tpu
    from cfd_tpu.schemes import (
        SCHEME4_PERIODIC,
        SCHEME6_PERIODIC,
        modified_wavenumber,
        resolving_efficiency,
    )

    n = 128
    dx = 2 * math.pi / n
    x = np.arange(n) * dx
    for scheme in (SCHEME4_PERIODIC, SCHEME6_PERIODIC):
        for m in (1, 5, 20, 50):
            f = jnp.asarray(np.sin(m * x)[None, None, :])
            df = np.asarray(cfd_tpu.dfdx(f, dx, scheme, method="pcr"))[0, 0]
            # df = (k'/dx) cos(mx); amplitude read at x=0
            amp = df[0] * dx
            kp = float(modified_wavenumber(scheme, np.asarray([m * dx]))[0])
            np.testing.assert_allclose(amp, kp, rtol=1e-9)
        # low-k error scales with the scheme's order
        k = np.asarray([0.1, 0.2])
        err = np.abs(modified_wavenumber(scheme, k) - k)
        rate = np.log2(err[1] / err[0])
        assert abs(rate - (scheme.order + 1)) < 0.2, (scheme.name, rate)
    # Lele 1992 table: 4th-order Pade resolves ~28%, 6th-order ~44% at 1%
    e4 = resolving_efficiency(SCHEME4_PERIODIC)
    e6 = resolving_efficiency(SCHEME6_PERIODIC)
    assert 0.2 < e4 < 0.4 and 0.35 < e6 < 0.55 and e6 > e4, (e4, e6)


def test_transfer_function_d2_and_filter():
    import math

    import jax.numpy as jnp

    import cfd_tpu
    from cfd_tpu.schemes import (
        SCHEME4_D2_PERIODIC,
        get_filter,
        modified_wavenumber,
        transfer_function,
    )

    n = 128
    dx = 2 * math.pi / n
    x = np.arange(n) * dx
    # d2: solver response equals -k''/dx^2
    for m in (1, 10, 40):
        f = jnp.asarray(np.sin(m * x)[None, None, :])
        d2 = np.asarray(
            cfd_tpu.d2fdx2(f, dx, SCHEME4_D2_PERIODIC, method="pcr")
        )[0, 0]
        # the scheme multiplies exp(ikx/dx) by -k''/dx^2: d2 sin = -k''/dx^2 sin
        kpp = float(
            transfer_function(SCHEME4_D2_PERIODIC, np.asarray([m * dx]))[0]
        )
        np.testing.assert_allclose(d2, -kpp / dx**2 * np.sin(m * x), atol=1e-9)
        assert kpp > 0 and abs(kpp - (m * dx) ** 2) < 0.1 * (m * dx) ** 2 + 1e-6
    # filter: G(0)=1, G(pi)=0, monotone on [0, pi]
    sch = get_filter(6, 0.45, True)
    k = np.linspace(0, np.pi, 512)
    G = transfer_function(sch, k)
    assert abs(G[0] - 1) < 1e-12 and abs(G[-1]) < 1e-12
    assert np.all(np.diff(G) <= 1e-12) and np.all(G > -1e-12)
    with pytest.raises(ValueError, match="gain"):
        modified_wavenumber(sch, k)
