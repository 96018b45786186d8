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
