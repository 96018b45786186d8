"""Tridiagonal solver unit tests vs scipy, mirroring the reference's solver
tests (code/cuda/test/test_kernels.py, code/ocl/test/test_near_toeplitz.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import solve_banded

from cfd_tpu.ops import tridiag
from cfd_tpu.schemes import SCHEME4, SCHEME6, lhs_bands


def _random_bands(rng, n, diag_dom=True):
    dl = rng.uniform(-1, 1, n)
    du = rng.uniform(-1, 1, n)
    d = rng.uniform(1, 2, n) + (np.abs(dl) + np.abs(du) if diag_dom else 0)
    dl[0] = 0.0
    du[-1] = 0.0
    return dl, d, du


def _scipy_solve(dl, d, du, rhs):
    n = d.shape[0]
    ab = np.zeros((3, n))
    ab[0, 1:] = du[:-1]
    ab[1] = d
    ab[2, :-1] = dl[1:]
    return solve_banded((1, 1), ab, rhs.reshape(n, -1)).reshape(rhs.shape)


@pytest.mark.parametrize("method", ["thomas", "pcr"])
@pytest.mark.parametrize("n", [8, 16, 100, 256])
def test_solver_vs_scipy_random(rng, method, n):
    dl, d, du = _random_bands(rng, n)
    rhs = rng.standard_normal((n, 7))
    fac = tridiag.factor(dl, d, du, method=method)
    x = np.asarray(tridiag.solve(fac, jnp.asarray(rhs)))
    np.testing.assert_allclose(x, _scipy_solve(dl, d, du, rhs), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("method", ["thomas", "pcr"])
@pytest.mark.parametrize("scheme", [SCHEME4, SCHEME6], ids=lambda s: s.name)
def test_solver_vs_scipy_scheme_bands(rng, method, scheme):
    # the near-Toeplitz systems actually used by the derivative path,
    # including the coefficients (1,2,...) test of test_near_toeplitz.py:31-48
    n = 64
    dl, d, du = lhs_bands(scheme, n)
    rhs = rng.standard_normal((n, 4, 5))
    fac = tridiag.factor(dl, d, du, method=method)
    x = np.asarray(tridiag.solve(fac, jnp.asarray(rhs)))
    np.testing.assert_allclose(x, _scipy_solve(dl, d, du, rhs), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("method", ["thomas", "pcr"])
@pytest.mark.parametrize("n", [8, 64, 100])
def test_cyclic_vs_dense(rng, method, n):
    dl, d, du = _random_bands(rng, n)
    ct, cb = 0.31, -0.42  # corner couplings
    A = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
    A[0, -1] = ct
    A[-1, 0] = cb
    rhs = rng.standard_normal((n, 3))
    fac = tridiag.cyclic_factor(dl, d, du, ct, cb, method=method)
    x = np.asarray(tridiag.cyclic_solve(fac, jnp.asarray(rhs)))
    np.testing.assert_allclose(x, np.linalg.solve(A, rhs), rtol=1e-9, atol=1e-11)


def test_solve_dispatch(rng):
    n = 32
    dl, d, du = _random_bands(rng, n)
    rhs = jnp.asarray(rng.standard_normal((n, 2)))
    for fac in (
        tridiag.thomas_factor(dl, d, du),
        tridiag.pcr_factor(dl, d, du),
        tridiag.cyclic_factor(dl, d, du, 0.1, 0.2),
    ):
        assert tridiag.solve(fac, rhs).shape == rhs.shape
    with pytest.raises(TypeError):
        tridiag.solve(object(), rhs)


def test_rhs_only_batch_shapes(rng):
    # arbitrary trailing batch dims
    n = 16
    dl, d, du = _random_bands(rng, n)
    fac = tridiag.pcr_factor(dl, d, du)
    rhs = rng.standard_normal((n, 2, 3, 4))
    x = np.asarray(tridiag.pcr_solve(fac, jnp.asarray(rhs)))
    np.testing.assert_allclose(
        x, _scipy_solve(dl, d, du, rhs), rtol=1e-10, atol=1e-12
    )


def test_f32_path(rng):
    # f32 inputs stay f32 and are accurate to f32 roundoff
    n = 64
    dl, d, du = lhs_bands(SCHEME4, n)
    fac = tridiag.pcr_factor(dl, d, du)
    rhs64 = rng.standard_normal((n, 8))
    x = tridiag.pcr_solve(fac, jnp.asarray(rhs64, dtype=jnp.float32))
    assert x.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(x), _scipy_solve(dl, d, du, rhs64), rtol=2e-4, atol=2e-5
    )
