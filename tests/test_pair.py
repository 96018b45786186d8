"""Fused two-axis (dfdx, dfdy) pair kernel vs the float64 oracle.

One HBM read of f producing both minor-axis and second-minor-axis
derivatives (ops/pallas_pair.py) — the kernel behind the fused gradient
pipeline (BASELINE.json config 5). Interpret mode on CPU; the real-TPU
path is exercised by bench/verify runs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import cfd_tpu
from cfd_tpu.oracle import derivative_np
from cfd_tpu.ops.pallas_pair import gradient_pair, pair_supported
from cfd_tpu.schemes import (
    SCHEME4,
    SCHEME4_D2_PERIODIC,
    SCHEME4_PERIODIC,
    SCHEME6,
    SCHEME6_PERIODIC,
)

ALL = [SCHEME4, SCHEME4_PERIODIC, SCHEME6, SCHEME6_PERIODIC]


@pytest.mark.parametrize("scheme", ALL, ids=[s.name for s in ALL])
def test_pair_matches_oracle(rng, scheme):
    f64 = rng.standard_normal((3, 256, 256)) + 0.5
    f = jnp.asarray(f64, jnp.float32)
    dy, dx = 0.03, 0.02
    assert pair_supported(scheme, 256, 256, jnp.float32)
    gx, gy = gradient_pair(f, dy, dx, scheme, interpret=True)
    exx = derivative_np(scheme, np.float64(np.float32(f64)), dx, axis=-1)
    exy = derivative_np(scheme, np.float64(np.float32(f64)), dy, axis=-2)
    assert np.abs(np.asarray(gx, np.float64) - exx).max() / np.abs(exx).max() < 5e-5
    assert np.abs(np.asarray(gy, np.float64) - exy).max() / np.abs(exy).max() < 5e-5


def test_pair_roll_x_form(rng):
    """nx = 512 > FOLD_MAX exercises the roll form on the x part."""
    f64 = rng.standard_normal((2, 256, 512)) + 0.5
    f = jnp.asarray(f64, jnp.float32)
    gx, gy = gradient_pair(f, 0.03, 0.02, SCHEME4_PERIODIC, interpret=True)
    exx = derivative_np(SCHEME4_PERIODIC, np.float64(np.float32(f64)), 0.02, axis=-1)
    exy = derivative_np(SCHEME4_PERIODIC, np.float64(np.float32(f64)), 0.03, axis=-2)
    assert np.abs(np.asarray(gx, np.float64) - exx).max() / np.abs(exx).max() < 5e-5
    assert np.abs(np.asarray(gy, np.float64) - exy).max() / np.abs(exy).max() < 5e-5


def test_pair_matches_single_kernels(rng):
    """Bit-identical block bodies: pair == single-axis kernels exactly."""
    from cfd_tpu.ops.pallas_lane import lane_derivative
    from cfd_tpu.ops.pallas_sublane import sublane_derivative

    f = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    gx, gy = gradient_pair(f, 0.03, 0.02, SCHEME4_PERIODIC, interpret=True)
    sx = lane_derivative(f, 0.02, SCHEME4_PERIODIC, interpret=True)
    sy = sublane_derivative(f, 0.03, SCHEME4_PERIODIC, axis=-2, interpret=True)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(sx))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(sy))


def test_advection_pair_matches_pair_dot(rng):
    """advection_pair == ux*dfdx + uy*dfdy with the pair kernel's own
    derivatives (shared block bodies -> only the dot's rounding differs)."""
    from cfd_tpu.ops.pallas_pair import advection_pair, adv_pair_supported

    f = jnp.asarray(rng.standard_normal((3, 256, 256)), jnp.float32)
    ux = jnp.asarray(rng.standard_normal((3, 256, 256)), jnp.float32)
    uy = jnp.asarray(rng.standard_normal((3, 256, 256)), jnp.float32)
    for scheme in (SCHEME4_PERIODIC, SCHEME4):
        assert adv_pair_supported(scheme, 256, 256, jnp.float32)
        got = advection_pair(f, ux, uy, 0.03, 0.02, scheme, interpret=True)
        gx, gy = gradient_pair(f, 0.03, 0.02, scheme, interpret=True)
        ref = ux * gx + uy * gy
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        assert err < 1e-6, (scheme.name, err)


def test_advection_pair_oracle(rng):
    """advection_pair vs the float64 oracle's derivatives."""
    from cfd_tpu.ops.pallas_pair import advection_pair

    f64 = rng.standard_normal((2, 256, 256)) + 0.5
    u64 = rng.standard_normal((2, 2, 256, 256))
    f = jnp.asarray(f64, jnp.float32)
    got = np.asarray(
        advection_pair(
            f,
            jnp.asarray(u64[0], jnp.float32),
            jnp.asarray(u64[1], jnp.float32),
            0.03,
            0.02,
            SCHEME4_PERIODIC,
            interpret=True,
        ),
        np.float64,
    )
    c64 = np.float64(np.float32(f64))
    ex = np.float64(np.float32(u64[0])) * derivative_np(
        SCHEME4_PERIODIC, c64, 0.02, axis=-1
    ) + np.float64(np.float32(u64[1])) * derivative_np(
        SCHEME4_PERIODIC, c64, 0.03, axis=-2
    )
    assert np.abs(got - ex).max() / np.abs(ex).max() < 5e-5


def test_adv_pair_supported_gates():
    from cfd_tpu.ops.pallas_pair import adv_pair_supported

    assert not adv_pair_supported(SCHEME4_D2_PERIODIC, 256, 256, jnp.float32)
    assert not adv_pair_supported(SCHEME4_PERIODIC, 256, 256, jnp.bfloat16)


D2_ALL = [SCHEME4_D2_PERIODIC]


def test_d2_pair_sum_matches_oracle(rng):
    """d2x + d2y in one kernel (the Laplacian's xy part) vs the oracle."""
    from cfd_tpu.ops.pallas_pair import d2_pair_sum, d2_sum_supported
    from cfd_tpu.schemes import SCHEME4_D2, get_scheme

    f64 = rng.standard_normal((3, 256, 256)) + 0.5
    f = jnp.asarray(f64, jnp.float32)
    dy, dx = 0.03, 0.02
    for scheme in (SCHEME4_D2_PERIODIC, SCHEME4_D2, get_scheme(6, True, 2)):
        assert d2_sum_supported(scheme, 256, 256, jnp.float32)
        got = np.asarray(
            d2_pair_sum(f, dy, dx, scheme, interpret=True), np.float64
        )
        ex = derivative_np(
            scheme, np.float64(np.float32(f64)), dx, axis=-1
        ) + derivative_np(scheme, np.float64(np.float32(f64)), dy, axis=-2)
        # d2 on f32 random data amplifies input rounding by O(n^2/dx^2)
        # relative to the oracle's exact arithmetic on the same cast field;
        # the backend share is the same as the single-axis fold kernels
        assert np.abs(got - ex).max() / np.abs(ex).max() < 5e-4


def test_d2_pair_sum_matches_singles(rng):
    """Pair-sum == lane-fold d2x + sublane-fold d2y (same block bodies)."""
    from cfd_tpu.ops.pallas_lane import lane_derivative
    from cfd_tpu.ops.pallas_pair import d2_pair_sum
    from cfd_tpu.ops.pallas_sublane import sublane_derivative

    f = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    got = d2_pair_sum(f, 0.03, 0.02, SCHEME4_D2_PERIODIC, interpret=True)
    sx = lane_derivative(f, 0.02, SCHEME4_D2_PERIODIC, interpret=True)
    sy = sublane_derivative(
        f, 0.03, SCHEME4_D2_PERIODIC, axis=-2, interpret=True, fold=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(sx + sy), rtol=0, atol=1e-5
    )


def test_pair_supported_gates():
    assert not pair_supported(SCHEME4_D2_PERIODIC, 256, 256, jnp.float32)  # d2
    assert not pair_supported(SCHEME4_PERIODIC, 256, 200, jnp.float32)  # nx%128
    assert not pair_supported(SCHEME4_PERIODIC, 1024, 512, jnp.float32)  # VMEM
    assert not pair_supported(SCHEME4_PERIODIC, 256, 256, jnp.float64)
    with pytest.raises(ValueError, match="float32"):
        gradient_pair(jnp.zeros((2, 256, 256)), 1.0, 1.0, SCHEME4_PERIODIC)


def test_gradient_uses_pair_equivalence(rng):
    """gradient() (auto) returns the same values whether or not the pair
    fusion applies — here on CPU it falls back to pcr; just pin the public
    API result against the oracle so a future pair integration cannot
    drift."""
    f64 = rng.standard_normal((4, 256, 256))
    f = jnp.asarray(f64, jnp.float32)
    gx, gy, gz = cfd_tpu.gradient(f, (0.04, 0.03, 0.02), SCHEME4_PERIODIC)
    for got, axis, d in ((gx, -1, 0.02), (gy, -2, 0.03), (gz, -3, 0.04)):
        ex = derivative_np(SCHEME4_PERIODIC, np.float64(np.float32(f64)), d, axis=axis)
        assert (
            np.abs(np.asarray(got, np.float64) - ex).max() / np.abs(ex).max()
            < 5e-5
        )


def test_pair_subtract_matches_unfused(rng):
    """(ax - dfdx, ay - dfdy) in one dispatch == gradient_pair + subtract."""
    from cfd_tpu.ops.pallas_pair import pair_sub_supported, pair_subtract

    scheme = SCHEME4_PERIODIC
    dy, dx = 0.03, 0.02
    f = jnp.asarray(rng.standard_normal((3, 256, 256)), jnp.float32)
    ax = jnp.asarray(rng.standard_normal((3, 256, 256)), jnp.float32)
    ay = jnp.asarray(rng.standard_normal((3, 256, 256)), jnp.float32)
    assert pair_sub_supported(scheme, 256, 256, jnp.float32)
    sx, sy = pair_subtract(f, ax, ay, dy, dx, scheme, interpret=True)
    gx, gy = gradient_pair(f, dy, dx, scheme, interpret=True)
    assert float(jnp.max(jnp.abs(sx - (ax - gx)))) < 1e-6
    assert float(jnp.max(jnp.abs(sy - (ay - gy)))) < 1e-6


def test_pair_subtract_gates():
    from cfd_tpu.ops.pallas_pair import pair_sub_supported

    f32 = jnp.float32
    assert pair_sub_supported(SCHEME4_PERIODIC, 256, 256, f32)
    assert not pair_sub_supported(SCHEME4_D2_PERIODIC, 256, 256, f32)
    # tighter VMEM cap than the plain pair (two extra streamed planes)
    assert not pair_sub_supported(SCHEME4_PERIODIC, 512, 512, f32)


def test_leading_negative_spacing_acc_is_projection_update(rng):
    """leading_derivative(phi, -dz, acc=uz) == uz - dphi/dz — the fused
    z-component of ops/poisson.project's 'compact' form."""
    from cfd_tpu.ops.pallas_leading import leading_derivative, leading_supported

    scheme = SCHEME4_PERIODIC
    dz = 0.04
    phi64 = rng.standard_normal((64, 16, 256)) + 0.2
    uz = jnp.asarray(rng.standard_normal((64, 16, 256)), jnp.float32)
    phi = jnp.asarray(phi64, jnp.float32)
    assert leading_supported(scheme, 64, jnp.float32)
    got = leading_derivative(phi, -dz, scheme, acc=uz, interpret=True)
    gz = derivative_np(scheme, np.float64(np.float32(phi64)), dz, axis=0)
    ex = np.asarray(uz, np.float64) - gz
    assert np.abs(np.asarray(got, np.float64) - ex).max() < 5e-5
