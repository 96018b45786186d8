"""Single-device derivative API vs the float64 oracle and analytic fields.

Mirrors the reference's integration tests (code/cuda/test/test_compact.py,
code/ocl/test/test_compact.py: sin -> cos and x*y*z fields, dfdx/dfdy/dfdz)
but asserts at 1e-10 in float64 instead of decimal=2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cfd_tpu
from cfd_tpu.oracle import derivative_np
from cfd_tpu.ops.rhs import closure_ghosts, compact_rhs
from cfd_tpu.schemes import (
    SCHEME4,
    SCHEME4_PERIODIC,
    SCHEME6,
    SCHEME6_PERIODIC,
)

ALL_SCHEMES = [SCHEME4, SCHEME6, SCHEME4_PERIODIC, SCHEME6_PERIODIC]
IDS = [s.name for s in ALL_SCHEMES]


def _field(nz=6, ny=8, nx=32):
    z = np.linspace(0.1, 1.2, nz)[:, None, None]
    y = np.linspace(0.2, 1.4, ny)[None, :, None]
    x = np.linspace(0.3, 1.6, nx)[None, None, :]
    return x * np.cos(x * y) + np.sin(z) * y, (z, y, x)


@pytest.mark.parametrize("scheme", ALL_SCHEMES, ids=IDS)
@pytest.mark.parametrize("method", ["pcr", "thomas", "matmul"])
def test_rhs_and_solve_vs_oracle(rng, scheme, method):
    n = 32
    f = rng.standard_normal((n, 5, 3))
    dx = 0.013
    got = np.asarray(
        cfd_tpu.derivative(jnp.asarray(f), dx, scheme, axis=0, method=method)
    )
    expect = derivative_np(scheme, f, dx, axis=0)
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-11)


@pytest.mark.parametrize("axis", [-1, -2, -3])
def test_axis_handling_vs_oracle(rng, axis):
    f = rng.standard_normal((6, 8, 16))
    dx = 0.05
    got = np.asarray(cfd_tpu.derivative(jnp.asarray(f), dx, SCHEME4, axis=axis))
    expect = derivative_np(SCHEME4, f, dx, axis=axis)
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-11)


def test_dfdx_dfdy_dfdz_analytic():
    # the reference's multi-GPU benchmark field f = x cos(xy) + sin(z) y
    f, (z, y, x) = _field(32, 32, 64)
    dz = float(z[1, 0, 0] - z[0, 0, 0])
    dy = float(y[0, 1, 0] - y[0, 0, 0])
    dx = float(x[0, 0, 1] - x[0, 0, 0])
    fj = jnp.asarray(f)
    dfdx_exact = np.cos(x * y) - x * y * np.sin(x * y) + 0 * f
    dfdy_exact = -(x**2) * np.sin(x * y) + np.sin(z) + 0 * f
    dfdz_exact = np.cos(z) * y + 0 * f
    assert np.max(np.abs(np.asarray(cfd_tpu.dfdx(fj, dx)) - dfdx_exact)) < 2e-4
    assert np.max(np.abs(np.asarray(cfd_tpu.dfdy(fj, dy)) - dfdy_exact)) < 2e-4
    assert np.max(np.abs(np.asarray(cfd_tpu.dfdz(fj, dz)) - dfdz_exact)) < 2e-4


def test_jit_and_vmap_clean():
    f, _ = _field()
    fj = jnp.asarray(f)
    jitted = jax.jit(lambda g: cfd_tpu.dfdx(g, 0.05))
    np.testing.assert_allclose(
        np.asarray(jitted(fj)), np.asarray(cfd_tpu.dfdx(fj, 0.05)), rtol=1e-12
    )
    batched = jax.vmap(lambda g: cfd_tpu.dfdx(g, 0.05))(jnp.stack([fj, 2 * fj]))
    np.testing.assert_allclose(
        np.asarray(batched[1]), 2 * np.asarray(batched[0]), rtol=1e-12
    )


def test_gradient_divergence_curl():
    f, (z, y, x) = _field(12, 12, 32)
    spacing = (
        float(z[1, 0, 0] - z[0, 0, 0]),
        float(y[0, 1, 0] - y[0, 0, 0]),
        float(x[0, 0, 1] - x[0, 0, 0]),
    )
    fj = jnp.asarray(f)
    gx, gy, gz = cfd_tpu.gradient(fj, spacing)
    assert gx.shape == f.shape and gy.shape == f.shape and gz.shape == f.shape
    # curl(grad f) = 0 up to truncation error
    cx, cy, cz = cfd_tpu.curl((gx, gy, gz), spacing)
    for c in (cx, cy, cz):
        assert float(jnp.max(jnp.abs(c))) < 5e-2
    # divergence of (f, 0, 0) equals dfdx
    div = cfd_tpu.divergence((fj, jnp.zeros_like(fj), jnp.zeros_like(fj)), spacing)
    np.testing.assert_allclose(
        np.asarray(div), np.asarray(cfd_tpu.dfdx(fj, spacing[2])), rtol=1e-12
    )


def test_unknown_method():
    with pytest.raises(ValueError, match="unknown solver method"):
        cfd_tpu.derivative(jnp.zeros((8, 2)), 0.1, SCHEME4, method="magic")


@pytest.mark.parametrize("scheme", [SCHEME4, SCHEME6], ids=["pade4", "lele6"])
def test_closure_ghosts_reproduce_closure_rhs(rng, scheme):
    # interior stencil applied over [ghosts; f; ghosts] must equal compact_rhs
    n = 24
    f = jnp.asarray(rng.standard_normal((n, 7)))
    gl, gr = closure_ghosts(f, scheme)
    f_ext = jnp.concatenate([gl, f, gr], axis=0)
    w = scheme.stencil_width
    r = jnp.zeros_like(f)
    for k, wt in zip(scheme.rhs_offsets, scheme.rhs_weights):
        r = r + wt * (f_ext[w + k : w + k + n] - f_ext[w - k : w - k + n])
    np.testing.assert_allclose(
        np.asarray(r), np.asarray(compact_rhs(f, 1.0, scheme)), rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("scheme", ALL_SCHEMES, ids=IDS)
def test_pallas_interpret_vs_oracle(rng, scheme):
    # the fused kernel in interpreter mode on CPU, f32
    f = rng.standard_normal((32, 4, 8))
    dx = 0.021
    from cfd_tpu.ops.pallas_fused import fused_derivative_lines

    got = np.asarray(
        fused_derivative_lines(
            jnp.asarray(f, jnp.float32), dx, scheme, interpret=True
        )
    )
    expect = derivative_np(scheme, f, dx, axis=0)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)


def test_matmul_method_f32(rng):
    # the MXU dense-operator path at f32: roundoff-level agreement
    f = rng.standard_normal((6, 4, 64)).astype(np.float32)
    got = np.asarray(
        cfd_tpu.derivative(jnp.asarray(f), 0.05, SCHEME4, axis=-1, method="matmul")
    )
    ref = derivative_np(SCHEME4, f, 0.05, axis=-1)
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 5e-6, rel


@pytest.mark.parametrize("axis", [-1, -2, -3])
def test_matmul_axis_handling(rng, axis):
    f = rng.standard_normal((8, 12, 16))
    got = np.asarray(
        cfd_tpu.derivative(jnp.asarray(f), 0.1, SCHEME6, axis=axis, method="matmul")
    )
    ref = derivative_np(SCHEME6, f, 0.1, axis=axis)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-11)


def test_pallas_rejects_f64():
    from cfd_tpu.ops.pallas_fused import fused_derivative_lines

    with pytest.raises(ValueError, match="float32"):
        fused_derivative_lines(jnp.zeros((16, 4), jnp.float64), 0.1, SCHEME4)


@pytest.mark.parametrize("scheme", ALL_SCHEMES, ids=IDS)
@pytest.mark.parametrize("axis", [-1, -3])
def test_blocked_matmul_long_lines(rng, scheme, axis):
    # lines longer than the whole-operator cutoff take the blocked
    # substructuring path (per-block inverses + reduced interface matmul)
    from cfd_tpu.ops.derivatives import _blocked_matmul_derivative

    shape = [3, 4]
    shape.insert({-1: 2, -3: 0}[axis], 1024)
    f = rng.standard_normal(tuple(shape))
    got = np.asarray(
        _blocked_matmul_derivative(jnp.asarray(f), 0.01, scheme, axis % 3, None)
    )
    ref = derivative_np(scheme, f, 0.01, axis=axis)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-11)


def test_blocked_matmul_odd_length(rng):
    # non-power-of-two long line: block picker falls back to any divisor
    from cfd_tpu.ops.derivatives import _blocked_matmul_derivative

    f = rng.standard_normal((2, 3, 1000))
    got = np.asarray(
        _blocked_matmul_derivative(jnp.asarray(f), 0.02, SCHEME4, 2, None)
    )
    ref = derivative_np(SCHEME4, f, 0.02, axis=-1)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-11)


def test_bfloat16_inputs(rng):
    # bf16 fields are accepted on every path and keep their dtype
    f = jnp.asarray(rng.standard_normal((4, 4, 64)), jnp.bfloat16)
    for method in ("matmul", "pcr"):
        out = cfd_tpu.derivative(f, 0.05, SCHEME4, axis=-1, method=method)
        assert out.dtype == jnp.bfloat16
        ref = derivative_np(SCHEME4, np.asarray(f, np.float64), 0.05, axis=-1)
        rel = np.max(np.abs(np.asarray(out, np.float64) - ref)) / np.max(np.abs(ref))
        assert rel < 0.05, (method, rel)  # bf16 has ~3 decimal digits


@pytest.mark.parametrize("scheme", ALL_SCHEMES, ids=IDS)
@pytest.mark.parametrize("axis", [0, 2])
def test_stencil_method_vs_oracle(rng, scheme, axis):
    # explicit wide-stencil form of the implicit scheme (banded_operator)
    shape = [4, 5]
    shape.insert(axis if axis == 0 else 2, 128)
    f = rng.standard_normal(tuple(shape))
    got = np.asarray(
        cfd_tpu.derivative(jnp.asarray(f), 0.01, scheme, axis=axis, method="stencil")
    )
    ref = derivative_np(scheme, f, 0.01, axis=axis)
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 2e-7, rel


def test_stencil_rejects_short_lines():
    with pytest.raises(ValueError, match="too short"):
        cfd_tpu.derivative(jnp.zeros((32, 4)), 0.1, SCHEME4, axis=0, method="stencil")


@pytest.mark.parametrize("method", ["pcr", "thomas", "matmul"])
def test_autodiff_through_derivative(rng, method):
    """The derivative is linear, so jax.grad of sum(dfdx(f)) must equal the
    operator's column sums (adjoint applied to ones) — AD works through all
    XLA-level backends."""
    from cfd_tpu.ops.derivatives import dense_operator

    n = 32
    dx = 0.07
    f = jnp.asarray(rng.standard_normal((4, n)))
    g = jax.grad(lambda h: jnp.sum(cfd_tpu.derivative(h, dx, SCHEME4, axis=-1, method=method)))(f)
    M = dense_operator(SCHEME4, n)
    expect = np.broadcast_to(M.sum(axis=0) / dx, (4, n))
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-9, atol=1e-10)


def test_jvp_matches_linearity(rng):
    n = 32
    f = jnp.asarray(rng.standard_normal((n,)))
    v = jnp.asarray(rng.standard_normal((n,)))
    fn = lambda h: cfd_tpu.derivative(h, 0.1, SCHEME6, axis=0)
    _, jv = jax.jvp(fn, (f,), (v,))
    np.testing.assert_allclose(np.asarray(jv), np.asarray(fn(v)), rtol=1e-11)


@pytest.mark.parametrize("scheme", ALL_SCHEMES, ids=IDS)
@pytest.mark.parametrize(
    "n,fold",
    [(256, True), (256, False), (384, False), (512, True)],
    ids=["n256-fold", "n256-roll", "n384-roll", "n512-fold"],
)
def test_lane_kernel_interpret_vs_oracle(rng, scheme, n, fold):
    # the transpose-free lane-axis kernel (interpreter mode on CPU), f32,
    # with a +3 mean offset — the cancellation stress that exposed the
    # f-space functional bug; both the fold and the roll forms
    # (see ops/pallas_lane.py docstring)
    from cfd_tpu.ops.pallas_lane import lane_derivative

    dx = 2 * np.pi / n
    x = np.arange(n) * dx
    # cast BEFORE the oracle: the comparison measures the kernel's own f32
    # arithmetic, not the d/dx-amplified input rounding (~2e-5 at 1/dx=41)
    f = (
        (np.sin(x) + 3.0)[None, :] * (1 + 0.1 * rng.standard_normal((16, 1)))
    ).astype(np.float32)
    got = np.asarray(
        lane_derivative(jnp.asarray(f), dx, scheme, interpret=True, fold=fold)
    )
    expect = derivative_np(scheme, np.asarray(f, np.float64), dx, axis=-1)
    scale = np.abs(expect).max()
    # fold rounding grows with n on smooth fields (docstring): 1e-5 covers
    # the supported-by-default n<=FOLD_MAX range; 512 is explicit opt-in
    tol = 4e-5 if (fold and n > 256) else 1e-5
    assert np.abs(got - expect).max() / scale < tol


def test_lane_kernel_fold_default_matches_forms(rng):
    # the default picks fold at n<=FOLD_MAX and rolls beyond
    from cfd_tpu.ops.pallas_lane import FOLD_MAX, lane_derivative

    assert FOLD_MAX == 256
    n = 256
    f = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32))
    d_auto = lane_derivative(f, 0.01, SCHEME4, interpret=True)
    d_fold = lane_derivative(f, 0.01, SCHEME4, interpret=True, fold=True)
    np.testing.assert_array_equal(np.asarray(d_auto), np.asarray(d_fold))


def test_lane_kernel_batch_padding(rng):
    # batch sizes that don't divide the row-block size exercise the pad path
    from cfd_tpu.ops.pallas_lane import lane_derivative

    n = 256
    dx = 0.01
    f = rng.standard_normal((3, 7, n)).astype(np.float32)
    got = np.asarray(
        lane_derivative(jnp.asarray(f), dx, SCHEME4, interpret=True)
    )
    expect = derivative_np(SCHEME4, np.asarray(f, np.float64), dx, axis=-1)
    assert np.abs(got - expect).max() / np.abs(expect).max() < 1e-5


@pytest.mark.parametrize("fold", [True, False], ids=["fold", "roll"])
@pytest.mark.parametrize("scheme", ALL_SCHEMES, ids=IDS)
def test_sublane_kernel_interpret_vs_oracle(rng, scheme, fold):
    # the transpose-free sublane-axis kernel (dfdy/dfdz layouts), f32, with
    # the same +3 mean-offset cancellation stress as the lane-kernel test,
    # in both the fold and roll forms
    from cfd_tpu.ops.pallas_sublane import sublane_derivative

    n = 256
    dx = 2 * np.pi / n
    x = np.arange(n) * dx
    f = (
        (np.sin(x) + 3.0)[None, :, None]
        * (1 + 0.1 * rng.standard_normal((3, 1, 24)))
    ).astype(np.float32)
    got = np.asarray(
        sublane_derivative(
            jnp.asarray(f), dx, scheme, axis=1, interpret=True, fold=fold
        )
    )
    expect = derivative_np(scheme, np.asarray(f, np.float64), dx, axis=1)
    scale = np.abs(expect).max()
    assert np.abs(got - expect).max() / scale < 1e-5


def test_sublane_kernel_axis0_and_lane_padding(rng):
    # leading-axis (dfdz-style) use plus a lane count that doesn't divide
    # the column block, exercising the pad path
    from cfd_tpu.ops.pallas_sublane import sublane_derivative

    n = 256
    dx = 0.01
    f = rng.standard_normal((n, 5, 13)).astype(np.float32)
    got = np.asarray(
        sublane_derivative(
            jnp.asarray(f), dx, SCHEME4, axis=0, cols=128, interpret=True
        )
    )
    expect = derivative_np(SCHEME4, np.asarray(f, np.float64), dx, axis=0)
    assert np.abs(got - expect).max() / np.abs(expect).max() < 1e-5


def test_sublane_kernel_rejects_unsupported():
    from cfd_tpu.ops.pallas_sublane import sublane_derivative, sublane_supported

    assert not sublane_supported(SCHEME4, 100, jnp.float32)
    # round 5: single-block (nb=1) lines are supported
    assert sublane_supported(SCHEME4, 128, jnp.float32)
    assert not sublane_supported(SCHEME4, 256, jnp.float64)
    with pytest.raises(ValueError):  # minor axis belongs to the lane kernel
        sublane_derivative(jnp.zeros((4, 256), jnp.float32), 0.1, SCHEME4, axis=-1)
    with pytest.raises(ValueError):
        sublane_derivative(jnp.zeros((256, 4), jnp.float64), 0.1, SCHEME4, axis=0)


def test_single_block_kernels_match_oracle():
    """Round 5: n=128 single-block (nb=1) lane/sublane routes — one block
    cyclically coupled to itself through the self-coupled 2x2 reduced
    system (parallel/compact.direction_tables). All four scheme classes,
    interpret mode, vs the host f64 scipy-banded oracle."""
    from cfd_tpu.oracle import derivative_np
    from cfd_tpu.ops.pallas_lane import lane_derivative
    from cfd_tpu.ops.pallas_sublane import sublane_derivative
    from cfd_tpu.schemes import get_filter, get_scheme

    rng = np.random.default_rng(0)
    f64 = rng.standard_normal((8, 128, 128))
    f = jnp.asarray(f64, jnp.float32)
    for sch in (
        SCHEME4_PERIODIC,
        SCHEME4,
        get_scheme(4, True, 2),
        get_filter(6, periodic=True),
    ):
        ref = derivative_np(sch, f64, 0.1, axis=-1)
        out = np.asarray(lane_derivative(f, 0.1, sch, interpret=True))
        assert np.max(np.abs(out - ref)) < 1e-5 * np.max(np.abs(ref)), sch.name
        ref2 = derivative_np(sch, f64, 0.1, axis=-2)
        out2 = np.asarray(
            sublane_derivative(f, 0.1, sch, axis=-2, interpret=True)
        )
        assert np.max(np.abs(out2 - ref2)) < 1e-5 * np.max(np.abs(ref2)), (
            sch.name
        )


def test_lane_kernel_rejects_unsupported():
    from cfd_tpu.ops.pallas_lane import lane_derivative, lane_supported

    assert not lane_supported(SCHEME4, 100, jnp.float32)  # not 128-multiple
    assert lane_supported(SCHEME4, 128, jnp.float32)  # nb=1 route (round 5)
    assert not lane_supported(SCHEME4, 256, jnp.float64)
    with pytest.raises(ValueError):
        lane_derivative(jnp.zeros((4, 100), jnp.float32), 0.1, SCHEME4)
    with pytest.raises(ValueError):
        lane_derivative(jnp.zeros((4, 256), jnp.float64), 0.1, SCHEME4)


@pytest.mark.parametrize(
    "scheme,order",
    [
        (SCHEME4, 4),
        (SCHEME6, 5),
        (SCHEME4_PERIODIC, 4),
        (SCHEME6_PERIODIC, 6),
    ],
    ids=["pade4", "lele6", "pade4_periodic", "lele6_periodic"],
)
def test_device_path_convergence_order(scheme, order):
    """Refinement sweep through the device API (f64 PCR path), with
    asserted rates — the reference's test_convergence.py only prints
    (code/cuda/test/test_convergence.py:23-52)."""
    errs = []
    for n in (32, 64, 128, 256):
        if scheme.periodic:
            dx = 2 * np.pi / n
            x = np.arange(n) * dx
        else:
            x = np.linspace(0.0, 1.0, n)
            dx = x[1] - x[0]
        f = jnp.asarray(np.sin(4 * x))
        df = np.asarray(cfd_tpu.derivative(f, dx, scheme, axis=-1, method="pcr"))
        errs.append(np.max(np.abs(df - 4 * np.cos(4 * x))))
    rates = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    # non-periodic global order is limited by the closure at the wall, but
    # boundary-layer weighting keeps observed rates near the interior order
    assert np.all(rates > order - 1.2), (errs, rates)
