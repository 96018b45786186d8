"""Leading-axis substructured kernel (native-3D dfdz) vs the float64 oracle.

ops/pallas_leading.py differentiates the untiled major axis of a native
(nz, ny, nx) field with zero relayouts — the TPU answer to the reference's
host-transpose dfdz (/root/reference/code/ocl/compact.py:52-61). Interpret
mode on CPU; the real-TPU path is exercised by bench/verify runs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import cfd_tpu
from cfd_tpu.oracle import derivative_np
from cfd_tpu.ops.pallas_leading import leading_derivative, leading_supported
from cfd_tpu.schemes import (
    SCHEME4,
    SCHEME4_D2,
    SCHEME4_D2_PERIODIC,
    SCHEME4_PERIODIC,
    SCHEME6,
    SCHEME6_PERIODIC,
    get_filter,
)

ALL = [SCHEME4, SCHEME4_PERIODIC, SCHEME6, SCHEME6_PERIODIC]


def _check(scheme, f64, dx, tol, **kw):
    f = jnp.asarray(f64, jnp.float32)
    out = leading_derivative(f, dx, scheme, interpret=True, **kw)
    ref = derivative_np(scheme, np.float64(np.float32(f64)), dx, axis=0)
    rel = np.abs(np.asarray(out, np.float64) - ref).max() / np.abs(ref).max()
    assert rel < tol, f"{scheme.name}: rel={rel:.3e}"


@pytest.mark.parametrize("scheme", ALL, ids=[s.name for s in ALL])
def test_leading_matches_oracle_3d(rng, scheme):
    assert leading_supported(scheme, 256, jnp.float32)
    _check(scheme, rng.standard_normal((256, 16, 128)) + 0.5, 0.02, 5e-6)


@pytest.mark.parametrize("scheme", [SCHEME4, SCHEME4_PERIODIC])
def test_leading_2d_fallback(rng, scheme):
    """2-D (n, B) batches take the flat blockspec path, including padding."""
    _check(scheme, rng.standard_normal((128, 100)) + 0.5, 0.05, 5e-6)


def test_leading_second_derivative(rng):
    _check(SCHEME4_D2, rng.standard_normal((128, 8, 128)), 0.02, 5e-5)
    _check(SCHEME4_D2_PERIODIC, rng.standard_normal((128, 8, 128)), 0.02, 5e-5)


def test_leading_filter(rng):
    filt = get_filter(6, periodic=True)
    _check(filt, rng.standard_normal((128, 8, 128)) + 2.0, 1.0, 5e-6)


def test_leading_odd_block_counts(rng):
    """n = 192 -> nb = 4 sub-blocks of 48; n = 64 -> nb = 2 of 32."""
    _check(SCHEME4, rng.standard_normal((192, 8, 128)), 0.02, 5e-6)
    _check(SCHEME4_PERIODIC, rng.standard_normal((64, 8, 128)), 0.02, 5e-6)


def test_leading_acc_fusion(rng):
    """acc rides the final write: leading(f, acc=a) == leading(f) + a."""
    f64 = rng.standard_normal((128, 8, 128)) + 0.5
    a64 = rng.standard_normal((128, 8, 128))
    f = jnp.asarray(f64, jnp.float32)
    a = jnp.asarray(a64, jnp.float32)
    fused = leading_derivative(f, 0.02, SCHEME4, acc=a, interpret=True)
    plain = leading_derivative(f, 0.02, SCHEME4, interpret=True) + a
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), rtol=0, atol=1e-4
    )
    with pytest.raises(ValueError):
        leading_derivative(f, 0.02, SCHEME4, acc=a[:, :4], interpret=True)


def test_leading_rejects_f64_and_short_lines(rng):
    with pytest.raises(ValueError):
        leading_derivative(jnp.zeros((256, 8, 128)), 0.1, SCHEME4)
    with pytest.raises(ValueError):
        leading_derivative(
            jnp.zeros((48, 8, 128), jnp.float32), 0.1, SCHEME4, interpret=True
        )


def test_dfdz_pallas_method_routes_to_leading(rng):
    """method='pallas' on a 3-D field's leading axis must match the oracle
    through the public API (routing in ops/derivatives.py)."""
    f64 = rng.standard_normal((128, 16, 128)) + 0.5
    f = jnp.asarray(f64, jnp.float32)
    out = cfd_tpu.dfdz(f, 0.02, SCHEME4, method="pallas", interpret=True)
    ref = derivative_np(SCHEME4, np.float64(np.float32(f64)), 0.02, axis=0)
    rel = np.abs(np.asarray(out, np.float64) - ref).max() / np.abs(ref).max()
    assert rel < 5e-6


def test_leading_mul_acc_fusion(rng):
    """mul/acc epilogue: out == mul * deriv + acc exactly up to f32 ordering."""
    f = jnp.asarray(rng.standard_normal((128, 8, 128)), jnp.float32)
    uz = jnp.asarray(rng.standard_normal((128, 8, 128)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((128, 8, 128)), jnp.float32)
    base = leading_derivative(f, 0.02, SCHEME4_PERIODIC, interpret=True)
    fused = leading_derivative(
        f, 0.02, SCHEME4_PERIODIC, mul=uz, acc=a, interpret=True
    )
    ref = uz * base + a
    err = float(jnp.max(jnp.abs(fused - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-6, err
    with pytest.raises(ValueError):
        leading_derivative(
            f, 0.02, SCHEME4_PERIODIC, mul=uz[:, :4], interpret=True
        )


def test_rk3_solve_update_matches_unfused(rng):
    """Fused solve+RK substep == leading_solve + the explicit Williamson
    update, for both the q-carrying and the first (q=None) substep."""
    from cfd_tpu.ops.pallas_leading import (
        leading_solve,
        rk3_solve_update,
        rk3_update_supported,
    )
    from cfd_tpu.schemes import get_scheme

    s2 = get_scheme(4, True, derivative=2)
    shp = (64, 16, 128)
    r = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    adv = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    fin = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    a, b, dt, nu = -5.0 / 9.0, 15.0 / 16.0, 1e-3, 1e-2
    assert rk3_update_supported(s2, shp, jnp.float32)
    lap = leading_solve(r, s2, interpret=True)

    qn, fn = rk3_solve_update(
        r, adv, q0, fin, s2, a=a, b=b, dt=dt, nu=nu, interpret=True
    )
    q_ref = a * q0 + dt * (nu * lap - adv)
    f_ref = fin + b * q_ref
    assert float(jnp.max(jnp.abs(qn - q_ref))) < 2e-6 * float(
        jnp.max(jnp.abs(q_ref))
    ) + 1e-12
    assert float(jnp.max(jnp.abs(fn - f_ref))) < 2e-6 * float(
        jnp.max(jnp.abs(f_ref))
    )

    qn0, fn0 = rk3_solve_update(
        r, adv, None, fin, s2, a=0.0, b=1.0 / 3.0, dt=dt, nu=nu, interpret=True
    )
    q_ref0 = dt * (nu * lap - adv)
    assert float(jnp.max(jnp.abs(qn0 - q_ref0))) < 2e-6 * float(
        jnp.max(jnp.abs(q_ref0))
    ) + 1e-12
    assert float(jnp.max(jnp.abs(fn0 - (fin + q_ref0 / 3.0)))) < 2e-6 * float(
        jnp.max(jnp.abs(fin))
    )
    with pytest.raises(ValueError):
        rk3_solve_update(
            r, adv[:, :4], q0, fin, s2, a=a, b=b, dt=dt, nu=nu, interpret=True
        )


def test_rk3_mega_matches_two_dispatch(rng):
    """The one-dispatch mega kernel (interleaved d1z + Laplacian solve +
    RK epilogue, ops/pallas_megastep.py) == the two separate dispatches it
    replaces, for both the q-carrying and the first (q=None) substep."""
    from cfd_tpu.ops.pallas_leading import leading_derivative, rk3_solve_update
    from cfd_tpu.ops.pallas_megastep import rk3_mega, rk3_mega_supported
    from cfd_tpu.schemes import get_scheme

    s1 = SCHEME4_PERIODIC
    s2 = get_scheme(4, True, derivative=2)
    shp = (64, 16, 128)
    dz = 0.02
    f = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    r = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    axy = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    uz = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    a, b, dt, nu = -5.0 / 9.0, 15.0 / 16.0, 1e-3, 1e-2
    assert rk3_mega_supported(s1, s2, shp, jnp.float32, has_q=True)

    adv = leading_derivative(f, dz, s1, mul=uz, acc=axy, interpret=True)
    for q, aa, bb in ((q0, a, b), (None, 0.0, 1.0 / 3.0)):
        q_ref, f_ref = rk3_solve_update(
            r, adv, q, f, s2, a=aa, b=bb, dt=dt, nu=nu, interpret=True
        )
        qn, fn = rk3_mega(
            f, r, axy, uz, q, s1, s2, dz,
            a=aa, b=bb, dt=dt, nu=nu, interpret=True,
        )
        scale = float(jnp.max(jnp.abs(q_ref))) + 1e-12
        assert float(jnp.max(jnp.abs(qn - q_ref))) < 2e-6 * scale
        assert float(jnp.max(jnp.abs(fn - f_ref))) < 2e-6 * (
            float(jnp.max(jnp.abs(f_ref))) + 1e-12
        )

    # closure d1 schemes ride too (ghost rows are peeled statically)
    assert rk3_mega_supported(SCHEME4, s2, shp, jnp.float32, has_q=True)
    adv_c = leading_derivative(f, dz, SCHEME4, mul=uz, acc=axy, interpret=True)
    q_ref, f_ref = rk3_solve_update(
        r, adv_c, q0, f, s2, a=a, b=b, dt=dt, nu=nu, interpret=True
    )
    qn, fn = rk3_mega(
        f, r, axy, uz, q0, SCHEME4, s2, dz, a=a, b=b, dt=dt, nu=nu,
        interpret=True,
    )
    assert float(jnp.max(jnp.abs(qn - q_ref))) < 2e-6 * (
        float(jnp.max(jnp.abs(q_ref))) + 1e-12
    )

    with pytest.raises(ValueError):
        rk3_mega(
            f, r[:, :4], axy, uz, q0, s1, s2, dz,
            a=a, b=b, dt=dt, nu=nu, interpret=True,
        )
    assert not rk3_mega_supported(s1, s2, shp, jnp.float64, has_q=True)

    # uz aliased to f (a Burgers z-component advected by itself): the
    # separate uz stream is dropped, output must be bit-identical
    fcopy = f + 0.0
    for q in (q0, None):
        aa, bb = (a, b) if q is not None else (0.0, 1.0 / 3.0)
        q_ref, f_ref = rk3_mega(
            f, r, axy, fcopy, q, s1, s2, dz,
            a=aa, b=bb, dt=dt, nu=nu, interpret=True,
        )
        qn, fn = rk3_mega(
            f, r, axy, f, q, s1, s2, dz,
            a=aa, b=bb, dt=dt, nu=nu, interpret=True,
        )
        assert jnp.array_equal(qn, q_ref) and jnp.array_equal(fn, f_ref)

    # write_q=False (last substep: q' dead, its HBM write elided and the
    # qout buffer demoted to VMEM scratch): f' must be bit-identical, and
    # the aliased-uz variant must compose with it
    for q in (q0, None):
        aa, bb = (a, b) if q is not None else (0.0, 1.0 / 3.0)
        for vel in (uz, f):
            _, f_ref = rk3_mega(
                f, r, axy, vel, q, s1, s2, dz,
                a=aa, b=bb, dt=dt, nu=nu, interpret=True,
            )
            qn, fn = rk3_mega(
                f, r, axy, vel, q, s1, s2, dz,
                a=aa, b=bb, dt=dt, nu=nu, write_q=False, interpret=True,
            )
            assert qn is None
            assert jnp.array_equal(fn, f_ref)
