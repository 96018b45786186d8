"""Spectral Poisson solver + Helmholtz projection (ops/poisson.py).

Periodic compact operators are circulant, so these are EXACT inverses —
the gates are rounding-level (f64), not truncation-level.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import cfd_tpu
from cfd_tpu.ops.poisson import (
    laplacian_eigenvalues,
    project,
    solve_poisson,
    spectral_multipliers,
)
from cfd_tpu.schemes import SCHEME4, get_filter, get_scheme

SP = (0.11, 0.07, 0.05)
SHAPE = (24, 20, 16)


def _zero_mean_rhs(rng, shape):
    rhs = rng.standard_normal(shape)
    return jnp.asarray(rhs - rhs.mean())


@pytest.mark.parametrize("order", [4, 6])
def test_poisson_d2_roundtrip_exact(rng, order):
    """laplacian(solve_poisson(rhs)) == rhs to rounding (d2 schemes have
    no Nyquist null space)."""
    d2 = get_scheme(order, True, 2)
    rhs = _zero_mean_rhs(rng, SHAPE)
    p = solve_poisson(rhs, SP, d2)
    back = cfd_tpu.laplacian(p, SP, d2, method="matmul")
    assert float(jnp.max(jnp.abs(back - rhs))) < 1e-11
    assert abs(float(jnp.mean(p))) < 1e-13


@pytest.mark.parametrize("order", [4, 6])
def test_poisson_d1_divgrad_roundtrip(rng, order):
    """div(grad(solve_poisson(rhs))) recovers rhs projected onto the
    operator's range (central d1 schemes annihilate the odd-even modes
    that are 0-or-Nyquist along every axis)."""
    d1 = get_scheme(order, True, 1)
    rhs = _zero_mean_rhs(rng, SHAPE)
    p = solve_poisson(rhs, SP, d1)
    back = cfd_tpu.divergence(
        cfd_tpu.gradient(p, SP, d1, method="matmul"), SP, d1, method="matmul"
    )
    lam = laplacian_eigenvalues(d1, SHAPE, SP)
    rhs_range = np.fft.irfftn(
        np.fft.rfftn(np.asarray(rhs)) * (lam != 0), s=SHAPE, axes=(0, 1, 2)
    )
    assert float(jnp.max(jnp.abs(back - rhs_range))) < 1e-11


def test_poisson_mean_is_free_constant(rng):
    d2 = get_scheme(4, True, 2)
    rhs = _zero_mean_rhs(rng, SHAPE)
    p0 = solve_poisson(rhs, SP, d2)
    p5 = solve_poisson(rhs, SP, d2, mean=5.0)
    assert abs(float(jnp.mean(p5)) - 5.0) < 1e-12
    assert float(jnp.max(jnp.abs((p5 - p0) - 5.0))) < 1e-12


def test_poisson_analytic_sine(rng):
    """-(k'^2 amplification) checks sign/scaling: for f = sin(k x) the d2
    solve returns -sin(k x)/k''(k dx)*dx^2 exactly."""
    d2 = get_scheme(4, True, 2)
    n = 32
    dx = 2 * np.pi / n
    x = np.arange(n) * dx
    from cfd_tpu.schemes import transfer_function

    rhs3 = jnp.asarray(np.broadcast_to(np.sin(x), (8, 8, n)).copy())
    p = solve_poisson(rhs3, (dx, dx, dx), d2)
    kpp = float(transfer_function(d2, np.array([dx]))[0])  # k'' at k=1*dx
    expect = -np.sin(x) * dx**2 / kpp
    assert np.abs(np.asarray(p) - expect).max() < 1e-12


def test_project_kills_compact_divergence(rng):
    d1 = get_scheme(4, True, 1)
    u = tuple(jnp.asarray(rng.standard_normal(SHAPE)) for _ in range(3))
    up = project(u, SP, d1)
    div = cfd_tpu.divergence(up, SP, d1, method="matmul")
    assert float(jnp.max(jnp.abs(div))) < 1e-12


def test_project_compact_form_matches_spectral(rng):
    """u - grad(solve_poisson(div u)) is the same projection — 2 FFTs
    instead of 6 (the TPU-preferred form; ops/poisson.project)."""
    d1 = get_scheme(4, True, 1)
    u = tuple(jnp.asarray(rng.standard_normal(SHAPE)) for _ in range(3))
    us = project(u, SP, d1, method="spectral")
    uc = project(u, SP, d1, method="compact")
    for a, b in zip(us, uc):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-9
    div = cfd_tpu.divergence(uc, SP, d1, method="matmul")
    assert float(jnp.max(jnp.abs(div))) < 1e-9


def test_project_idempotent_and_preserves_solenoidal(rng):
    d1 = get_scheme(4, True, 1)
    u = tuple(jnp.asarray(rng.standard_normal(SHAPE)) for _ in range(3))
    up = project(u, SP, d1)
    upp = project(up, SP, d1)
    for a, b in zip(up, upp):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-13


def test_project_taylor_green_fixed_point():
    """The Taylor-Green field is divergence-free for the compact scheme
    too (its divergence cancels mode-by-mode), so project() is identity
    on it."""
    from cfd_tpu.models import taylor_green

    n = 16
    dx = 2 * np.pi / n
    c = np.arange(n) * dx
    u = taylor_green(jnp.asarray(c), jnp.asarray(c), jnp.asarray(c))
    u = tuple(jnp.asarray(a, jnp.float64) for a in u)
    up = project(u, (dx, dx, dx), get_scheme(4, True, 1))
    for a, b in zip(u, up):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-13


def test_spectral_multipliers_match_matmul_derivative(rng):
    """ifft(i m fft(f)) along x == dfdx by the dense operator, exactly."""
    d1 = get_scheme(6, True, 1)
    f = jnp.asarray(rng.standard_normal(SHAPE))
    _, _, mx = spectral_multipliers(d1, SHAPE, SP)
    got = np.fft.irfft(
        1j * mx * np.fft.rfft(np.asarray(f), axis=-1), n=SHAPE[-1], axis=-1
    )
    ref = cfd_tpu.dfdx(f, SP[2], d1, method="matmul")
    assert np.abs(got - np.asarray(ref)).max() < 1e-11


def test_poisson_rejects_bad_schemes():
    with pytest.raises(ValueError):
        solve_poisson(jnp.zeros(SHAPE), SP, SCHEME4)  # non-periodic
    with pytest.raises(ValueError):
        project((jnp.zeros(SHAPE),) * 3, SP, get_scheme(4, True, 2))  # d2
    with pytest.raises(ValueError):
        solve_poisson(jnp.zeros(SHAPE), SP, get_filter())  # filter
    with pytest.raises(ValueError):
        solve_poisson(jnp.zeros((4, 4)), SP, get_scheme(4, True, 2))  # 2-D


def test_matmul_dft_transforms_match_fft():
    """The MXU matmul-DFT spectral round trip (ops/poisson._rfft3_mm /
    _irfft3_mm — the TPU-auto transform behind solve_poisson) must match
    jnp.fft to f32 resolution."""
    import numpy as np

    from cfd_tpu.ops.poisson import _irfft3_mm, _rfft3_mm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 24, 32)), jnp.float32)
    re, im = _rfft3_mm(x)
    ref = jnp.fft.rfftn(x, axes=(-3, -2, -1))
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(re - ref.real))) < 1e-5 * scale
    assert float(jnp.max(jnp.abs(im - ref.imag))) < 1e-5 * scale
    back = _irfft3_mm(re, im, 32)
    assert float(jnp.max(jnp.abs(back - x))) < 1e-5


def test_split_radix_transforms_match_numpy():
    """Split-radix stages (n >= 256: two 128-deep sub-DFT matmuls + VPU
    butterfly; recursive at n >= 512) emit permuted bin order — forward
    spectra must equal numpy's rfftn under `_freq_perm`/`_rfreq_perm`, and
    the round trip must close. Shape exercises: z = 512 (one recursion
    level), y = 256 (single split), x = 256 (split r2c + permuted-dense
    c2r)."""
    import numpy as np

    from cfd_tpu.ops.poisson import (
        _freq_perm,
        _irfft3_mm,
        _rfft3_mm,
        _rfreq_perm,
        _split_stage,
    )

    assert _split_stage(256) and _split_stage(512) and not _split_stage(64)
    # recursion composes: 512's halves are each in 256-split order
    p = _freq_perm(512)
    assert p[0] == 0 and len(np.unique(p)) == 512
    rng = np.random.default_rng(1)
    x = rng.standard_normal((512, 256, 8)).astype(np.float32)
    re, im = _rfft3_mm(jnp.asarray(x))
    ref = np.fft.rfftn(x.astype(np.float64), axes=(-3, -2, -1))
    ref = ref[_freq_perm(512)][:, _freq_perm(256)][:, :, _rfreq_perm(8)]
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(re) - ref.real).max() < 3e-6 * scale
    assert np.abs(np.asarray(im) - ref.imag).max() < 3e-6 * scale
    back = _irfft3_mm(re, im, 8)
    assert np.abs(np.asarray(back) - x).max() < 3e-6 * np.abs(x).max()

    # x-axis split + c2r: thin z/y keep it cheap
    x2 = rng.standard_normal((8, 8, 256)).astype(np.float32)
    re2, im2 = _rfft3_mm(jnp.asarray(x2))
    ref2 = np.fft.rfftn(x2.astype(np.float64), axes=(-3, -2, -1))
    ref2 = ref2[:, :, _rfreq_perm(256)]
    s2 = np.abs(ref2).max()
    assert np.abs(np.asarray(re2) - ref2.real).max() < 3e-6 * s2
    assert np.abs(np.asarray(im2) - ref2.imag).max() < 3e-6 * s2
    back2 = _irfft3_mm(re2, im2, 256)
    assert np.abs(np.asarray(back2) - x2).max() < 3e-6 * np.abs(x2).max()
