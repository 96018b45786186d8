"""Native C++ oracle vs the python oracles (skipped if not built).

Parity check for the reference's C oracle tree (lanl-implementation/npts.c,
test_npts.c): same phi/psi algorithm, independent language."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from cfd_tpu.oracle import derivative_np, lanl_solve_np
from cfd_tpu.oracle import native
from cfd_tpu.schemes import SCHEME4, lhs_bands

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


def _ensure_built():
    if native.available():
        return True
    try:
        subprocess.run(
            ["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True
        )
    except Exception:
        return False
    native._lib.cache_clear()
    return native.available()


pytestmark = pytest.mark.skipif(
    not _ensure_built(), reason="native oracle not built and make failed"
)


def test_native_thomas_vs_python(rng):
    n = 64
    dl, d, du = lhs_bands(SCHEME4, n)
    rhs = rng.standard_normal((n, 9))
    got = native.thomas_solve_native(dl, d, du, rhs)
    expect = lanl_solve_np(dl, d, du, rhs, 1)
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("nblocks", [1, 2, 4, 8])
def test_native_phi_psi_vs_python(rng, nblocks):
    n = 64
    dl, d, du = lhs_bands(SCHEME4, n)
    rhs = rng.standard_normal((n, 5))
    got = native.phi_psi_solve_native(dl, d, du, rhs, nblocks)
    expect = lanl_solve_np(dl, d, du, rhs, nblocks)
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-13)


def test_native_dfdx_vs_python_oracle():
    n = 128
    x = np.linspace(0, 2 * np.pi, n)
    dx = x[1] - x[0]
    f = np.sin(x)[:, None] * np.ones((1, 3))
    got = native.dfdx_pade4_native(f, dx, nblocks=4)
    expect = derivative_np(SCHEME4, f, dx, axis=0)
    np.testing.assert_allclose(got, expect, rtol=1e-11, atol=1e-12)


def test_native_accuracy_main():
    out = subprocess.run(
        [str(NATIVE_DIR / "test_oracle"), "128", "4", "2"],
        check=True,
        capture_output=True,
        text=True,
    )
    assert "avg_abs_err" in out.stdout


def test_native_thomas_d2_and_filter(rng):
    """The native solver is band-generic: the d2 and filter schemes' full
    solves match the scipy oracle through the C++ Thomas path."""
    from cfd_tpu.oracle import compact_rhs_np, derivative_np
    from cfd_tpu.schemes import SCHEME4_D2, get_filter

    n = 96
    for scheme, dx in ((SCHEME4_D2, 0.05), (get_filter(6, 0.45, False), 1.0)):
        dl, d, du = lhs_bands(scheme, n)
        f = rng.standard_normal((n, 7))
        rhs = compact_rhs_np(scheme, f, dx)
        got = native.thomas_solve_native(dl, d, du, rhs)
        expect = derivative_np(scheme, f, dx)
        np.testing.assert_allclose(got, expect, rtol=1e-11, atol=1e-12)
