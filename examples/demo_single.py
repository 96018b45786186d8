"""Single-device demo: derivative of an analytic field, error report.

The analogue of the reference's demo scripts (code/cuda/demo.py,
code/ocl/demo.py) without the matplotlib dependency: computes d/dx, d/dy,
d/dz of f = x cos(xy) + sin(z) y on an N^3 grid and prints max abs errors.

    python examples/demo_single.py [N] [order]
"""

import math
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cfd_tpu
from cfd_tpu.models import benchmark_field


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    order = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    scheme = cfd_tpu.get_scheme(order)
    z = jnp.linspace(0.1, 1.2, n)
    y = jnp.linspace(0.2, 1.4, n)
    x = jnp.linspace(0.3, 1.6, n)
    f, exact = benchmark_field(z, y, x)
    spacing = (float(z[1] - z[0]), float(y[1] - y[0]), float(x[1] - x[0]))
    grads = cfd_tpu.gradient(f, spacing, scheme)
    for name, got, ref in zip("xyz", grads, exact):
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"df/d{name}: max abs error = {err:.3e}")

    # beyond the reference's surface: compact second derivative + filter
    d = 2 * math.pi / n
    c = jnp.arange(n) * d
    s = jnp.sin(c)[None, None, :] * jnp.ones((n, n, 1))
    d2 = cfd_tpu.d2fdx2(s, d, cfd_tpu.get_scheme(order, True, derivative=2))
    print(f"d2/dx2 sin -> -sin: max abs error = "
          f"{float(jnp.max(jnp.abs(d2 + s))):.3e}")
    noisy = s + 0.2 * (-1.0) ** jnp.arange(n)[None, None, :]
    clean = cfd_tpu.filter_field(
        noisy, cfd_tpu.get_filter(6, 0.45, periodic=True), axis=-1
    )
    print(f"filter removes 0.2-amplitude Nyquist sawtooth: residual = "
          f"{float(jnp.max(jnp.abs(clean - s))):.3e}")


if __name__ == "__main__":
    main()
