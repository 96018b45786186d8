"""Large sharded-solve validation (BASELINE.json config 4, scaled to the
available virtual mesh).

The north star asks for a sharded 1024^3 solve on a v5p-16 matching CPU
reference tolerance; without multi-chip hardware this script runs the same
code path — pencil decomposition, ppermute halos, distributed reduced
system — on an 8-device virtual CPU mesh at the largest size that's
practical there, checking against the analytic derivative.

    python examples/validate_sharded.py [N=256]
"""

import math
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import cfd_tpu
from cfd_tpu.parallel import Grid, make_mesh


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dx = 2 * math.pi / n
    mesh = make_mesh((2, 2, 2))
    grid = Grid(mesh, (n, n, n), (dx, dx, dx), cfd_tpu.get_scheme(4, periodic=True))
    x = (np.arange(n) * dx).astype(np.float32)
    f = grid.distribute(jnp.asarray(np.broadcast_to(np.sin(x), (n, n, n)).copy()))
    solver = cfd_tpu.DistributedCompactSolver(grid)
    t0 = time.time()
    df = solver.dfdx(f)
    err = float(jnp.max(jnp.abs(df - jnp.cos(jnp.asarray(x)))))
    dt = time.time() - t0
    print(
        f"sharded {n}^3 dfdx on 2x2x2 mesh: max abs err = {err:.3e} "
        f"({dt:.1f}s incl. compile)"
    )
    assert err < 5e-5, err


if __name__ == "__main__":
    main()
