"""Large sharded-solve validation (BASELINE.json config 4).

The north star asks for a sharded 1024^3 solve matching reference tolerance.
Without multi-chip hardware this script runs the same code path — pencil
decomposition, ppermute halos, distributed reduced system — on an 8-device
virtual CPU mesh at the full 1024^3 size:

* the field is built **per shard on device** (jit with sharded output from
  the grid's sharded coordinate arrays) — no 4 GiB host->device transfer,
  which the tunnelled runtime rejects and which round 1 worked around by
  scaling the problem down;
* the error norm is a jitted reduction over the sharded arrays — no
  gather back to one host.

    python examples/validate_sharded.py [N=1024]
"""

import functools
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

import cfd_tpu
from cfd_tpu.parallel import Grid, make_mesh


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dx = 2 * math.pi / n
    mesh = make_mesh((2, 2, 2))
    grid = Grid(mesh, (n, n, n), (dx, dx, dx), cfd_tpu.get_scheme(4, periodic=True))
    _, _, x = grid.coordinates()  # sharded 1-D coordinates

    @functools.partial(jax.jit, out_shardings=grid.sharding)
    def build(xc):
        # each device materialises only its own pencil
        return jnp.broadcast_to(
            jnp.sin(xc.astype(jnp.float32))[None, None, :], grid.shape
        )

    f = build(x)
    solver = cfd_tpu.DistributedCompactSolver(grid)
    t0 = time.time()
    # donate f: it is dead after the solve, and at 2048^3 (32 GiB per f32
    # array) the freed buffer is the difference between fitting in host RAM
    # and the OOM killer on the virtual CPU mesh
    df = jax.jit(solver.dfdx, donate_argnums=0)(f)
    del f

    @jax.jit
    def max_err(d, xc):
        return jnp.max(jnp.abs(d - jnp.cos(xc.astype(jnp.float32))[None, None, :]))

    err = float(max_err(df, x))
    dt = time.time() - t0
    print(
        f"sharded {n}^3 dfdx on 2x2x2 mesh: max abs err = {err:.3e} "
        f"({dt:.1f}s incl. compile, gather-free)"
    )
    assert err < 5e-5, err


if __name__ == "__main__":
    main()
