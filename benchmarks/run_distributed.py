"""Distributed benchmark — the port of perf-test/multi-GPU/PyCUDA/run.py.

Times the full distributed dfdx pipeline (halo exchange + local solves +
reduced interface system + rank-2 update) on an (npz, npy, npx) device mesh.
On a single chip it runs the same code path with a (1,1,1) mesh; on a CPU
host set XLA_FLAGS=--xla_force_host_platform_device_count=8 CFD_MESH=2,2,2
for a functional 8-way run (numbers are then CPU numbers — the reference's
committed logs in perf-test/multi-GPU/ref-results are the comparison for
real multi-chip runs).

    CFD_MESH=1,1,1 CFD_GRID=256,256,256 python benchmarks/run_distributed.py
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cfd_tpu
from cfd_tpu.config import Config
from cfd_tpu.models import benchmark_field
from cfd_tpu.utils.timing import chain_time


def main():
    cfg = Config.from_env()  # method defaults to "auto"; CFD_METHOD overrides
    grid = cfg.make_grid()
    nz, ny, nx = cfg.grid_shape
    z, y, x = (jnp.arange(n, dtype=jnp.float32) * d for n, d in
               zip(cfg.grid_shape, cfg.spacing))
    f, _ = benchmark_field(z, y, x)  # the reference harness field
    fj = grid.distribute(f.astype(cfg.jax_dtype))
    solver = cfd_tpu.DistributedCompactSolver(grid, method=cfg.method)

    t = chain_time(solver.dfdx, fj, k_small=2, k_big=18, repeats=3)
    npts = nz * ny * nx
    print(
        json.dumps(
            {
                "bench": "distributed_dfdx",
                "mesh": "x".join(map(str, cfg.mesh_shape)),
                "grid": f"{nz}x{ny}x{nx}",
                "method": cfg.method,
                "ms": round(t * 1e3, 4),
                "gpts_per_s": round(npts / t / 1e9, 3),
                "mpts_per_s_per_device": round(
                    npts / t / 1e6 / math.prod(cfg.mesh_shape), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
