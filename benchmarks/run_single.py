"""Single-chip benchmark sweep — the port of the reference's perf-test tree.

Covers the analogues of:
* perf-test/single-GPU/PyCUDA/run.py — solve-only batched tridiagonal sweep
* perf-test/multi-GPU/PyCUDA/run.py at 1 rank — full derivative pipeline
* perf-test/single-GPU/cusparse-dgtsv — comparison against the library
  solver (here: jax.lax.linalg.tridiagonal_solve) and the XLA-level PCR path

Writes one JSON object per line to stdout and (optionally) a results file:
    python benchmarks/run_single.py [--sizes 32,64,256] [--out results.json]

All timings use chain-slope measurement (cfd_tpu.utils.timing.chain_time) —
see that module for why naive block_until_ready timing is invalid here.
"""

import argparse
import json
import math
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cfd_tpu
from cfd_tpu.ops import tridiag
from cfd_tpu.ops.pallas_fused import solve_lines_pallas
from cfd_tpu.schemes import SCHEME4, lhs_bands
from cfd_tpu.utils.timing import chain_time


def bench_solve_only(n, results):
    """Batched near-Toeplitz solve of n^2 lines of length n (solve only)."""
    rng = np.random.default_rng(0)
    rhs_t = jnp.asarray(rng.random((n, n * n), np.float32))  # lines leading

    fac_pcr = tridiag.pcr_factor(*lhs_bands(SCHEME4, n))

    steps = {
        "pcr": lambda r: tridiag.pcr_solve(fac_pcr, r),
        "pallas_thomas": lambda r: solve_lines_pallas(r, 1.0, SCHEME4),
    }
    if jax.default_backend() == "cpu":
        steps.pop("pallas_thomas")
    for name, step in steps.items():
        t = chain_time(step, rhs_t, k_small=2, k_big=14, repeats=2)
        results.append(
            {
                "bench": "solve_only",
                "solver": name,
                "grid": f"{n}^3",
                "ms": round(t * 1e3, 4),
                "gpts_per_s": round(n**3 / t / 1e9, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    # library comparison: XLA's tridiagonal_solve (cusparse-gtsv analogue)
    try:
        dl, d, du = (jnp.asarray(b, jnp.float32) for b in lhs_bands(SCHEME4, n))
        rhs_b = jnp.asarray(rng.random((n * n, n, 1), np.float32))
        dlb = jnp.broadcast_to(dl, (n * n, n))
        db = jnp.broadcast_to(d, (n * n, n))
        dub = jnp.broadcast_to(du, (n * n, n))

        def lib_step(r):
            return jax.lax.linalg.tridiagonal_solve(dlb, db, dub, r)

        t = chain_time(lib_step, rhs_b, k_small=2, k_big=6, repeats=2)
        results.append(
            {
                "bench": "solve_only",
                "solver": "lax.tridiagonal_solve",
                "grid": f"{n}^3",
                "ms": round(t * 1e3, 4),
                "gpts_per_s": round(n**3 / t / 1e9, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    except Exception as e:  # pragma: no cover - library path may be missing
        print(json.dumps({"bench": "solve_only", "solver": "lax", "error": str(e)}))


def bench_full_derivative(n, results):
    """Full dfdx/dfdy/dfdz pipeline on an n^3 field."""
    dx = 2 * math.pi / n
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.random((n, n, n), np.float32))
    method = "auto"
    for name, step in (
        ("dfdx", lambda g: cfd_tpu.dfdx(g, dx, SCHEME4, method=method)),
        ("dfdy", lambda g: cfd_tpu.dfdy(g, dx, SCHEME4, method=method)),
        ("dfdz", lambda g: cfd_tpu.dfdz(g, dx, SCHEME4, method=method)),
    ):
        t = chain_time(step, f, k_small=2, k_big=14, repeats=2)
        results.append(
            {
                "bench": "full_derivative",
                "op": name,
                "method": method,
                "grid": f"{n}^3",
                "ms": round(t * 1e3, 4),
                "gpts_per_s": round(n**3 / t / 1e9, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,128,256")
    ap.add_argument("--out", default=None)
    ap.add_argument("--solve-only", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    results = []
    for n in sizes:
        bench_solve_only(n, results)
        if not args.solve_only:
            bench_full_derivative(n, results)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(
                {"device": str(jax.devices()[0]), "results": results}, fh, indent=1
            )


if __name__ == "__main__":
    main()
