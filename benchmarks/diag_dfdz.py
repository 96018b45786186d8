"""dfdz diagnosis: decompose the sublane-kernel cost on the (nz, ny*nx) layout.

The copy-floor measurements (diag_lane.py) showed every dfdz DMA pattern
runs at ~0.17-0.19 ms at 256^3 — the strided-run theory of round 2 is
dead. The sublane dfdz at 0.40-0.44 ms is therefore *compute* that fails
to hide. This script times stripped variants of the kernel on the exact
dfdz layout (one (256, 65536) block-row, C-lane tiles) to locate it:

  copy        out = f                      (the floor)
  rolls       out = g + roll(g,1)          (the RHS stage alone)
  dots        out = per-block T^-1 @ f     (the MXU stage alone)
  fold        full fold-form kernel        (dots + edge FMAs + D corr)
  roll-full   full roll-form kernel        (rhs + dots + closures + D corr)
  matmul      dense einsum route           (the current auto winner)

Run on the real TPU:  python benchmarks/diag_dfdz.py
"""

import functools
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfd_tpu.ops import derivatives as dv
from cfd_tpu.ops.pallas_lane import _fold_tables, _lane_tables
from cfd_tpu.ops.pallas_sublane import sublane_derivative
from cfd_tpu.schemes import SCHEME4_PERIODIC
from cfd_tpu.utils.timing import chain_time

N = 256
SCH = SCHEME4_PERIODIC
M = 128


def _pallas2d(kern, x, cols, n_tables=0, tables=()):
    nz, L = x.shape
    whole = lambda *shape: pl.BlockSpec(
        shape, lambda j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(L // cols,),
        in_specs=[
            pl.BlockSpec((nz, cols), lambda j: (0, j), memory_space=pltpu.VMEM)
        ]
        + [whole(*t.shape) for t in tables],
        out_specs=pl.BlockSpec(
            (nz, cols), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * x.size,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(x, *tables)


def k_copy(f_ref, o_ref):
    o_ref[:] = f_ref[:]


def k_rolls(f_ref, o_ref):
    f = f_ref[:]
    g = pltpu.roll(f, N - 1, 0) - f
    o_ref[:] = g + pltpu.roll(g, 1, 0)


def k_dots(f_ref, t_ref, o_ref):
    f = f_ref[:]
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    for b in range(N // M):
        o_ref[M * b : M * (b + 1), :] = dot(t_ref[b], f[M * b : M * (b + 1), :])


def k_dots_default(f_ref, t_ref, o_ref):
    f = f_ref[:]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    for b in range(N // M):
        o_ref[M * b : M * (b + 1), :] = dot(t_ref[b], f[M * b : M * (b + 1), :])


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, N * N)), jnp.float32)
    x3 = x.reshape(N, N, N)

    Tm, _, _, _, _, _, _ = _lane_tables(SCH, N)
    T = jnp.asarray(np.ascontiguousarray(np.transpose(Tm, (0, 2, 1))))

    cases = {}
    for C in (1024, 2048):
        cases[f"copy C={C}"] = (
            functools.partial(_pallas2d, k_copy, cols=C), x)
        cases[f"rolls C={C}"] = (
            functools.partial(_pallas2d, k_rolls, cols=C), x)
        cases[f"dots C={C}"] = (
            lambda g, C=C: _pallas2d(k_dots, g, C, tables=(T,)), x)
        cases[f"dots-default C={C}"] = (
            lambda g, C=C: _pallas2d(k_dots_default, g, C, tables=(T,)), x)
    for C in (1024, 2048):
        cases[f"sublane roll C={C}"] = (
            lambda g, C=C: sublane_derivative(g, 1.0, SCH, axis=0, cols=C),
            x3,
        )
        cases[f"sublane fold C={C}"] = (
            lambda g, C=C: sublane_derivative(
                g, 1.0, SCH, axis=0, cols=C, fold=True
            ),
            x3,
        )
    cases["matmul dfdz"] = (
        lambda g: dv.dfdz(g, 1.0, SCH, method="matmul"), x3)

    results = {k: [] for k in cases}
    for p in range(2):
        for name, (step, xx) in cases.items():
            try:
                t = chain_time(step, xx, k_small=4, k_big=64, repeats=3)
            except Exception as e:
                print(json.dumps({"case": name, "error": str(e)[:160]}), flush=True)
                results[name].append(None)
                continue
            results[name].append(t)
            print(
                json.dumps(
                    {"case": name, "pass": p, "ms": round(t * 1e3, 4)}
                ),
                flush=True,
            )

    print("\n=== best-of ===")
    for name, ts in results.items():
        ts = [t for t in ts if t]
        if ts:
            t = min(ts)
            print(
                json.dumps(
                    {
                        "case": name,
                        "ms": round(t * 1e3, 4),
                        "gpts_per_s": round(N**3 / t / 1e9, 2),
                    }
                )
            )


if __name__ == "__main__":
    main()
