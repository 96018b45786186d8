"""Device-timeline re-measurement of the non-dfdx headliners.

The round-3 committed sweep (results/single_v5e.json) carries dfdy/dfdz/
laplacian figures measured by chain-slope best-of; only dfdx had a
device-timeline capture committed. The round-3 verdict asked for the
+-0.2% method (utils.profiling.device_op_time_ms, reading op durations
back out of the profiler's device timeline — the same mechanism behind
rk3_v5e.json / filter_v5e.json / ns_v5e.json) on every headline axis op.

This script gates each op against the host scipy-banded oracle in real
float64 (computed with numpy on the host — the TPU has no native f64, so
an on-device "f64" reference would silently downcast), then measures
dfdx / dfdy / dfdz (auto routing: lane / sublane / native-3D leading
kernels) and the four-pass streaming laplacian at 256^3 f32, and commits
benchmarks/results/axis_ops_v5e.json.

Run on the real TPU:  python benchmarks/diag_axes.py [n=256]
"""

import json
import math
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
import numpy as np

from cfd_tpu.ops.derivatives import derivative, laplacian
from cfd_tpu.schemes import SCHEME4_D2_PERIODIC, SCHEME4_PERIODIC
from cfd_tpu.utils.profiling import device_op_time_ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sch = SCHEME4_PERIODIC
    dx = 2 * math.pi / n
    rng = np.random.default_rng(0)
    f64 = rng.standard_normal((n, n, n))
    f = jnp.asarray(f64, jnp.float32)
    pts = n**3

    # host f64 oracles (scipy-banded, true float64 — on-device references
    # would downcast to f32 on TPU, gating one f32 path against another)
    from cfd_tpu.oracle import derivative_np

    refs = {}
    for ax, name in ((-1, "dfdx"), (-2, "dfdy"), (-3, "dfdz")):
        refs[name] = derivative_np(sch, f64, dx, axis=ax)
    refs["laplacian"] = sum(
        derivative_np(SCHEME4_D2_PERIODIC, f64, dx, axis=ax)
        for ax in (-1, -2, -3)
    )

    cands = {
        "dfdx": lambda x: derivative(x, dx, sch, axis=-1, method="auto"),
        "dfdy": lambda x: derivative(x, dx, sch, axis=-2, method="auto"),
        "dfdz": lambda x: derivative(x, dx, sch, axis=-3, method="auto"),
        "laplacian": lambda x: laplacian(
            x, dx, SCHEME4_D2_PERIODIC, method="auto"
        ),
    }

    rows = {}
    print(f"-- {n}^3 f32 axis ops, device-timeline minima over 4 captures --")
    for name, fn in cands.items():
        ref = refs[name]
        scale = float(np.max(np.abs(ref)))
        err = float(np.max(np.abs(np.asarray(fn(f)) - ref))) / scale
        # gate before measuring: an accuracy regression must fail the run,
        # not silently commit a passing-looking artifact of record
        assert err < 2e-5, f"{name}: rel err vs host f64 oracle {err:.2e}"
        best = math.inf
        floor_best = math.inf
        for _ in range(4):
            ms, floor_ms, _ = device_op_time_ms(fn, f, iters=8)
            best = min(best, ms)
            floor_best = min(floor_best, floor_ms)
            time.sleep(1.0)
        gpts = pts / (best * 1e-3) / 1e9 if best < math.inf else 0.0
        print(
            f"{name:<10} {best:7.3f} ms ({gpts:6.1f} Gpt/s)"
            f"  rel err {err:.2e}  [copy floor {floor_best:.3f}]"
        )
        rows[name] = {
            "ms_device": round(best, 4),
            "gpts_per_s": round(gpts, 2),
            "rel_err_vs_f64": err,
            "copy_floor_ms": round(floor_best, 4),
        }

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "axis_ops_v5e.json",
    )
    with open(out_path, "w") as fh:
        json.dump(
            {
                "config": {
                    "n": n,
                    "dtype": "float32",
                    "scheme": "pade4 periodic (d2 via pade4_d2 tables)",
                    "routing": "auto (lane / sublane / leading / lap4)",
                    "method": "device timeline minima over 4 captures "
                    "(utils.profiling.device_op_time_ms)",
                },
                "rows": rows,
            },
            fh,
            indent=1,
        )
        fh.write("\n")
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
