"""filter_x: close the last sub-65-Gpt/s 256^3 axis op, or document its floor.

Round 3 left filter_x on the dense matmul at 0.282 ms (59.5 Gpt/s): the
lane fold LOSES for filters on the minor axis (0.334 ms — the width-3
filter stencil triples the exposed per-block edge-lane VPU FMAs), and the
matmul runs at HIGHEST precision (six bf16 MXU passes), which makes it
MXU-bound rather than HBM-bound at n=256: 256 MACs/point at ~1/6 of bf16
peak is ~0.26 ms of pure MXU time against a ~0.15 ms copy floor.

The lever this script measures: filters are derivative_order=0 — output
magnitude equals input magnitude, NO O(1/dx) rounding amplification (the
reason derivatives need HIGHEST) — so the dense operator can run at
Precision.HIGH (three passes, ~0.13 ms of MXU) and stay at f32-level
accuracy. Gates (asserted) each candidate against the host scipy-banded
f64 oracle first, then times by device timeline:

  - matmul HIGHEST (round-3 auto)
  - matmul HIGH (the candidate)
  - lane fold (for the record)

Run on the real TPU:  python benchmarks/diag_filter.py [n=256]
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

from cfd_tpu.ops.derivatives import derivative
from cfd_tpu.schemes import get_filter
from cfd_tpu.utils.profiling import device_op_time_ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sch = get_filter(6, periodic=True)
    rng = np.random.default_rng(0)
    f64 = rng.standard_normal((n, n, n))
    f = jnp.asarray(f64, jnp.float32)
    pts = n**3

    # host f64 oracle (scipy-banded; an on-device reference would run f32
    # on TPU — no native f64 — and gate one f32 path against another)
    from cfd_tpu.oracle import derivative_np

    ref = derivative_np(sch, f64, 1.0, axis=-1)
    scale = float(np.max(np.abs(ref)))

    cands = {
        "matmul HIGHEST (r3 auto)": lambda x: derivative(
            x, 1.0, sch, axis=-1, method="matmul", matmul_precision="highest"
        ),
        "matmul HIGH (candidate)": lambda x: derivative(
            x, 1.0, sch, axis=-1, method="matmul", matmul_precision="high"
        ),
        "lane fold": lambda x: derivative(
            x, 1.0, sch, axis=-1, method="pallas"
        ),
    }

    rows = {}
    print(f"-- filter_x {n}^3 f32, device-timeline minima over 3 captures --")
    for name, fn in cands.items():
        err = float(np.max(np.abs(np.asarray(fn(f)) - ref))) / scale
        assert err < 2e-5, f"{name}: rel err vs host f64 oracle {err:.2e}"
        best = math.inf
        floor_best = math.inf
        for _ in range(3):
            ms, floor_ms, _ = device_op_time_ms(fn, f, iters=8)
            best = min(best, ms)
            floor_best = min(floor_best, floor_ms)
            time.sleep(1.0)
        gpts = pts / (best * 1e-3) / 1e9 if best < math.inf else 0.0
        print(
            f"{name:<26} {best:7.3f} ms ({gpts:6.1f} Gpt/s)"
            f"  rel err {err:.2e}  [floor {floor_best:.3f}]"
        )
        rows[name] = {
            "ms_device": round(best, 4),
            "gpts_per_s": round(gpts, 2),
            "rel_err_vs_f64": err,
            "copy_floor_ms": round(floor_best, 4),
        }

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", "filter_v5e.json"
    )
    with open(out_path, "w") as fh:
        json.dump(
            {
                "config": {
                    "n": n,
                    "dtype": "float32",
                    "scheme": "lele6 filter (derivative_order=0)",
                    "method": "device timeline minima over 3 captures",
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
