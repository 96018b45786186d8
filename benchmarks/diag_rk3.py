"""RK3 model steps: fused vs generic, by device timeline.

Round-3 profile of the generic step (docs/RESULTS.md) put 42% of the
6.19 ms step in XLA elementwise fusions — the advection dot and RK
axpys. The fused substep path (ops/fused_step.py) moves all of that
into kernel epilogues: four dispatches per substep, zero elementwise
HBM passes. This script measures both paths plus the four fused
dispatches individually, gates correctness first, and commits the
numbers to benchmarks/results/rk3_v5e.json (the committed artifact
behind docs/RESULTS.md's step figures).

Run on the real TPU:  python benchmarks/diag_rk3.py [n=256]
"""

import dataclasses
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

import cfd_tpu
from cfd_tpu.models import AdvectionDiffusion, Derivs, taylor_green
from cfd_tpu.schemes import SCHEME4_PERIODIC, get_scheme
from cfd_tpu.utils.profiling import device_op_time_ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = 2 * math.pi
    dx = L / n
    c = jnp.arange(n, dtype=jnp.float32) * dx
    u = taylor_green(c, c, c)
    f0 = jnp.sin(c)[None, None, :] * jnp.ones((n, n, 1), jnp.float32)
    dt = 1e-3

    derivs = Derivs.single_device(
        dx, SCHEME4_PERIODIC, method="auto", second_derivative=True
    )
    assert derivs.fused_substep is not None
    fused_model = AdvectionDiffusion(derivs, nu=1e-3)
    generic_model = AdvectionDiffusion(
        dataclasses.replace(derivs, fused_substep=None), nu=1e-3
    )

    # correctness gate before timing anything
    ff = jax.jit(lambda f: fused_model.step(f, u, dt))(f0)
    fg = jax.jit(lambda f: generic_model.step(f, u, dt))(f0)
    inc = float(jnp.max(jnp.abs(fg - f0)))
    err = float(jnp.max(jnp.abs(ff - fg))) / inc
    print(f"fused vs generic step rel(increment) err: {err:.2e}")
    assert err < 1e-3, err

    pts = n**3
    rows = {}

    def report(name, fn, x, iters=8):
        best = math.inf
        floor_best = math.inf
        for _ in range(3):
            ms, floor_ms, k = device_op_time_ms(fn, x, iters=iters)
            best = min(best, ms)
            floor_best = min(floor_best, floor_ms)
            time.sleep(1.0)
        gpts = pts / (best * 1e-3) / 1e9 if best < math.inf else 0.0
        print(
            f"{name:<28} {best:7.3f} ms device  ({gpts:6.1f} Gpt/s)"
            f"   [copy floor {floor_best:.3f}]"
        )
        rows[name.strip()] = {
            "ms_device": round(best, 4),
            "gpts_per_s": round(gpts, 2),
            "copy_floor_ms": round(floor_best, 4),
        }
        return best

    print(f"\n-- {n}^3 f32, device-timeline minima over 3 captures --")
    t_gen = report("generic step", lambda f: generic_model.step(f, u, dt), f0)
    t_fus = report("fused step", lambda f: fused_model.step(f, u, dt), f0)

    # the four fused dispatches, individually
    from cfd_tpu.ops.pallas_lap import lap_rhs
    from cfd_tpu.ops.pallas_leading import leading_derivative, rk3_solve_update
    from cfd_tpu.ops.pallas_pair import advection_pair

    s2 = get_scheme(4, True, derivative=2)
    ux, uy, uz = u
    report("  advection_pair (xy)", lambda f: advection_pair(f, ux, uy, dx, dx, SCHEME4_PERIODIC), f0)
    report("  lap_rhs (stream z)", lambda f: lap_rhs(f, dx, dx, dx, s2), f0)
    from cfd_tpu.ops.pallas_lap import adv_lap_rhs, adv_lap_supported

    if adv_lap_supported(SCHEME4_PERIODIC, s2, n, n, n, jnp.float32):
        report(
            "  adv_lap merged (1 disp)",
            lambda f: adv_lap_rhs(f, ux, uy, dx, dx, dx, SCHEME4_PERIODIC, s2)[1],
            f0,
        )
    report(
        "  leading d1 + mul/acc",
        lambda f: leading_derivative(f, dx, SCHEME4_PERIODIC, mul=uz, acc=f0),
        f0,
    )
    report(
        "  rk3 solve+update",
        lambda f: rk3_solve_update(
            f, f0, f0, f0, s2, a=-5.0 / 9.0, b=15.0 / 16.0, dt=dt, nu=1e-3
        )[1],
        f0,
    )
    print(f"\nspeedup: {t_gen / t_fus:.2f}x  ({t_gen:.2f} -> {t_fus:.2f} ms)")

    # --- Burgers: three fused advection-diffusion substeps per substep -----
    from cfd_tpu.models import Burgers

    bf = Burgers(derivs, nu=1e-2)
    bg = Burgers(dataclasses.replace(derivs, fused_substep=None), nu=1e-2)
    uf = jax.jit(lambda uu: bf.step(uu, dt))(u)
    ug = jax.jit(lambda uu: bg.step(uu, dt))(u)
    inc = max(float(jnp.max(jnp.abs(g - o))) for g, o in zip(ug, u))
    berr = max(float(jnp.max(jnp.abs(a - g))) for a, g in zip(uf, ug)) / inc
    print(f"\nburgers fused vs generic rel(increment) err: {berr:.2e}")
    assert berr < 1e-3, berr

    def bstep(model):
        return lambda ux: model.step((ux, u[1], u[2]), dt)[0]

    report("burgers generic step", bstep(bg), u[0], iters=6)
    report("burgers fused step", bstep(bf), u[0], iters=6)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", "rk3_v5e.json"
    )
    payload = {
        "config": {
            "n": n,
            "dtype": "float32",
            "scheme": "pade4_periodic + pade4_d2_periodic",
            "dt": dt,
            "method": "device timeline minima over 3 captures "
            "(utils.profiling.device_op_time_ms)",
        },
        "gates": {
            "advdiff_fused_vs_generic_rel_increment": err,
            "burgers_fused_vs_generic_rel_increment": berr,
        },
        "rows": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
