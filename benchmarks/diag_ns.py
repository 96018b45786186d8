"""Navier-Stokes step: the projection cost center, by device timeline.

The round-3 verdict flagged the NS step's 29.9 ms at 256^3 as unattacked:
3 stages of (2.9 ms fused momentum + 7.2 ms projection), the projection
bounded by XLA's one fwd+inv rfft pair measured at 5.0 ms alone. Round 4
replaces the spectral round trip with dense DFT matmuls on the MXU
(ops/poisson._rfft3_mm/_irfft3_mm, HIGHEST precision, f64-built tables)
— benchmarks/diag_fft.py measured the Poisson round trip at 3.42 ms
matmul-DFT vs 4.93 ms FFT (31% faster). This script gates the NS step's
correctness (fused vs generic, divergence annihilation, matmul-DFT vs
FFT Poisson), times the step and its pieces by device timeline, and
commits the numbers to benchmarks/results/ns_v5e.json.

Run on the real TPU:  python benchmarks/diag_ns.py [n=256]
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

from cfd_tpu.models import NavierStokes, taylor_green
from cfd_tpu.ops.poisson import _solve_poisson, solve_poisson
from cfd_tpu.schemes import SCHEME4_PERIODIC
from cfd_tpu.utils.profiling import device_op_time_ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = 2 * math.pi
    dx = L / n
    c = jnp.arange(n, dtype=jnp.float32) * dx
    u = taylor_green(c, c, c)
    dt = 1e-3
    sch = SCHEME4_PERIODIC

    ns = NavierStokes.single_device(dx, sch, nu=1e-3)
    pts = n**3
    gates = {}

    # -- correctness gates before timing anything ---------------------------
    u1 = jax.jit(lambda uu: ns.step(uu, dt))(u)
    speed = float(jnp.max(jnp.sqrt(sum(ci * ci for ci in u1))))
    div = float(jnp.max(jnp.abs(ns.divergence(u1)))) / speed
    print(f"post-step |div u|/|u| (compact, projected): {div:.2e}")
    gates["post_step_rel_divergence"] = div
    assert div < 1e-4, div

    # matmul-DFT Poisson vs a HOST f64 FFT reference on a random rhs.
    # (The TPU's own f32 jnp.fft is NOT a usable reference: at 256^3 it
    # mangles Nyquist-plane modes ~28% — measured below and recorded as a
    # gate value — which is itself a reason solve_poisson routes TPU f32
    # through the MXU tensordot transforms.)
    rng = np.random.default_rng(0)
    rhs_np = rng.standard_normal((n, n, n))
    rhs_np -= rhs_np.mean()
    rhs = jnp.asarray(rhs_np, jnp.float32)
    rdt = jnp.float32
    from cfd_tpu.ops.poisson import laplacian_eigenvalues

    sch_p = sch
    lam = laplacian_eigenvalues(sch_p, rhs.shape, (dx, dx, dx))
    inv = np.zeros_like(lam)
    inv[lam != 0.0] = 1.0 / lam[lam != 0.0]
    p_ref = np.fft.irfftn(
        np.fft.rfftn(rhs_np, axes=(-3, -2, -1)) * inv,
        s=rhs_np.shape,
        axes=(-3, -2, -1),
    )
    scale = float(np.max(np.abs(p_ref)))

    p_auto = np.asarray(solve_poisson(rhs, dx, sch))  # matmul-DFT on TPU
    perr = float(np.max(np.abs(p_auto - p_ref))) / scale
    print(f"matmul-DFT poisson vs host f64 FFT rel err: {perr:.2e}")
    gates["matmul_dft_poisson_vs_f64_rel"] = perr
    assert perr < 1e-5, perr

    @jax.jit
    def poisson_fft(r):
        ph = jnp.fft.rfftn(r, axes=(-3, -2, -1)) * jnp.asarray(inv, rdt)
        return jnp.fft.irfftn(
            ph.astype(jnp.complex64), s=r.shape, axes=(-3, -2, -1)
        ).astype(r.dtype)

    p_fft = np.asarray(poisson_fft(rhs))
    ferr = float(np.max(np.abs(p_fft - p_ref))) / scale
    print(f"TPU f32 FFT poisson vs host f64 FFT rel err: {ferr:.2e}")
    gates["tpu_f32_fft_poisson_vs_f64_rel"] = ferr

    rows = {}

    def report(name, fn, x, iters=6):
        best = math.inf
        floor_best = math.inf
        for _ in range(3):
            ms, floor_ms, k = device_op_time_ms(fn, x, iters=iters)
            best = min(best, ms)
            floor_best = min(floor_best, floor_ms)
            time.sleep(1.0)
        gpts = pts / (best * 1e-3) / 1e9 if best < math.inf else 0.0
        print(
            f"{name:<30} {best:7.3f} ms device  ({gpts:6.1f} Gpt/s)"
            f"   [copy floor {floor_best:.3f}]"
        )
        rows[name.strip()] = {
            "ms_device": round(best, 4),
            "gpts_per_s": round(gpts, 2),
            "copy_floor_ms": round(floor_best, 4),
        }
        return best

    print(f"\n-- {n}^3 f32, device-timeline minima over 3 captures --")
    # full step: array-in/array-out wrapper (the helper feeds out back in)
    uy0, uz0 = u[1], u[2]
    t_step = report(
        "NS step (3 stages)", lambda ux: ns.step((ux, uy0, uz0), dt)[0], u[0],
        iters=4,
    )
    report("  projection (1 of 3)", lambda ux: ns.project((ux, uy0, uz0))[0], u[0])
    sp3 = (float(dx),) * 3
    report(
        "  poisson matmul-DFT",
        lambda r: _solve_poisson(r, sch_p, sp3, 0.0),
        rhs,
    )
    report("  poisson fft (f32 ref)", poisson_fft, rhs)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", "ns_v5e.json"
    )
    payload = {
        "config": {
            "n": n,
            "dtype": "float32",
            "scheme": "pade4_periodic (+ pade4_d2 for diffusion)",
            "nu": 1e-3,
            "dt": dt,
            "method": "device timeline minima over 3 captures "
            "(utils.profiling.device_op_time_ms)",
        },
        "gates": gates,
        "rows": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(f"\nwrote {out_path}")
    print(f"\nNS step: {t_step:.2f} ms (round-3 baseline 29.9 ms)")


if __name__ == "__main__":
    main()
