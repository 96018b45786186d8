"""Diagnosis harness: where does lane-kernel time go as n grows?

Answers the round-2 verdict's open questions with direct measurements:

1. **Copy floors** — a pure-copy Pallas kernel (same BlockSpec shapes as the
   lane kernel / the dfdz candidates) isolates the DMA cost of each access
   pattern from all compute. Patterns covered:
     - (rows, n) row tiles of a (B, n) array  -> the lane kernel's own DMA
     - (nz, C) column tiles of a (nz, L) array -> the flat sublane-dfdz DMA
       (C*4-byte runs strided by L*4)
     - (nz, by, nx) slabs of a (nz, ny, nx) array -> the 3-D-blocked dfdz
       DMA (by*nx*4-byte contiguous runs, the candidate the verdict asked
       to try)
2. **Lane kernel n-scaling** at fixed volume (256^3 points rearranged as
   longer lines) and at native 512^3: fold(block-demean) vs roll vs the
   ``rows`` block size, so the 512^3 droop decomposes into
   (DMA floor) + (form cost) + (rows effect).

Each case is timed with chain_time; the whole suite is run in two
interleaved passes and the min kept, because single-pass numbers swing
+-30% with chip weather (docs/RESULTS.md). Emits JSON lines; run on the
real TPU:   python benchmarks/diag_lane.py [--quick]
"""

import argparse
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

from cfd_tpu.ops.pallas_lane import lane_derivative
from cfd_tpu.schemes import SCHEME4_PERIODIC
from cfd_tpu.utils.timing import chain_time


def copy2d(x, rows, cols):
    """Pure-copy Pallas kernel over (rows, cols) tiles of a 2-D array."""
    B, n = x.shape

    def kern(f_ref, o_ref):
        o_ref[:] = f_ref[:]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B // rows, n // cols),
        in_specs=[
            pl.BlockSpec((rows, cols), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (rows, cols), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * x.size * x.dtype.itemsize, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
    )(x)


def copy3d(x, bz, by):
    """Pure-copy over (bz, by, nx) slabs of a (nz, ny, nx) array."""
    nz, ny, nx = x.shape

    def kern(f_ref, o_ref):
        o_ref[:] = f_ref[:]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(nz // bz, ny // by),
        in_specs=[
            pl.BlockSpec(
                (bz, by, nx), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (bz, by, nx), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * x.size * x.dtype.itemsize, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
    )(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    n3 = 256
    cases = {}

    # --- copy floors -------------------------------------------------------
    f256 = jnp.asarray(np.random.default_rng(0).random((n3 * n3, n3)), jnp.float32)
    cases["copy (65536,256) rows=1024"] = (
        lambda g: copy2d(g, 1024, 256), f256)
    f512 = jnp.asarray(
        np.random.default_rng(0).random((n3 * n3 // 2, 512)), jnp.float32
    )
    cases["copy (32768,512) rows=512"] = (lambda g: copy2d(g, 512, 512), f512)
    cases["copy (32768,512) rows=1024"] = (lambda g: copy2d(g, 1024, 512), f512)
    # dfdz access patterns: (nz, L) flat with C-lane tiles
    fz = jnp.asarray(np.random.default_rng(0).random((n3, n3 * n3)), jnp.float32)
    for C in (512, 2048, 8192):
        cases[f"copy (256,65536) cols={C}"] = (
            functools.partial(copy2d, rows=n3, cols=C), fz)
    f3 = jnp.asarray(
        np.random.default_rng(0).random((n3, n3, n3)), jnp.float32
    )
    for by in (8, 32):
        cases[f"copy 3d (256,{by},256)"] = (
            functools.partial(copy3d, bz=n3, by=by), f3)
    cases["copy 3d (8,256,256)"] = (functools.partial(copy3d, bz=8, by=n3), f3)

    # --- lane kernel: fixed 256^3 volume, longer lines ---------------------
    d = 1.0
    sch = SCHEME4_PERIODIC
    lane = lambda g, **kw: lane_derivative(g, d, sch, **kw)
    if not args.quick:
        cases["lane fold n=256 B=65536"] = (
            functools.partial(lane, fold=True), f256)
        cases["lane roll n=256 B=65536"] = (
            functools.partial(lane, fold=False), f256)
        cases["lane fold(block) n=512 B=32768"] = (
            functools.partial(lane, fold=True), f512)
        cases["lane roll n=512 B=32768"] = (
            functools.partial(lane, fold=False), f512)
        # --- native 512^3 -------------------------------------------------
        g512 = jnp.asarray(
            np.random.default_rng(1).random((512 * 512, 512)), jnp.float32
        )
        for rows in (256, 512, 1024):
            for form in ("fold", "roll"):
                cases[f"lane {form} 512^3 rows={rows}"] = (
                    functools.partial(lane, fold=form == "fold", rows=rows),
                    g512,
                )

    results = {k: [] for k in cases}
    for p in range(args.passes):
        for name, (step, x) in cases.items():
            try:
                t = chain_time(step, x, k_small=4, k_big=64, repeats=3)
            except Exception as e:
                print(json.dumps({"case": name, "error": str(e)[:200]}), flush=True)
                results[name].append(None)
                continue
            npts = x.size
            results[name].append(t)
            print(
                json.dumps(
                    {
                        "case": name,
                        "pass": p,
                        "ms": round(t * 1e3, 4),
                        "gpts_per_s": round(npts / t / 1e9, 2),
                    }
                ),
                flush=True,
            )

    print("\n=== best-of ===")
    rows_out = []
    for name, ts in results.items():
        ts = [t for t in ts if t]
        if not ts:
            continue
        t = min(ts)
        npts = cases[name][1].size
        row = {
            "case": name,
            "ms": round(t * 1e3, 4),
            "gpts_per_s": round(npts / t / 1e9, 2),
        }
        rows_out.append(row)
        print(json.dumps(row))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(
                {"device": str(jax.devices()[0]), "results": rows_out}, fh, indent=1
            )


if __name__ == "__main__":
    main()
