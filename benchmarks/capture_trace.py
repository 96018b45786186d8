"""Capture a committed XLA profiler trace of the 256^3 dfdx lane kernel.

The reference commits one nvprof capture of its single-GPU CR benchmark
(/root/reference/perf-test/single-GPU/PyCUDA/profile.nvprof, SURVEY.md §5);
this is the TPU analogue: a Perfetto/TensorBoard trace of the fold- and
roll-form lane kernels (ops/pallas_lane.py) back to back at the headline
256^3 f32 configuration, captured through ``cfd_tpu.utils.trace``.

Writes the logdir to benchmarks/results/trace_dfdx_256/ and prints the
trace files found. The committed artifact substantiates the lane kernel
docstring's DMA-hiding cost model with device timelines rather than
chain-slope inference alone.

Run on the real TPU:  python benchmarks/capture_trace.py
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cfd_tpu
from cfd_tpu.schemes import SCHEME4
from cfd_tpu.utils import trace


def main():
    n = 256
    dx = 2 * math.pi / n
    x = np.arange(n) * dx
    f = jnp.asarray(
        (np.sin(x)[None, None, :] * np.ones((n, n, 1))).astype(np.float32)
    )

    from cfd_tpu.ops.pallas_lane import lane_derivative

    fold = jax.jit(lambda g: lane_derivative(g, dx, SCHEME4, fold=True))
    roll = jax.jit(lambda g: lane_derivative(g, dx, SCHEME4, fold=False))

    # warm outside the trace so the capture shows steady-state dispatches
    jax.block_until_ready([fold(f), roll(f)])

    logdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", "trace_dfdx_256"
    )
    with trace(logdir):
        out = f
        for _ in range(8):
            out = fold(out * 1.000001)
        for _ in range(8):
            out = roll(out * 1.000001)
        jax.block_until_ready(out)

    found = []
    for root, _dirs, files in os.walk(logdir):
        for name in files:
            p = os.path.join(root, name)
            found.append((os.path.getsize(p), p))
    for size, p in sorted(found):
        print(f"{size:>12}  {os.path.relpath(p, logdir)}")
    if not found:
        print("no trace files produced (profiler unsupported on this runtime?)")


if __name__ == "__main__":
    main()
