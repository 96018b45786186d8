"""Profiler integration: trace capture + device-timeline op timing.

The reference ships one committed nvprof capture and compiles kernels with
-lineinfo (SURVEY.md §5); the JAX-native equivalent is an XLA trace viewable
in TensorBoard/Perfetto (a committed capture lives at
benchmarks/results/trace_dfdx_256/). ``trace`` wraps ``jax.profiler.trace``;
``device_op_time_ms`` goes further and *reads the capture back*
(``utils/xplane.py``) to time an op by the TPU runtime's own device
timeline — the one clock in this environment that the dispatch tunnel
cannot distort (see utils/timing.py for the artifact catalogue; measured
cross-check: device-timeline fold-kernel 0.209 ms vs chain-slope
0.17-0.24 ms across weather, and the device figure sits 2% above the
in-capture elementwise copy floor, exactly where the DMA cost model
puts it).
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile

import jax

from .xplane import device_module_durations_ms

__all__ = ["trace", "device_op_time_ms"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace of the enclosed computation.

    Example:
        with cfd_tpu.utils.trace("/tmp/cfd_trace"):
            df = jax.block_until_ready(cfd_tpu.dfdx(f, dx))
    """
    with jax.profiler.trace(logdir):
        yield


def _bench_scale(x):
    # distinctly named so captures can separate it from the op under test;
    # also serves as an in-capture copy floor (one read + one write of x)
    return x * 1.000001


_scale_jit = jax.jit(_bench_scale)


def device_op_time_ms(fn, x, *, iters: int = 10, keep_logdir: str | None = None):
    """Time ``fn(x)`` by profiler device timeline: ``(op_ms, floor_ms, n)``.

    Dispatches ``out = fn(scale(out))`` ``iters`` times inside one profiler
    capture (the scale keeps every dispatch's arguments distinct, defeating
    the relay's (executable, args) memoization, and its own device duration
    is returned as ``floor_ms`` — the measured elementwise read+write floor
    in the *same* weather window). Returns the minimum device duration of
    the ``fn`` module over the capture, the scale-module minimum, and the
    number of ``fn`` dispatches observed. ``(inf, inf, 0)`` if the runtime
    produced no device timeline (e.g. CPU backend) — callers fall back to
    chain-slope timing.

    Unlike chain slopes, a device duration cannot be collapsed, memoized,
    or acknowledged-at-enqueue: it is written by the runtime per executed
    op. Weather (co-tenant HBM traffic) still inflates it, so samples
    should be spread across a wall-clock window and min-reduced, same as
    chain sampling.
    """
    step = jax.jit(fn)
    out = jax.block_until_ready(step(_scale_jit(x)))  # compile + warm both
    logdir = keep_logdir or tempfile.mkdtemp(prefix="cfd_devtime_")
    try:
        with jax.profiler.trace(logdir):
            for _ in range(iters):
                out = step(_scale_jit(out))
            jax.block_until_ready(out)
        mods = device_module_durations_ms(logdir)
    finally:
        if keep_logdir is None:
            shutil.rmtree(logdir, ignore_errors=True)
    floor = [d for name, d in mods.items() if "_bench_scale" in name]
    rest = {n: d for n, d in mods.items() if "_bench_scale" not in n}
    if not rest:
        return float("inf"), float("inf"), 0
    # the op under test is the dominant non-scale module in the capture
    durs = max(rest.values(), key=sum)
    floor_ms = min(floor[0]) if floor else float("inf")
    return min(durs), floor_ms, len(durs)
