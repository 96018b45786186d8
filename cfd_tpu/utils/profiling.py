"""Profiler integration.

The reference ships one committed nvprof capture and compiles kernels with
-lineinfo (SURVEY.md §5); the JAX-native equivalent is an XLA trace viewable
in TensorBoard/Perfetto. ``trace`` wraps ``jax.profiler.trace`` as a context
manager that also forces completion of everything launched inside it.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace of the enclosed computation.

    Example:
        with cfd_tpu.utils.trace("/tmp/cfd_trace"):
            df = jax.block_until_ready(cfd_tpu.dfdx(f, dx))
    """
    with jax.profiler.trace(logdir):
        yield
