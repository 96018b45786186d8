"""Utilities: timing, configuration, coordinates."""

from .checkpointing import restore_state, save_state
from .profiling import device_op_time_ms, trace
from .timing import chain_time, phase_timer

__all__ = [
    "chain_time",
    "phase_timer",
    "save_state",
    "restore_state",
    "trace",
    "device_op_time_ms",
]
