"""Utilities: timing, configuration, coordinates."""

from .timing import chain_time, phase_timer

__all__ = ["chain_time", "phase_timer"]
