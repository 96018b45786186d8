"""Utility-layer tests: timing helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from cfd_tpu.utils import chain_time, phase_timer


def test_chain_time_positive_and_plausible():
    x = jnp.ones((64, 64))
    t = chain_time(lambda g: g * 1.000001 + 0.1, x, k_small=2, k_big=34, repeats=2)
    assert t > 0


def test_chain_time_shape_changing_step():
    # steps whose output shape differs are folded back via a scalar summary
    x = jnp.ones((16, 16))
    t = chain_time(lambda g: jnp.sum(g, axis=0), x, k_small=2, k_big=6, repeats=1)
    assert t > 0


def test_phase_timer_records():
    with phase_timer("unit", verbose=False) as t:
        sum(range(1000))
    assert t.elapsed is not None and t.elapsed >= 0
