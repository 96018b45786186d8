"""Driver-hook smoke tests: entry() compiles; dryrun mesh factorization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_entry_eval_shape():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == args[0].shape and out.dtype == args[0].dtype


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
