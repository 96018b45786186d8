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


def test_chain_time_1d_output():
    # sync readback must not assume >= 2 trailing dims
    x = jnp.ones((128,))
    t = chain_time(lambda g: g * 1.000001, x, k_small=2, k_big=6, repeats=1)
    assert t > 0


def test_checkpoint_npz_roundtrip(tmp_path):
    from cfd_tpu.utils.checkpointing import restore_state, save_state

    state = {"f": jnp.arange(12.0).reshape(3, 4), "t": np.float64(0.25)}
    p = str(tmp_path / "ckpt")
    save_state(p, state, backend="npz")
    out = restore_state(p, backend="npz")
    np.testing.assert_allclose(out["f"], np.asarray(state["f"]))
    np.testing.assert_allclose(out["t"], 0.25)


def test_checkpoint_orbax_sharded_roundtrip(tmp_path):
    # sharded save/restore through orbax, re-sharded on restore
    pytest = __import__("pytest")
    pytest.importorskip("orbax.checkpoint")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cfd_tpu.parallel import make_mesh
    from cfd_tpu.utils.checkpointing import restore_state, save_state

    mesh = make_mesh((2, 2, 2))
    sh = NamedSharding(mesh, P("z", "y", "x"))
    f = jax.device_put(jnp.arange(8.0 * 8 * 8).reshape(8, 8, 8), sh)
    p = str(tmp_path / "orbax_ckpt")
    save_state(p, {"f": f}, backend="orbax")
    out = restore_state(
        p, distribute=lambda a: jax.device_put(jnp.asarray(a), sh), backend="orbax"
    )
    assert out["f"].sharding == sh
    np.testing.assert_allclose(np.asarray(out["f"]), np.asarray(f))
