"""3-component merged momentum head (ops/pallas_lap.adv_lap_rhs3) and the
vector fused substep built on it (ops/fused_step.make_fused_substep_vec).

The merged kernel must be BIT-identical to three scalar adv_lap_rhs calls
(same block bodies, same tables — only the dispatch merges), and the vector
substep must reproduce the scalar fused substep exactly for every RK stage
shape (q=None first stage, carried q, last-stage q elision)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.ops.fused_step import make_fused_substep, make_fused_substep_vec
from cfd_tpu.ops.pallas_lap import (
    adv_lap3_supported,
    adv_lap_rhs,
    adv_lap_rhs3,
)
from cfd_tpu.schemes import SCHEME4_PERIODIC, get_scheme

S1 = SCHEME4_PERIODIC
S2 = get_scheme(4, True, 2)
SHAPE = (8, 256, 256)  # kernel parity (no mega tail)
SHAPE_STEP = (64, 256, 256)  # full substep (leading kernel needs nz >= 64)
D = 0.1


def _u(seed=0, shape=SHAPE):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3)
    )


def test_adv_lap3_matches_three_scalar_calls():
    assert adv_lap3_supported(S1, S2, *SHAPE, jnp.float32)
    u = _u()
    a3, r3 = adv_lap_rhs3(u, D, D, D, S1, S2, interpret=True)
    for i in range(3):
        a1, r1 = adv_lap_rhs(
            u[i], u[0], u[1], D, D, D, S1, S2, interpret=True
        )
        assert float(jnp.max(jnp.abs(a3[i] - a1))) == 0.0
        assert float(jnp.max(jnp.abs(r3[i] - r1))) == 0.0


@pytest.mark.parametrize("stage", [0, 2])
def test_vector_substep_matches_scalar_substeps(stage):
    fsv = make_fused_substep_vec(D, S1, S2, interpret=True)
    fs = make_fused_substep(D, S1, S2, interpret=True)
    u = _u(1, SHAPE_STEP)
    q = None if stage == 0 else _u(2, SHAPE_STEP)
    a = (0.0, -5.0 / 9.0, -153.0 / 128.0)[stage]
    b = (1.0 / 3.0, 15.0 / 16.0, 8.0 / 15.0)[stage]
    last = stage == 2
    out = fsv(u, q, 1e-3, 1e-3, a, b, last=last)
    assert out is not None, "vector substep declined a supported shape"
    qv, uv = out
    for i in range(3):
        qi, ui = fs(
            u[i], u, q[i] if q is not None else None, 1e-3, 1e-3, a, b,
            last=last,
        )
        assert float(jnp.max(jnp.abs(uv[i] - ui))) == 0.0
        if last:
            assert qv is None and qi is None
        else:
            assert float(jnp.max(jnp.abs(qv[i] - qi))) == 0.0
