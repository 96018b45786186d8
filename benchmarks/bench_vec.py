"""Measure fused divergence/curl (ops/pallas_vec.py) vs the unfused route.

Single real TPU chip, 256^3 f32, periodic 4th-order scheme. Accuracy-gated
against the dense matmul backend on-device before any timing. Chain-slope
timing only (utils/timing.chain_time) — see CLAUDE.md for why wall-clock
through the tunnel is meaningless.

divergence chains  f -> div((f, f, f))  (3 HBM reads of the same buffer —
the DMA engine streams each input separately, so traffic matches distinct
fields). curl chains the natural (ux,uy,uz) -> (wx,wy,wz) pytree.

Usage: python benchmarks/bench_vec.py [n]
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from cfd_tpu.ops import derivatives as D
from cfd_tpu.ops.pallas_vec import curl_fused, divergence_fused
from cfd_tpu.schemes import get_scheme
from cfd_tpu.utils.timing import chain_time, spec_roofline_pts_per_s

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
scheme = get_scheme(4, True, 1)
sp = (0.04, 0.03, 0.02)
dz, dy, dx = sp

rng = np.random.default_rng(7)
u = tuple(
    jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32) for _ in range(3)
)
npts = n**3

# ---- accuracy gates (device, vs dense matmul backend) ---------------------
ref_div = D.divergence(u, sp, scheme, method="matmul")
got_div = divergence_fused(u, dz, dy, dx, scheme)
rel = float(jnp.max(jnp.abs(got_div - ref_div)) / jnp.max(jnp.abs(ref_div)))
print(f"div fused vs matmul rel err: {rel:.2e}")
assert rel < 2e-4, rel

ref_curl = D.curl(u, sp, scheme, method="matmul")
got_curl = curl_fused(u, dz, dy, dx, scheme)
for g, r in zip(got_curl, ref_curl):
    rel = float(jnp.max(jnp.abs(g - r)) / jnp.max(jnp.abs(r)))
    print(f"curl fused vs matmul rel err: {rel:.2e}")
    assert rel < 2e-4, rel

# ---- timing ---------------------------------------------------------------
def row(name, t_s, passes):
    gpts = npts / t_s / 1e9
    bw = passes * npts * 4 / t_s / 1e9
    print(
        json.dumps(
            {
                "op": name,
                "n": n,
                "ms": round(t_s * 1e3, 4),
                "gpts_per_s": round(gpts, 2),
                "hbm_passes": passes,
                "implied_GB_per_s": round(bw, 1),
            }
        )
    )


t = chain_time(lambda f: divergence_fused((f, f, f), dz, dy, dx, scheme), u[0])
row("div_fused", t, 6)

t = chain_time(
    lambda f: D.dfdx(f, dx, scheme)
    + D.dfdy(f, dy, scheme)
    + D.dfdz(f, dz, scheme),
    u[0],
)
row("div_unfused_auto", t, 10)

t = chain_time(lambda v: curl_fused(v, dz, dy, dx, scheme), u)
row("curl_fused", t, 10)


def curl_unfused(v):
    # the pre-round-3 auto route: pair kernel for (duz/dx, duz/dy) + four
    # single-axis autos + elementwise combines
    from cfd_tpu.ops.pallas_pair import gradient_pair

    ux, uy, uz = v
    duz_dx, duz_dy = gradient_pair(uz, dy, dx, scheme)
    return (
        duz_dy - D.dfdz(uy, dz, scheme),
        D.dfdz(ux, dz, scheme) - duz_dx,
        D.dfdx(uy, dx, scheme) - D.dfdy(ux, dy, scheme),
    )


t = chain_time(curl_unfused, u)
row("curl_unfused_auto", t, 19)

print(
    f"# roofline f32: {spec_roofline_pts_per_s(4) / 1e9:.1f} Gpt/s per pass-pair"
)
