"""Per-shard throughput of the distributed shard-local kernel path.

Real multi-chip hardware does not exist in this environment, so this diag
measures the SHARD-LOCAL compute sequence of the round-4 distributed fast
path on one real chip, exactly as it runs inside shard_map on a p-shard
mesh minus the all_gather (which rides ICI on real pods and moves
2/nl of the field):

  phase A: truncated-functional faces (XLA reads 2K rows)
  phase B: the reduced (2, 2p) matmul on the gathered faces (emulated with
           a local (2p, batch) tensor — same FLOPs/bytes)
  phase C: the fused kernel dispatch (halos in, outer update folded in)

Usage: python benchmarks/diag_dist.py [n_local] [p]
Prints per-axis chain-slope times + Gpt/s over the local block.
"""

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
)

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
import jax.numpy as jnp

from cfd_tpu import schemes
from cfd_tpu.ops.pallas_dist import lane_dist_derivative, sublane_dist_derivative
from cfd_tpu.ops.pallas_leading import leading_dist_derivative
from cfd_tpu.parallel.dist_tables import (
    LaneShardTables,
    ShardKernelTables,
    shard_kernel_tables,
    shard_lane_tables,
)
from cfd_tpu.utils.timing import chain_time


def main(nl: int = 256, p: int = 4):
    sch = schemes.SCHEME4_PERIODIC
    n = nl * p
    rng = np.random.default_rng(0)
    r = 1  # mid shard
    pts = nl * 256 * 256

    skt = shard_kernel_tables(sch, n, p)
    ktabs = tuple(
        jnp.asarray(getattr(skt, nm)[r], jnp.float32)
        for nm in ShardKernelTables.KERNEL_FIELDS
    )
    fvz = jnp.asarray(skt.fv[r], jnp.float32)
    slt = shard_lane_tables(sch, n, p)
    ltabs = tuple(
        jnp.asarray(getattr(slt, nm)[r], jnp.float32)
        for nm in LaneShardTables.KERNEL_FIELDS
    )

    w = sch.stencil_width

    def bench(name, fn, f, *fixed):
        # chain over the field argument (output shape/dtype == f's), the
        # halo/ab side inputs stay fixed
        t = chain_time(jax.jit(lambda g: fn(g, *fixed)), f)
        print(
            f"{name:34s} {t * 1e3:7.3f} ms   {pts / t / 1e9:6.1f} Gpt/s",
            flush=True,
        )

    # ---- leading (dfdz) ----
    f = jnp.asarray(rng.standard_normal((nl, 256, 256)), jnp.float32)
    gl = jnp.asarray(rng.standard_normal((w, 256, 256)), jnp.float32)
    ab = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32) * 0.1

    def z_kernel(f, gl, gr, ab):
        return leading_dist_derivative(
            f, gl, gr, ab, 10.0, ktabs, sch,
            nb=skt.nb, rsupport=skt.rsupport,
            has_uh=skt.has_uh, has_lh=skt.has_lh,
        )

    def z_full(f, gl, gr):
        # faces + (emulated) reduced matmul + kernel — the full shard-local
        # sequence; the all_gather payload (2 planes) is excluded
        from cfd_tpu.parallel.compact import _shard_faces_axis

        f0, f1 = _shard_faces_axis(f, 0, gl, gr, fvz, scheme=sch, inv_dx=10.0)
        faces = jnp.stack([-f0, -f1])
        gathered = jnp.tile(faces.reshape(2, -1), (p, 1))  # (2p, B) stand-in
        ab = jnp.dot(
            jnp.asarray(skt.rinv_rows[r], jnp.float32),
            gathered,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(2, 256, 256)
        return z_kernel(f, gl, gr, ab)

    bench("dfdz dist kernel only", z_kernel, f, gl, gl, ab)
    bench("dfdz faces+reduced+kernel", z_full, f, gl, gl)

    # ---- lane (dfdx) ----
    fx = jnp.asarray(rng.standard_normal((256, 256, nl)), jnp.float32)
    hlx = jnp.asarray(rng.standard_normal((256, 256, w)), jnp.float32)
    abx = jnp.asarray(rng.standard_normal((256, 256, 2)), jnp.float32) * 0.1

    def x_kernel(f, hl, hr, ab):
        return lane_dist_derivative(f, hl, hr, ab, 0.1, ltabs, sch, slt)

    def x_full(f, hl, hr):
        from cfd_tpu.parallel.compact import _shard_faces_axis

        f0, f1 = _shard_faces_axis(
            f, -1, hl, hr, jnp.asarray(slt.fv[r], jnp.float32),
            scheme=sch, inv_dx=10.0,
        )
        faces = jnp.stack([-f0, -f1])
        gathered = jnp.tile(faces.reshape(2, -1), (p, 1))
        ab = jnp.dot(
            jnp.asarray(slt.rinv_rows[r], jnp.float32),
            gathered,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(2, 256, 256)
        return x_kernel(f, hl, hr, jnp.moveaxis(ab, 0, -1))

    bench("dfdx dist kernel only", x_kernel, fx, hlx, hlx, abx)
    bench("dfdx faces+reduced+kernel", x_full, fx, hlx, hlx)

    # ---- sublane (dfdy) ----
    fy = jnp.asarray(rng.standard_normal((256, nl, 256)), jnp.float32)
    hly = jnp.asarray(rng.standard_normal((256, w, 256)), jnp.float32)
    aby = jnp.asarray(rng.standard_normal((256, 2, 256)), jnp.float32) * 0.1

    def y_kernel(f, hl, hr, ab):
        return sublane_dist_derivative(
            f, hl, hr, ab, 0.1, ltabs, sch, slt, axis=-2
        )

    bench("dfdy dist kernel only", y_kernel, fy, hly, hly, aby)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
