"""Reliable on-device timing for environments with async/tunnelled dispatch.

The reference times phases with MPI barriers + ``cuda.Context.synchronize``
around each call (/root/reference/code/cuda/timer.py:4-16). The JAX analogue
would be ``block_until_ready`` — but on remote-tunnelled TPU runtimes
dispatch can acknowledge before execution completes and each dispatch carries
a large fixed round-trip latency, which makes naive per-call timing
meaningless (observed: a 137-GFLOP matmul "completing" in 30 us, while any
single dispatch costs ~25 ms).

``chain_time`` removes both failure modes: it times a *data-dependent chain*
of k applications of the op inside one jitted computation for two values of
k and reports the slope — fixed dispatch overhead cancels, and the chain's
data dependence forces real sequential execution on the device.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "chain_time",
    "ChainSampler",
    "phase_timer",
    "spec_roofline_pts_per_s",
    "HBM_BW_BYTES_PER_S",
]

# Aggregate HBM bandwidth spec of the benched chip (TPU v5e / "TPU v5 lite":
# 819 GB/s total — reads and writes SHARE this budget; there is no separate
# per-direction figure, so "duplex" 2x ceilings are unphysical). Used by the
# benchmark harnesses' plausibility gates: a measured streaming throughput
# meaningfully above this is a timing artifact (collapsed chain / relay
# memoization), not a kernel.
HBM_BW_BYTES_PER_S = 0.82e12


def spec_roofline_pts_per_s(itemsize: int = 4) -> float:
    """Spec-bandwidth ceiling (points/s) for a one-read + one-write
    streaming op whose elements are ``itemsize`` bytes (f32: 4, bf16: 2).

    Replaces the round-2 "duplex" 2x gate: the chain-slope copy measurement
    that motivated it (134 MB round trip in 0.12-0.158 ms, implying
    1.7-2.2 TB/s on an 819 GB/s part) is itself physically impossible and
    therefore an instance of the artifact class the gate exists to catch.
    """
    return HBM_BW_BYTES_PER_S / (2 * itemsize)


def _build_chain(step: Callable, k: int):
    """jit(x -> step applied k times), with a data dependence between steps."""

    @jax.jit
    def run(x):
        def body(_, y):
            out = step(y)
            if jax.tree.structure(out) == jax.tree.structure(y) and all(
                o.shape == i.shape
                for o, i in zip(jax.tree.leaves(out), jax.tree.leaves(y))
            ):
                return out
            # force the next iteration to depend on this one even if step's
            # output shape differs from its input. The folded-in summary
            # must not be provably zero (XLA simplifies 0*x away and would
            # dead-code-eliminate the step): scale by a tiny constant that
            # underflows in the addition but survives simplification.
            s = jnp.mean(jax.tree.leaves(out)[0])
            return jax.tree.map(
                lambda a: a
                * (1 + jnp.asarray(1e-38, a.dtype) * s.astype(a.dtype)),
                y,
            )

        return jax.lax.fori_loop(0, k, body, x)

    return run


def chain_time(
    step: Callable,
    x: jax.Array,
    *,
    k_small: int = 2,
    k_big: int = 34,
    repeats: int = 3,
) -> float:
    """Seconds per application of ``step`` measured by chain-slope timing.

    ``step`` must map an array — or a pytree of arrays, e.g. a vector field
    as a (ux, uy, uz) tuple — to an output of the same structure and leaf
    shapes/dtypes (so the chain is a genuine sequential dependence; a
    mismatched output is folded into the carry instead). Returns the
    minimum slope over ``repeats`` trials.
    """
    import numpy as np

    small = _build_chain(step, k_small)
    big = _build_chain(step, k_big)

    # Distinct inputs per timed run: tunnelled runtimes have been observed to
    # memoize (executable, argument) pairs, so re-running on identical args
    # measures the cache, not the device. The perturbed variants are
    # materialized before timing starts.
    variants = [
        jax.block_until_ready(
            jax.tree.map(lambda a: a * (1.0 + 1e-6 * i), x)
        )
        for i in range(repeats + 1)
    ]

    def sync_run(fn, xi):
        # a host readback of a value derived from the result is the only
        # sync that provably waits for execution on tunnelled runtimes
        # (block_until_ready has been observed to return at enqueue)
        r = jax.tree.leaves(fn(xi))[0]
        corner = r[(slice(0, 1),) * r.ndim] if r.ndim else r
        return float(np.asarray(jnp.sum(corner)))

    # compile + warm both on a variant never used for timing
    sync_run(small, variants[-1])
    sync_run(big, variants[-1])

    def best_of(fn):
        best = float("inf")
        for i in range(repeats):
            t0 = time.perf_counter()
            sync_run(fn, variants[i])
            best = min(best, time.perf_counter() - t0)
        return best

    slope = (best_of(big) - best_of(small)) / (k_big - k_small)

    # Adaptive rescale: the tunnel's dispatch round trip jitters by several
    # ms run-to-run, so a chain delta of only a few ms measures noise.
    # Lengthen the chain until the per-step signal is ~60 ms total
    # (observed: a 0.17 ms kernel on a 16 ms chain delta read anywhere from
    # 0.06 to 0.26 ms/step; on a 60+ ms delta it is stable to a few
    # percent). Iterate: a single rescale from a noisy first estimate can
    # land on a chain that is still inside the noise floor — or even on a
    # negative delta — so keep growing the chain until the delta clears the
    # floor or the cap is hit.
    NOISE_S = 25e-3
    TARGET_S = 60e-3
    K_CAP = 20000
    k_cur = k_big
    for _ in range(4):
        if slope * (k_cur - k_small) >= NOISE_S or k_cur >= K_CAP:
            break
        if slope > 0:
            k_new = min(max(int(TARGET_S / slope), 2 * k_cur), K_CAP)
        else:
            k_new = min(8 * k_cur, K_CAP)
        big2 = _build_chain(step, k_new)
        sync_run(big2, variants[-1])
        slope = (best_of(big2) - best_of(small)) / (k_new - k_small)
        k_cur = k_new
    return max(slope, 1e-12)


class ChainSampler:
    """Chain-slope timing spread across a caller-controlled wall-clock window.

    ``chain_time`` rebuilds and re-warms its chains on every call, which
    makes sampling the same op repeatedly (to dodge shared-chip contention
    windows that last minutes) pay the jit/warm cost each round. This
    sampler builds and warms the two chains **once**; each ``sample()`` is
    then just four tunnel round trips. The reported ``slope`` is computed
    from the global minima of the small and big chains over all samples —
    both minima come from the quietest observed weather, which is the
    uncontended figure the headline wants.

    Every timed run uses a fresh perturbed input (tunnelled runtimes
    memoize (executable, argument) pairs). The perturbation multiply is
    enqueued inside the timed window for both chains, so its (single
    elementwise pass of) cost cancels in the slope.

    ``floor_s_per_step`` (optional) is a physical lower bound on one
    application (e.g. the HBM roofline time): a chain timing below
    ``k * floor`` is impossible on the hardware and therefore a relay
    artifact (collapsed chain / memoized reply) — such samples are
    discarded *before* they can poison the global minima, instead of
    tripping a fatal plausibility assert downstream. Rejections are
    counted in ``rejected``.
    """

    def __init__(
        self,
        step: Callable,
        x: jax.Array,
        *,
        k_small: int = 8,
        k_big: int = 500,
        floor_s_per_step: float = 0.0,
    ):
        self.k_small, self.k_big = k_small, k_big
        self.floor = floor_s_per_step
        self.rejected = 0
        self._small = _build_chain(step, k_small)
        self._big = _build_chain(step, k_big)
        self._x = x
        self._i = 0
        self.t_small = float("inf")
        self.t_big = float("inf")
        self._timed(self._small)  # compile + warm (discarded)
        self._timed(self._big)

    def _timed(self, fn) -> float:
        import numpy as np

        self._i += 1
        t0 = time.perf_counter()
        xi = self._x * (1.0 + 1e-6 * self._i)
        r = fn(xi)
        corner = r[(slice(0, 1),) * r.ndim] if r.ndim else r
        float(np.asarray(jnp.sum(corner)))  # host readback = real sync
        return time.perf_counter() - t0

    def sample(self) -> None:
        """One timing of each chain; keeps the per-chain global minimum.
        Timings below the physical floor are artifacts and are dropped."""
        for fn, k, attr in (
            (self._small, self.k_small, "t_small"),
            (self._big, self.k_big, "t_big"),
        ):
            t = self._timed(fn)
            if t < k * self.floor:
                self.rejected += 1
            else:
                setattr(self, attr, min(getattr(self, attr), t))

    @property
    def slope(self) -> float:
        """Best-weather seconds per application of ``step``."""
        return max((self.t_big - self.t_small) / (self.k_big - self.k_small), 1e-12)


class phase_timer:
    """Named phase timer (host wall clock + block_until_ready), rank-0 print.

    The lightweight analogue of the reference's ``@timeit`` phase decorator;
    accurate on locally attached devices, indicative only through dispatch
    tunnels (use chain_time for benchmark numbers).
    """

    def __init__(self, name: str, *, verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.elapsed = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose and jax.process_index() == 0:
            print(f"[cfd_tpu] {self.name}: {self.elapsed * 1e3:.3f} ms")
        return False
