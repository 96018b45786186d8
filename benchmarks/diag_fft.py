"""Diagnose the NS projection's FFT bound on the real TPU.

The 'compact' projection (ops/poisson.project) is two scalar FFTs (one
rfftn forward + one irfftn inverse of 256^3 f32) plus ~11 fused-kernel
HBM passes; docs/RESULTS.md measured the FFT pair at ~5.0 ms of the
7.2 ms projection. This script decomposes that cost per axis and probes
alternatives:

  - rfftn/irfftn round trip (the production form)
  - per-axis 1-D passes (rfft last axis, fft -2, fft -3) to find which
    axis pays (the leading-axis FFT needs relayouts on TPU, same class
    as the dfdz relayout tax in docs/RESULTS.md)
  - full c2c fftn round trip (is the real optimization being used?)
  - a matmul DFT over the leading axis (MXU contraction, no relayout)
    combined with XLA rfft2 over the minor axes

Run on the real chip: python benchmarks/diag_fft.py [n]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cfd_tpu.utils.timing import chain_time


def main(n: int = 256):
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (n, n, n), jnp.float32)

    def t(name, fn, x=f):
        ms = chain_time(jax.jit(fn), x) * 1e3
        print(f"{name:44s} {ms:8.3f} ms")
        return ms

    # production round trip
    t("rfftn+irfftn (production pair)", lambda x: jnp.fft.irfftn(
        jnp.fft.rfftn(x, axes=(-3, -2, -1)), s=x.shape, axes=(-3, -2, -1)
    ).astype(x.dtype))

    # forward only / inverse only. Complex chain carries transfer poorly on
    # this runtime, so complex intermediates ride as (2, ...) real packs.
    def pack(c):
        return jnp.stack([jnp.real(c), jnp.imag(c)])

    def unpack(p):
        return p[0] + 1j * p[1]

    fwd = jax.jit(lambda x: pack(jnp.fft.rfftn(x, axes=(-3, -2, -1))))
    fh = fwd(f)
    # same pack() epilogue as the per-axis entries so every forward-path
    # figure carries identical real-ification overhead
    t("rfftn forward only (packed out)", lambda x: pack(
        jnp.fft.rfftn(x, axes=(-3, -2, -1))))
    t("irfftn inverse only (packed c64 in)", lambda p: jnp.fft.irfftn(
        unpack(p), s=(n, n, n), axes=(-3, -2, -1)).astype(jnp.float32), fh)

    # per-axis decomposition of the forward transform
    t("rfft axis=-1 (minor)", lambda x: jnp.abs(
        jnp.fft.rfft(x, axis=-1)).astype(x.dtype))
    t("fft axis=-2 on packed c64", lambda p: pack(
        jnp.fft.fft(unpack(p), axis=-2)), fh)
    t("fft axis=-3 on packed c64 (leading)", lambda p: pack(
        jnp.fft.fft(unpack(p), axis=-3)), fh)

    # c2c everything (is r2c actually helping?)
    t("fftn+ifftn c2c round trip", lambda x: jnp.real(jnp.fft.ifftn(
        jnp.fft.fftn(x.astype(jnp.complex64), axes=(-3, -2, -1)),
        axes=(-3, -2, -1))).astype(x.dtype))

    # matmul DFT over the leading axis on a complex field:
    # X[k,y,x] = sum_z W[k,z] f[z,y,x]; as real contractions.
    Wr = np.cos(-2 * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    Wi = np.sin(-2 * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    Wr_j = jnp.asarray(Wr, jnp.float32)
    Wi_j = jnp.asarray(Wi, jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    def dftz_c(x):
        if x.dtype != jnp.complex64:  # packed-real form: unstack first
            x = unpack(x)
        xr, xi = jnp.real(x), jnp.imag(x)
        rr = jnp.tensordot(Wr_j, xr, axes=([1], [0]), precision=hp)
        ri = jnp.tensordot(Wr_j, xi, axes=([1], [0]), precision=hp)
        ir = jnp.tensordot(Wi_j, xr, axes=([1], [0]), precision=hp)
        ii = jnp.tensordot(Wi_j, xi, axes=([1], [0]), precision=hp)
        return (rr - ii) + 1j * (ri + ir)

    t("matmul DFT axis=-3 on c64 (HIGHEST)", lambda p: pack(dftz_c(p)), fh)

    # hybrid forward: rfft2 over minor axes + matmul DFT over z
    def hybrid_fwd(x):
        h = jnp.fft.rfft2(x, axes=(-2, -1))
        return jnp.abs(dftz_c(h)).astype(x.dtype)

    t("hybrid fwd: rfft2(minor) + matmul DFT z", hybrid_fwd)

    # the projection's actual spectral stage: multiply + round trip.
    # lam bounded away from 0: near-null synthetic modes would amplify BOTH
    # methods' f32 rounding by ~1/lam and swamp the method comparison
    lam = -(1.0 + np.random.rand(n, 1, 1) + np.random.rand(1, n, 1)
            + np.random.rand(1, 1, n // 2 + 1)).astype(np.float32)
    inv = jnp.asarray(1.0 / lam)

    def poisson_pair(x):
        ph = jnp.fft.rfftn(x, axes=(-3, -2, -1)) * inv
        return jnp.fft.irfftn(ph, s=x.shape, axes=(-3, -2, -1)).astype(x.dtype)

    t("poisson spectral stage (pair + diag mult)", poisson_pair)

    # full matmul-DFT Poisson pair: every axis as MXU tensordots against
    # precomputed DFT matrices (r2c on x), HIGHEST precision
    nf = n // 2 + 1
    th = 2 * np.pi * np.outer(np.arange(nf), np.arange(n)) / n
    Cx = jnp.asarray(np.cos(-th), jnp.float32)  # (nf, n)
    Sx = jnp.asarray(np.sin(-th), jnp.float32)
    # c2c inverse along x needs the full spectrum implied by hermitian
    # symmetry; build the real-output inverse directly: f = Re(conj-sym
    # expansion) = Cx2 @ re - Sx2 @ im with doubled interior columns
    w2 = np.full(nf, 2.0)
    w2[0] = 1.0
    if n % 2 == 0:
        w2[-1] = 1.0
    thi = 2 * np.pi * np.outer(np.arange(n), np.arange(nf)) / n
    Cxi = jnp.asarray(np.cos(thi) * w2 / n, jnp.float32)  # (n, nf)
    Sxi = jnp.asarray(np.sin(thi) * w2 / n, jnp.float32)

    def dft_axis(re, im, C, S, axis):
        ax = axis % re.ndim
        rr = jnp.tensordot(C, re, axes=([1], [ax]), precision=hp)
        ri = jnp.tensordot(C, im, axes=([1], [ax]), precision=hp) if im is not None else None
        ir = jnp.tensordot(S, re, axes=([1], [ax]), precision=hp)
        ii = jnp.tensordot(S, im, axes=([1], [ax]), precision=hp) if im is not None else None
        re2 = rr if ii is None else rr - ii
        im2 = ir if ri is None else ir + ri
        # tensordot puts the transformed axis first; move it back
        re2 = jnp.moveaxis(re2, 0, ax)
        im2 = jnp.moveaxis(im2, 0, ax)
        return re2, im2

    Wc = jnp.asarray(Wr / 1.0, jnp.float32)
    Ws = jnp.asarray(Wi / 1.0, jnp.float32)
    Wci = jnp.asarray(Wr.T / n, jnp.float32)
    Wsi = jnp.asarray(-Wi.T / n, jnp.float32)

    def poisson_pair_matmul(x):
        re, im = dft_axis(x, None, Cx, Sx, -1)  # r2c along x
        re, im = dft_axis(re, im, Wc, Ws, -2)
        re, im = dft_axis(re, im, Wc, Ws, -3)
        re, im = re * inv, im * inv
        re, im = dft_axis(re, im, Wci, Wsi, -3)
        re, im = dft_axis(re, im, Wci, Wsi, -2)
        # c2r along x: f = Cxi @ re - Sxi @ im (hermitian fold in Cxi/Sxi)
        ax = re.ndim - 1
        out = jnp.tensordot(Cxi, re, axes=([1], [ax]), precision=hp) - \
            jnp.tensordot(Sxi, im, axes=([1], [ax]), precision=hp)
        return jnp.moveaxis(out, 0, ax).astype(x.dtype)

    # accuracy gate before timing (full size: the DFT matrices are (n, n))
    probe = f
    werr = float(jnp.max(jnp.abs(poisson_pair_matmul(probe) - poisson_pair(probe))))
    wref = float(jnp.max(jnp.abs(poisson_pair(probe))))
    print(f"matmul-poisson vs fft-poisson max err {werr:.3e} (ref max {wref:.3e})")
    t("poisson MATMUL-DFT stage (all axes MXU)", poisson_pair_matmul)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
