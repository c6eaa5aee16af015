#!/usr/bin/env python3
"""A/B the slot-pipeline FFT formulations on TPU.

The xplane profile attributes ~10% of device time to the 1536-pt FFT's
transpose chains (20 MHz: nfft = 1536 = 3 * 512, not a power of two — XLA's
TPU FFT handles non-2^k sizes with a transpose-heavy mixed-radix / Bluestein
lowering).  Candidate: compose the 1536 transform from three 512-pt FFTs
(2^k fast path) with trace-time twiddles:

  forward, input decimated in time (x_s[m] = x[3m+s]):
      X[k] = sum_s W_N^{s k} * FFT_512(x_s)[k mod 512]
  inverse, input decimated in frequency (X_u[t] = X[3t+u]):
      x[n] = sum_u W_N^{-n u} * iFFT_512(X_u)[n mod 512]

Both need one (512,3)<->(3,512) minor-dim reshuffle (input side forward,
none on output) — the question is whether that plus the tile+combine beats
XLA's own 1536 lowering.  Chained data dependency through iterations
(relay dedups identical requests).  Shapes mirror bench S=256: (S*14, nfft)
complex64 per direction.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fft3x(x, nfft):
    """Forward FFT of size nfft = 3*m via three m-point FFTs."""
    m = nfft // 3
    xs = x.reshape(*x.shape[:-1], m, 3)
    xs = jnp.moveaxis(xs, -1, -2)                      # (..., 3, m) x_s[m]
    y = jnp.fft.fft(xs, axis=-1)                       # (..., 3, m)
    y3 = jnp.concatenate([y, y, y], axis=-1)           # Y_s[k mod m]
    k = np.arange(nfft)
    s = np.arange(3)[:, None]
    tw = np.exp(-2j * np.pi * (s * k) / nfft).astype(np.complex64)
    return jnp.sum(y3 * jnp.asarray(tw), axis=-2)


def ifft3x(x, nfft):
    """Unnormalised inverse FFT (N * jnp.ifft) of size nfft = 3*m."""
    m = nfft // 3
    xs = x.reshape(*x.shape[:-1], m, 3)
    xs = jnp.moveaxis(xs, -1, -2)                      # (..., 3, m) X_u[t]
    y = jnp.fft.ifft(xs, axis=-1) * np.float32(m)      # unnormalised m-iFFT
    y3 = jnp.concatenate([y, y, y], axis=-1)           # y_u[n mod m]
    n = np.arange(nfft)
    u = np.arange(3)[:, None]
    tw = np.exp(2j * np.pi * (u * n) / nfft).astype(np.complex64)
    return jnp.sum(y3 * jnp.asarray(tw), axis=-2)


@functools.lru_cache(maxsize=None)
def _mmdft_tables(nfft, n1, n2, sign):
    """Twiddle tables for the N1 x N2 Cooley-Tukey two-step as matmuls."""
    i2, k2 = np.meshgrid(np.arange(n2), np.arange(n2), indexing="ij")
    w2 = np.exp(sign * 2j * np.pi * i2 * k2 / n2).astype(np.complex64)
    tw = np.exp(sign * 2j * np.pi
                * np.outer(np.arange(n2), np.arange(n1)) / nfft
                ).astype(np.complex64)
    i1, k1 = np.meshgrid(np.arange(n1), np.arange(n1), indexing="ij")
    w1 = np.exp(sign * 2j * np.pi * i1 * k1 / n1).astype(np.complex64)
    return w2, tw, w1


def mmdft(x, nfft, n1, n2, sign=-1, precision=None, fold_transpose=False):
    """DFT via two MXU matmul stages (Cooley-Tukey N = N1*N2).

    sign=-1 forward, +1 unnormalised inverse.  x[..., n1 + N1*n2] ->
    X[..., N2*k1 + k2].  fold_transpose asks the final einsum to emit the
    (k1, k2) layout directly instead of swapaxes afterwards.
    """
    w2, tw, w1 = _mmdft_tables(nfft, n1, n2, sign)
    a = x.reshape(*x.shape[:-1], n2, n1)
    b = jnp.einsum("...ni,nk->...ki", a, jnp.asarray(w2),
                   precision=precision)          # (..., k2, n1)
    c = b * jnp.asarray(tw)
    if fold_transpose:
        d = jnp.einsum("...kn,nj->...jk", c, jnp.asarray(w1),
                       precision=precision)      # (..., k1, k2) directly
        return d.reshape(*x.shape)
    d = jnp.einsum("...kn,nj->...kj", c, jnp.asarray(w1),
                   precision=precision)          # (..., k2, k1)
    return jnp.swapaxes(d, -1, -2).reshape(*x.shape)


def main():
    nfft = 1536
    b = 256 * 14
    for a in sys.argv:
        if a.startswith("--nfft="):
            nfft = int(a.split("=")[1])
        if a.startswith("--batch="):
            b = int(a.split("=")[1])
    m = nfft // 3
    rng = np.random.default_rng(0)
    xr = rng.normal(size=(b, nfft)).astype(np.float32)
    xi = rng.normal(size=(b, nfft)).astype(np.float32)

    # Correctness first (on whatever backend is active, under jit).
    chk = jax.jit(lambda r, i: (lambda x: (
        jnp.max(jnp.abs(fft3x(x, nfft) - jnp.fft.fft(x, axis=-1))),
        jnp.max(jnp.abs(ifft3x(x, nfft)
                        - jnp.fft.ifft(x, axis=-1) * np.float32(nfft))),
        jnp.max(jnp.abs(jnp.fft.fft(x, axis=-1)))))(r + 1j * i))
    efwd, einv, ref = (float(v) for v in chk(xr[:8], xi[:8]))
    print(f"max|err| fwd={efwd:.3e} inv={einv:.3e} (scale {ref:.1f})",
          flush=True)
    if nfft % 128 == 0:
        chk2 = jax.jit(lambda r, i: (lambda x: (
            jnp.max(jnp.abs(mmdft(x, nfft, 128, nfft // 128, -1,
                                  jax.lax.Precision.HIGHEST)
                            - jnp.fft.fft(x, axis=-1))),
            jnp.max(jnp.abs(mmdft(x, nfft, 128, nfft // 128, -1,
                                  jax.lax.Precision.DEFAULT)
                            - jnp.fft.fft(x, axis=-1)))))(r + 1j * i))
        ehi, elo = (float(v) for v in chk2(xr[:8], xi[:8]))
        print(f"mmdft max|err| hi={ehi:.3e} lo={elo:.3e}", flush=True)

    # Device-resident inputs: re-uploading 2 x 22 MB through the relay per
    # call would otherwise dominate the measurement (~0.9 s/call observed).
    xr = jax.device_put(jnp.asarray(xr))
    xi = jax.device_put(jnp.asarray(xi))

    variants = [
        ("xla_fft", lambda x: jnp.fft.fft(x, axis=-1)),
        ("xla_ifft", lambda x: jnp.fft.ifft(x, axis=-1) * np.float32(nfft)),
        ("fft3x", lambda x: fft3x(x, nfft)),
        ("ifft3x", lambda x: ifft3x(x, nfft)),
        ("xla_fft_m", lambda x: jnp.fft.fft(
            x.reshape(b * 3, m), axis=-1).reshape(b, nfft)),
        ("xla_fft_4096", lambda x: jnp.fft.fft(x, n=4096, axis=-1)[:, :nfft]),
        # fwd measured 1.6x slower than inv at 1536 — if real, route the
        # forward transform through the inverse by conjugation (exact):
        ("fft_via_ifft", lambda x: jnp.conj(
            jnp.fft.ifft(jnp.conj(x), axis=-1)) * np.float32(nfft)),
        ("ifft_via_fft", lambda x: jnp.conj(
            jnp.fft.fft(jnp.conj(x), axis=-1))),
        # MXU matmul-DFT two-step (the last untested FFT idea from
        # NOTES_ROUND1): N = N1*N2, a (N2,N2) and an (N1,N1) complex matmul
        # with a twiddle in between.  HIGHEST = true f32 (6 bf16 passes),
        # DEFAULT = single-pass bf16 (fast; ~40 dB accurate — usable if the
        # pipeline tolerates it).
        ("mmdft128x12_hi", lambda x: mmdft(
            x, nfft, 128, nfft // 128, -1, jax.lax.Precision.HIGHEST)),
        ("mmdft128x12_lo", lambda x: mmdft(
            x, nfft, 128, nfft // 128, -1, jax.lax.Precision.DEFAULT)),
        ("mmdft512x3_hi", lambda x: mmdft(
            x, nfft, 512, nfft // 512, -1, jax.lax.Precision.HIGHEST)),
        ("mmdft128x12_md", lambda x: mmdft(
            x, nfft, 128, nfft // 128, -1, jax.lax.Precision.HIGH)),
        ("immdft128x12_lo", lambda x: mmdft(
            x, nfft, 128, nfft // 128, +1, jax.lax.Precision.DEFAULT)),
        ("mmdft12x128_hi", lambda x: mmdft(
            x, nfft, nfft // 128, 128, -1, jax.lax.Precision.HIGHEST)),
        ("immdft128x12_hi", lambda x: mmdft(
            x, nfft, 128, nfft // 128, +1, jax.lax.Precision.HIGHEST)),
        ("mmdftFT_lo", lambda x: mmdft(
            x, nfft, 128, nfft // 128, -1, jax.lax.Precision.DEFAULT,
            fold_transpose=True)),
        ("immdftFT_lo", lambda x: mmdft(
            x, nfft, 128, nfft // 128, +1, jax.lax.Precision.DEFAULT,
            fold_transpose=True)),
    ]
    only = [a.split("=")[1] for a in sys.argv if a.startswith("--only=")]
    if only:
        keep = only[0].split(",")
        variants = [v for v in variants if any(k in v[0] for k in keep)]
    # Per-call relay overhead (~2 ms) swamps a single application, so each
    # call chains K applications in a fori_loop and the per-application cost
    # is the MARGINAL time between K and 2K.
    norm = np.float32(1.0 / np.sqrt(nfft))
    for name, fn in variants:
        def rep(r, i, eps, k, _fn=fn):
            z0 = (r + eps) + 1j * i
            z = jax.lax.fori_loop(0, k, lambda _, z: _fn(z) * norm, z0)
            return jnp.sum(jnp.real(z[0, :4])) * jnp.float32(1e-30)

        times = {}
        for k in (8, 16):
            stepj = jax.jit(functools.partial(rep, k=k))
            t0 = time.perf_counter()
            eps = stepj(xr, xi, jnp.float32(0.0))
            eps.block_until_ready()
            compile_s = time.perf_counter() - t0
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                eps = stepj(xr, xi, eps)
            eps.block_until_ready()
            times[k] = (time.perf_counter() - t0) / iters
        dt = (times[16] - times[8]) / 8
        print(f"{name:14s}: {dt*1e3:7.3f} ms marginal ({b} x {nfft}, "
              f"{b*nfft/dt/1e6:7.0f} Msamp/s) compile={compile_s:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
