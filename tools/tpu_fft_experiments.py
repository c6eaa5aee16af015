#!/usr/bin/env python3
"""FFT-vs-matmul-DFT and LDPC decode-chunking experiments on TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder
from srsran_edgeric_5g_tpu.ops.ldpc.graph import get_graph


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    S, nsym = 16, 14
    for nfft in (1024, 1536, 2048):
        x = jnp.asarray((rng.normal(size=(S, nsym, nfft)) +
                         1j * rng.normal(size=(S, nsym, nfft))).astype(np.complex64))
        f = jax.jit(lambda v: jnp.fft.fft(v, axis=-1))
        print(f"fft  n={nfft}: {timeit(f, x)*1e3:7.3f} ms", flush=True)

    # slice+stack+fft from a (S, 23040) stream like demodulate_slot does
    from srsran_edgeric_5g_tpu.ran.numerology import slot_timing
    t = slot_timing(nof_prb=106, nfft=1536, mu=0)
    stream = jnp.asarray((rng.normal(size=(S, t.cp.total)) +
                          1j * rng.normal(size=(S, t.cp.total))).astype(np.complex64))

    def slice_fft(v):
        segs = [v[..., s0:s0 + 1536] for s0 in t.cp.data_starts]
        return jnp.fft.fft(jnp.stack(segs, axis=-2), axis=-1)

    print(f"slice+stack+fft from stream: {timeit(jax.jit(slice_fft), stream)*1e3:7.3f} ms", flush=True)

    from srsran_edgeric_5g_tpu.ops import ofdm as ofdm_mod
    f_demod = jax.jit(lambda v: ofdm_mod.demodulate_slot(v, t, scale=1.0))
    print(f"full demodulate_slot:        {timeit(f_demod, stream)*1e3:7.3f} ms", flush=True)
    f_mod = jax.jit(lambda g: ofdm_mod.modulate_slot(g, t, scale=1.0/1536))
    gtest = jnp.asarray((rng.normal(size=(S, 14, t.nof_subc)) +
                         1j * rng.normal(size=(S, 14, t.nof_subc))).astype(np.complex64))
    print(f"full modulate_slot:          {timeit(f_mod, gtest)*1e3:7.3f} ms", flush=True)

    # matmul DFT: (S*nsym, 1536) x (1536, 624) via split real/imag f32.
    nfft, nsubc = 1536, 624
    k = np.arange(nfft)
    # only the used bins (negative half at top)
    bins = np.concatenate([np.arange(nfft - nsubc // 2, nfft),
                           np.arange(0, nsubc // 2)])
    w = np.exp(-2j * np.pi * np.outer(k, bins) / nfft)
    wr = w.real.astype(np.float32)
    wi = w.imag.astype(np.float32)
    x = jnp.asarray((rng.normal(size=(S, nsym, nfft)) +
                     1j * rng.normal(size=(S, nsym, nfft))).astype(np.complex64))

    def dft_mm(v):
        vr, vi = jnp.real(v).reshape(-1, nfft), jnp.imag(v).reshape(-1, nfft)
        rr = vr @ wr - vi @ wi
        ri = vr @ wi + vi @ wr
        return jax.lax.complex(rr, ri).reshape(S, nsym, nsubc)

    print(f"dft matmul f32 (624 bins): {timeit(jax.jit(dft_mm), x)*1e3:7.3f} ms",
          flush=True)

    wrb = jnp.bfloat16(0) + wr.astype(np.float32)  # host np -> embedded
    wrb = wr  # bf16 casts happen inside the jit below
    wib = wi

    def dft_mm_bf16(v):
        vr = jnp.real(v).reshape(-1, nfft).astype(jnp.bfloat16)
        vi = jnp.imag(v).reshape(-1, nfft).astype(jnp.bfloat16)
        awr = jnp.asarray(wrb).astype(jnp.bfloat16)
        awi = jnp.asarray(wib).astype(jnp.bfloat16)
        rr = jnp.matmul(vr, awr, preferred_element_type=jnp.float32) \
            - jnp.matmul(vi, awi, preferred_element_type=jnp.float32)
        ri = jnp.matmul(vr, awi, preferred_element_type=jnp.float32) \
            + jnp.matmul(vi, awr, preferred_element_type=jnp.float32)
        return jax.lax.complex(rr, ri).reshape(S, nsym, nsubc)

    print(f"dft matmul bf16 in/f32 acc: {timeit(jax.jit(dft_mm_bf16), x)*1e3:7.3f} ms",
          flush=True)
    # accuracy check
    ref = np.fft.fft(np.asarray(x), axis=-1)[..., bins]
    got32 = np.asarray(jax.jit(dft_mm)(x))
    got16 = np.asarray(jax.jit(dft_mm_bf16)(x))
    print(f"matmul dft err f32={np.abs(got32-ref).max():.2e} "
          f"bf16={np.abs(got16-ref).max():.2e} (scale ~{np.abs(ref).max():.1f})",
          flush=True)

    # ---- decode chunking ----
    bg, zc = 1, 224
    g = get_graph(bg, zc)
    msgs = jnp.asarray(rng.integers(0, 2, (128, g.k), dtype=np.int8))
    cw = jax.jit(lambda m: encoder.encode(m, bg, zc))(msgs)
    llr = jax.jit(lambda c: ((1 - 2 * c.astype(jnp.float32)) * 8.0)
                  .at[:, :2 * zc].set(0.0))(cw)

    dec_full = jax.jit(lambda l: decoder.decode(l, bg, zc,
                                                schedule="layered_rolls"))
    print(f"decode 128 CBs direct: {timeit(dec_full, llr, iters=5)*1e3:7.3f} ms",
          flush=True)

    for chunk in (16, 32):
        def dec_chunked(l, chunk=chunk):
            lc = l.reshape(-1, chunk, l.shape[-1])
            hard, ok = jax.lax.map(
                lambda c: decoder.decode(c, bg, zc, schedule="layered_rolls"), lc)
            return hard.reshape(-1, hard.shape[-1]), ok.reshape(-1)
        f = jax.jit(dec_chunked)
        print(f"decode 128 CBs chunk={chunk}: {timeit(f, llr, iters=5)*1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
