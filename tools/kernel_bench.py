#!/usr/bin/env python3
"""Per-kernel throughput microbenchmarks — the counterpart of the
reference's tests/benchmarks/phy/** binaries (benchmark_utils.h prints
throughput in millions of elements/s; here one line per kernel).

All timings chain a data dependency through iterations (axon relay dedups
identical execution requests) and sync the host once at the end.

Usage: python tools/kernel_bench.py [--iters N]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def chained(fn, x0, iters):
    """fn: x -> (out, eps) with eps a data-dependent zero folded into the
    next iteration's input."""
    out, eps = fn(x0, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, eps = fn(x0, eps)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(name, elems, dt, unit):
    print(f"{name:28s} {dt*1e3:9.4f} ms   {elems/dt/1e6:10.1f} M{unit}/s",
          flush=True)


def main():
    iters = 20
    for a in sys.argv:
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # --- DFT (OFDM-sized batched FFT): 1536-pt x 14 symb x 16 slots ---
    x = jnp.asarray((rng.normal(size=(224, 1536)) +
                     1j * rng.normal(size=(224, 1536))).astype(np.complex64))
    f = jax.jit(lambda v, e: ((o := jnp.fft.fft(v + e)), o[0, 0].real * 0))
    dt = chained(f, x, iters)
    report("fft_1536_batch224", x.size, dt, "samp")

    # --- LDPC encode: BG1 Zc=384, B=64 ---
    from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder
    from srsran_edgeric_5g_tpu.ops.ldpc.graph import get_graph
    g = get_graph(1, 384)
    msgs = jnp.asarray(rng.integers(0, 2, (64, g.k), dtype=np.int8))
    enc = jax.jit(lambda m, e: (
        (o := encoder.encode(jnp.bitwise_xor(m, e.astype(jnp.int8)), 1, 384)),
        (o[0, 0] & 0).astype(jnp.float32)))
    dt = chained(enc, msgs, iters)
    report("ldpc_enc_bg1_zc384_b64", 64 * g.k, dt, "bit")

    # --- LDPC decode (XLA layered_rolls w/ early stop), realistic SNR ---
    # int8/int32 device->host transfers are UNIMPLEMENTED through the axon
    # relay (like complex64); pull as f32.
    cw = np.asarray(jax.jit(
        lambda m: encoder.encode(m, 1, 384).astype(jnp.float32))(msgs)
        ).astype(np.int8)
    sym = 1 - 2 * cw.astype(np.float32)
    sigma = 10 ** (-6.5 / 20)
    y = sym + rng.normal(size=sym.shape) * sigma
    llr = np.clip(2 * y / sigma ** 2, -120, 120)
    llr[:, :2 * 384] = 0.0
    llr = jnp.asarray(llr.astype(np.float32))
    dec = jax.jit(lambda l, e: (
        (o := decoder.decode(l + e, 1, 384, schedule="layered_rolls")[0]),
        (o[0, 0] & 0).astype(jnp.float32)))
    dt = chained(dec, llr, max(2, iters // 4))
    report("ldpc_dec_rolls_es_b64", 64 * g.kb * 384, dt, "bit")

    # --- LDPC decode (Pallas f32 kernel, 6 iters; TPU only) ---
    if jax.default_backend() == "tpu":
        from srsran_edgeric_5g_tpu.ops.ldpc import decoder_pallas
        decp = jax.jit(lambda l, e: (
            (o := decoder_pallas.decode_pallas(l + e, 1, 384)[0]),
            (o[0, 0] & 0).astype(jnp.float32)))
        dt = chained(decp, llr, max(2, iters // 4))
        report("ldpc_dec_pallas_b64", 64 * g.kb * 384, dt, "bit")

    # --- Modulation map + soft demap (64QAM) ---
    from srsran_edgeric_5g_tpu.ops import modulation
    bits = jnp.asarray(rng.integers(0, 2, (16, 99072), dtype=np.int8))
    mod = jax.jit(lambda b, e: (
        (o := modulation.modulate(jnp.bitwise_xor(b, e.astype(jnp.int8)),
                                  "qam64")), o[0, 0].real * 0))
    dt = chained(mod, bits, iters)
    report("qam64_map", bits.size, dt, "bit")
    syms = jnp.asarray((rng.normal(size=(16, 16512)) +
                        1j * rng.normal(size=(16, 16512))).astype(np.complex64)
                       ) * np.float32(0.3)
    dem = jax.jit(lambda s, e: (
        (o := modulation.demodulate_soft(s + e, jnp.float32(0.05), "qam64")),
        (o[0, 0] & 0).astype(jnp.float32)))
    dt = chained(dem, syms, iters)
    report("qam64_softdemap", syms.size, dt, "symb")

    # --- MMSE 1xN equalizer over a 20 MHz 4-UE slot batch ---
    from srsran_edgeric_5g_tpu.ops import equalizer
    shp = (64, 12, 312)
    yv = jnp.asarray((rng.normal(size=shp) + 1j * rng.normal(size=shp))
                     .astype(np.complex64))
    hv = jnp.asarray((rng.normal(size=shp) + 1j * rng.normal(size=shp))
                     .astype(np.complex64))
    eq = jax.jit(lambda v, e: (
        (o := equalizer.equalize_mmse_1xn((v + e)[None], hv[None],
                                          jnp.float32(0.05))[0]),
        o[0, 0, 0].real * 0))
    dt = chained(eq, yv, iters)
    report("mmse_1x1_eq", yv.size, dt, "RE")

    # --- Channel estimate (LS + CFO + interp), 64 single-symbol-pair UEs ---
    from srsran_edgeric_5g_tpu.ops import channel_est
    npil, width = 156, 312
    sc = np.arange(0, 2 * npil, 2).astype(np.int32)
    rx = jnp.asarray((rng.normal(size=(64, 2, npil)) +
                      1j * rng.normal(size=(64, 2, npil))).astype(np.complex64))
    ref = jnp.ones((64, 2, npil), jnp.complex64)
    ce = jax.jit(lambda v, e: (
        (o := channel_est.estimate_port(v + e, ref, sc, width,
                                        dmrs_symbol_times_s=np.r_[0.0, 5e-4])[0]),
        o[0, 0].real * 0))
    dt = chained(ce, rx, iters)
    report("chest_64ue", 64 * width, dt, "RE")

    # --- PRACH detect (64-preamble bank) ---
    from srsran_edgeric_5g_tpu.ops import prach
    pcfg = prach.PrachConfig(root_sequence_index=0, zero_correlation_zone=13)
    fd = prach.generate(pcfg, 7)
    det = jax.jit(lambda v, e: (
        (o := prach.detect(v + e, pcfg).metrics), o[0].real * 0))
    dt = chained(det, fd, iters)
    report("prach_detect_64pre", 64 * 839, dt, "corr")


if __name__ == "__main__":
    main()
