#!/usr/bin/env python3
"""Per-stage timing of the 20MHz 4-UE slot pipeline on the TPU, with and
without slot batching."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops import modulation, ofdm, sequences
from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder, rate_match, segmenter
from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    cell = sp.CellConfig(nof_prb=106, nfft=1536, nof_ue=4, prb_per_ue=26,
                         modulation="qam64", target_rate=0.5)
    seg, rm = sp._plans(cell, 0)
    t = cell.timing
    tbs = cell.derived_tbs()
    print(f"cell: TBS={tbs}, C={seg.c}, Zc={seg.zc}, bg={seg.bg}, E={rm.e}",
          flush=True)

    for s_batch in (1, 8):
        rng = np.random.default_rng(0)
        u = cell.nof_ue
        payloads = jnp.asarray(rng.integers(0, 2, (s_batch * u, tbs), dtype=np.int8))
        cbs = jax.jit(lambda p: segmenter.segment_tb(p, seg))(payloads)
        cw = jax.jit(lambda c: encoder.encode(c, seg.bg, seg.zc))(cbs)
        bits = jax.jit(lambda c: rate_match.rate_match(c, rm))(cw)
        ci = jnp.asarray(rng.integers(0, 2**31, (s_batch * u,), dtype=np.uint32))
        scr = jax.jit(sequences.scramble_bits)(bits.reshape(s_batch * u, -1), ci)
        syms = jax.jit(lambda b: modulation.modulate(b, "qam64"))(scr)
        grid = jnp.asarray(
            (rng.normal(size=(s_batch, t.nsymb, t.nof_subc)) +
             1j * rng.normal(size=(s_batch, t.nsymb, t.nof_subc))).astype(np.complex64))
        td = jax.jit(lambda g: ofdm.modulate_slot(g, t, scale=1.0 / t.nfft))(grid)
        llr_in = jax.jit(lambda s: modulation.demodulate_soft(
            s, jnp.float32(0.1), "qam64", quantize=False))(syms)
        cb_llr = llr_in.reshape(-1, rm.e)
        full = jax.jit(lambda l: rate_match.rate_dematch(l, rm))(cb_llr)

        stages = [
            ("segment+crc", lambda: jax.jit(lambda p: segmenter.segment_tb(p, seg))(payloads)),
            ("ldpc_encode", lambda: jax.jit(lambda c: encoder.encode(c, seg.bg, seg.zc))(cbs)),
            ("rate_match", lambda: jax.jit(lambda c: rate_match.rate_match(c, rm))(cw)),
            ("scramble", lambda: jax.jit(sequences.scramble_bits)(bits.reshape(s_batch * u, -1), ci)),
            ("modulate", lambda: jax.jit(lambda b: modulation.modulate(b, "qam64"))(scr)),
            ("ofdm_mod", lambda: jax.jit(lambda g: ofdm.modulate_slot(g, t, scale=1.0 / t.nfft))(grid)),
            ("ofdm_demod", lambda: jax.jit(lambda x: ofdm.demodulate_slot(x, t, scale=1.0))(td)),
            ("demap", lambda: jax.jit(lambda s: modulation.demodulate_soft(
                s, jnp.float32(0.1), "qam64", quantize=False))(syms)),
            ("descramble", lambda: jax.jit(sequences.scramble_llrs)(llr_in, ci)),
            ("rate_dematch", lambda: jax.jit(lambda l: rate_match.rate_dematch(l, rm))(cb_llr)),
            ("ldpc_decode", lambda: jax.jit(lambda f: decoder.decode(
                f, seg.bg, seg.zc, schedule="layered_rolls"))(full)),
        ]
        print(f"--- slot batch {s_batch} ({s_batch * u} TBs, "
              f"{s_batch * u * seg.c} CBs) ---", flush=True)
        for name, fn in stages:
            dt = timeit(fn)
            print(f"  {name:14s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
