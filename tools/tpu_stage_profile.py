#!/usr/bin/env python3
"""Per-stage timing of the 20MHz 4-UE slot pipeline on the TPU, with and
without slot batching.  All stage functions are jitted ONCE and reused."""
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

    f_segment = jax.jit(lambda p: segmenter.segment_tb(p, seg))
    f_encode = jax.jit(lambda c: encoder.encode(c, seg.bg, seg.zc))
    f_rm = jax.jit(lambda c: rate_match.rate_match(c, rm))
    f_scr = jax.jit(sequences.scramble_bits)
    f_mod = jax.jit(lambda b: modulation.modulate(b, "qam64"))
    f_ofdm = jax.jit(lambda g: ofdm.modulate_slot(g, t, scale=1.0 / t.nfft))
    f_ofdm_d = jax.jit(lambda x: ofdm.demodulate_slot(x, t, scale=1.0))
    f_demap = jax.jit(lambda s: modulation.demodulate_soft(
        s, jnp.float32(0.1), "qam64", quantize=False))
    f_descr = jax.jit(sequences.scramble_llrs)
    f_rdm = jax.jit(lambda l: rate_match.rate_dematch(l, rm))
    f_dec = jax.jit(lambda f: decoder.decode(f, seg.bg, seg.zc,
                                             schedule="layered_rolls"))

    for s_batch in (1, 8):
        rng = np.random.default_rng(0)
        u = cell.nof_ue
        payloads = jnp.asarray(rng.integers(0, 2, (s_batch * u, tbs), dtype=np.int8))
        cbs = f_segment(payloads)
        cw = f_encode(cbs)
        bits = f_rm(cw)
        ci = jnp.asarray(rng.integers(0, 2**31, (s_batch * u,), dtype=np.uint32))
        flat_bits = bits.reshape(s_batch * u, -1)
        scr = f_scr(flat_bits, ci)
        syms = f_mod(scr)
        grid = jnp.asarray(
            (rng.normal(size=(s_batch, t.nsymb, t.nof_subc)) +
             1j * rng.normal(size=(s_batch, t.nsymb, t.nof_subc))).astype(np.complex64))
        td = f_ofdm(grid)
        llr_in = f_demap(syms)
        cb_llr = llr_in.reshape(-1, rm.e)
        full = f_rdm(cb_llr)

        stages = [
            ("segment+crc", f_segment, payloads),
            ("ldpc_encode", f_encode, cbs),
            ("rate_match", f_rm, cw),
            ("scramble", f_scr, flat_bits, ci),
            ("modulate", f_mod, scr),
            ("ofdm_mod", f_ofdm, grid),
            ("ofdm_demod", f_ofdm_d, td),
            ("demap", f_demap, syms),
            ("descramble", f_descr, llr_in, ci),
            ("rate_dematch", f_rdm, cb_llr),
            ("ldpc_decode", f_dec, full),
        ]
        print(f"--- slot batch {s_batch} ({s_batch * u} TBs, "
              f"{s_batch * u * seg.c} CBs) ---", flush=True)
        total = 0.0
        for name, fn, *args in stages:
            dt = timeit(fn, *args)
            total += dt
            print(f"  {name:14s} {dt*1e3:8.3f} ms", flush=True)
        print(f"  {'TOTAL':14s} {total*1e3:8.3f} ms "
              f"({s_batch} slots -> {total/s_batch*1e3:.3f} ms/slot)", flush=True)


if __name__ == "__main__":
    main()
