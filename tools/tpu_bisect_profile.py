#!/usr/bin/env python3
"""Bisect the slot-batched UL/DL pipelines on TPU: cumulative stage timing."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops import channel_est, dmrs as dmrs_mod, equalizer, \
    modulation, ofdm, sequences
from srsran_edgeric_5g_tpu.ops.ldpc import decoder, rate_match, segmenter
from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp
from srsran_edgeric_5g_tpu.ran.numerology import N_SC_PER_PRB


def timeit(fn, *args, iters=15):
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
    S = 16
    seg, rm = sp._plans(cell, 0)
    t = cell.timing
    u, w = cell.nof_ue, cell.ue_width_sc
    span = u * w
    rng = np.random.default_rng(0)
    rntis = jnp.asarray(0x4601 + np.arange(u), dtype=np.uint32)
    tbs = cell.derived_tbs()
    payloads = jnp.asarray(rng.integers(0, 2, (S, u, tbs), dtype=np.int8))
    td = jax.jit(lambda p: sp.dl_slot_batch(p, rntis, cell))(payloads)

    pat = dmrs_mod.dmrs_pattern(1, cell.prb_per_ue, port=0)
    span_pat = dmrs_mod.dmrs_pattern(1, u * cell.prb_per_ue, port=0)
    data_sym_idx = jnp.asarray(np.asarray(cell.data_symbols, dtype=np.int32))
    dmrs_sym_idx = jnp.asarray(np.asarray(cell.dmrs_symbols, dtype=np.int32))
    times = np.asarray([t.cp.data_starts[l] for l in cell.dmrs_symbols]) / t.srate
    npil_ue = len(pat.subcarriers)
    ndmrs = len(cell.dmrs_symbols)
    ndata = len(cell.data_symbols)

    def stage_demod(x):
        return ofdm.demodulate_slot(x, t, scale=1.0)

    def stage_extract(x):
        g = stage_demod(x)
        band = g[..., :span]
        rx_p = band[..., dmrs_sym_idx, :][..., jnp.asarray(span_pat.subcarriers)]
        rx_p = rx_p.reshape(*rx_p.shape[:-2], ndmrs, u, npil_ue).swapaxes(-3, -2)
        y = band[..., data_sym_idx, :].reshape(*band.shape[:-2], ndata, u, w).swapaxes(-3, -2)
        return rx_p, y

    def _refp():
        pilots = sp._dmrs_full_band(cell)
        return pilots[:, :len(span_pat.subcarriers)] \
            .reshape(ndmrs, u, npil_ue).transpose(1, 0, 2)

    def stage_chest(x):
        rx_p, y = stage_extract(x)
        h, nv, cfo = channel_est.estimate_port(rx_p, _refp()[None],
                                               pat.subcarriers, w,
                                               dmrs_symbol_times_s=times)
        return h, nv, y

    def stage_eq(x):
        h, nv, y = stage_chest(x)
        hh = jnp.broadcast_to(h[..., None, :], y.shape)
        nvb = nv[..., None, None]
        x_hat, nv_out = equalizer.equalize_mmse_1xn(y[None], hh[None], nvb[None])
        return x_hat, nv_out

    def stage_demap(x):
        x_hat, nv_out = stage_eq(x)
        llr = modulation.demodulate_soft(x_hat.reshape(S * u, -1),
                                         nv_out.reshape(S * u, -1),
                                         cell.modulation, quantize=False)
        ci = (jnp.tile(rntis, S).astype(jnp.uint32) << 15) + jnp.uint32(cell.n_id)
        return sequences.scramble_llrs(llr, ci)

    def stage_full(x):
        llr = stage_demap(x)
        cb = llr.reshape(S * u * seg.c, rm.e)
        full = rate_match.rate_dematch(cb, rm)
        hard, ok = decoder.decode(full, seg.bg, seg.zc)
        return hard, ok

    for name, fn in [("ofdm_demod", stage_demod), ("`+extract", stage_extract),
                     ("+chest", stage_chest), ("+equalize", stage_eq),
                     ("+demap+descr", stage_demap), ("+dematch+dec", stage_full)]:
        f = jax.jit(fn)
        dt = timeit(f, td)
        print(f"UL {name:14s} {dt*1e3:8.3f} ms ({dt/S*1e3:6.3f} ms/slot)",
              flush=True)


if __name__ == "__main__":
    main()
