#!/usr/bin/env python3
"""Bisect the DL direction (the current pipeline bottleneck per
tpu_chain_profile): cumulative chained timing of
segment+encode -> +rate match -> +scramble+modulate -> +grid -> +OFDM."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops import modulation, ofdm, sequences
from srsran_edgeric_5g_tpu.ops.ldpc import encoder, rate_match, segmenter
from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp


def chained_time(step, payloads, iters=30):
    eps = jnp.int8(0)
    out, eps = step(payloads, eps)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out, eps = step(payloads, eps)
    _ = int(eps)
    return (time.perf_counter() - t0) / iters


def main():
    cell = sp.CellConfig(nof_prb=106, nfft=1536, nof_ue=4, prb_per_ue=26,
                         modulation="qam64", target_rate=0.5)
    S = 16
    seg, rm = sp._plans(cell, 0)
    tbs = cell.derived_tbs()
    rng = np.random.default_rng(0)
    u = cell.nof_ue
    rntis = jnp.asarray(0x4601 + np.arange(u), dtype=np.uint32)
    payloads = jnp.asarray(rng.integers(0, 2, (S, u, tbs), dtype=np.int8))

    def dep(x):
        return (x.reshape(-1)[0] * 0).astype(jnp.int8) \
            if x.dtype in (jnp.int8, jnp.int32) else \
            (x.reshape(-1)[0].real * 0).astype(jnp.int8)

    def v_encode(p, eps):
        p = jnp.bitwise_xor(p, eps)
        cbs = segmenter.segment_tb(p.reshape(S * u, tbs), seg)
        cw = encoder.encode(cbs, seg.bg, seg.zc)
        return cw, dep(cw)

    def v_rm(p, eps):
        p = jnp.bitwise_xor(p, eps)
        cbs = segmenter.segment_tb(p.reshape(S * u, tbs), seg)
        cw = encoder.encode(cbs, seg.bg, seg.zc)
        bits = rate_match.rate_match(cw, rm).reshape(S * u, -1)
        return bits, dep(bits)

    def v_code(p, eps):
        p = jnp.bitwise_xor(p, eps)
        syms = sp._dl_code(p.reshape(S * u, tbs), rntis, cell)
        return syms, dep(syms)

    def v_grid(p, eps):
        p = jnp.bitwise_xor(p, eps)
        syms = sp._dl_code(p.reshape(S * u, tbs), rntis, cell).reshape(S, u, -1)
        t = cell.timing
        w = cell.ue_width_sc
        ndata = len(cell.data_symbols)

        def grid_of(sy):
            band = sy.reshape(u, ndata, w).transpose(1, 0, 2)
            return band
        g = jax.vmap(grid_of)(syms)
        return g, dep(g)

    def v_full(p, eps):
        p = jnp.bitwise_xor(p, eps)
        td = sp.dl_slot_batch(p, rntis, cell)
        return td, dep(td)

    rows = [("seg+encode", v_encode), ("+rate_match", v_rm),
            ("+scr+modulate", v_code), ("+transpose", v_grid),
            ("full dl(+grid+ofdm)", v_full)]
    prev = 0.0
    for name, fn in rows:
        f = jax.jit(fn)
        t0 = time.perf_counter()
        dt = chained_time(f, payloads)
        print(f"{name:20s} {dt*1e3:8.3f} ms/batch  {dt/S*1e3:6.3f} ms/slot  "
              f"(delta {(dt-prev)/S*1e3:+6.3f})  "
              f"[compile+run {time.perf_counter()-t0:.0f}s]", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
