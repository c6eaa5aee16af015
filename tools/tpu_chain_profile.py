#!/usr/bin/env python3
"""Honest cumulative profile of the slot-batched DL+UL pipeline on TPU.

Each variant jits a prefix of the full bench program and times it with a
data dependency chained through iterations (the axon relay dedups identical
execution requests, so unchained loops measure ~0 — see NOTES_ROUND1.md).
Differences between successive rows give the marginal cost of each stage
group at the real operating point (S=16 slot batch, 20 MHz, 4 UE, 64QAM).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops.ldpc import decoder, rate_match, segmenter
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

    def v_dl(p, eps):
        p = jnp.bitwise_xor(p, eps)
        td = sp.dl_slot_batch(p, rntis, cell)
        return td, (td[0, 0].real < 1e30).astype(jnp.int8) & jnp.int8(0)

    def v_ulfront(p, eps):
        p = jnp.bitwise_xor(p, eps)
        td = sp.dl_slot_batch(p, rntis, cell)
        llr, nv, cfo = sp._ul_front(td, rntis, cell)
        return llr, (llr[0, 0, 0] * 0).astype(jnp.int8)

    def v_dematch(p, eps):
        p = jnp.bitwise_xor(p, eps)
        td = sp.dl_slot_batch(p, rntis, cell)
        llr, nv, cfo = sp._ul_front(td, rntis, cell)
        cb = llr.reshape(S * u * seg.c, rm.e)
        full = rate_match.rate_dematch(cb, rm)
        return full, (full[0, 0] * 0).astype(jnp.int8)

    def v_full(p, eps):
        p = jnp.bitwise_xor(p, eps)
        td = sp.dl_slot_batch(p, rntis, cell)
        ph, ok, nv, cfo, _ = sp.ul_slot_batch(td, rntis, cell)
        return ph, ph[0, 0, 0] & jnp.int8(0)

    rows = [("dl_only", v_dl), ("+ul_front", v_ulfront),
            ("+dematch", v_dematch), ("full(+decode)", v_full)]
    prev = 0.0
    for name, fn in rows:
        f = jax.jit(fn)
        t0 = time.perf_counter()
        dt = chained_time(f, payloads)
        print(f"{name:14s} {dt*1e3:8.3f} ms/batch  {dt/S*1e3:6.3f} ms/slot  "
              f"(delta {(dt-prev)/S*1e3:+6.3f})  [compile+run {time.perf_counter()-t0:.0f}s]",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
