#!/usr/bin/env python3
"""A/B the UL PUSCH pipeline geometry on the TPU: round-1 cell (26 PRB/UE,
first_prb 0, symbols 2-13) vs the full-cell UL (24 PRB/UE, first_prb 4,
symbols 0-12), and isolate the suspects (band offset, symbol count)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    s = 256
    rng = np.random.default_rng(0)
    rntis = jnp.asarray((0x4601 + np.arange(4)).astype(np.uint32))

    variants = {
        "r1: 26prb@0 sym2-13": dict(prb_per_ue=26, first_prb=0,
                                    first_symbol=2, nof_symbols=12),
        "fc: 24prb@4 sym0-12": dict(prb_per_ue=24, first_prb=4,
                                    first_symbol=0, nof_symbols=13),
        "24prb@0 sym2-13":     dict(prb_per_ue=24, first_prb=0,
                                    first_symbol=2, nof_symbols=12),
        "24prb@4 sym2-13":     dict(prb_per_ue=24, first_prb=4,
                                    first_symbol=2, nof_symbols=12),
        "24prb@0 sym0-12":     dict(prb_per_ue=24, first_prb=0,
                                    first_symbol=0, nof_symbols=13),
    }

    for name, kw in variants.items():
        cell = sp.CellConfig(nof_prb=106, nfft=1536, nof_ue=4,
                             modulation="qam64", target_rate=0.5,
                             dmrs_symbols=(2, 11), **kw)
        tbs = cell.derived_tbs()
        pay = jnp.asarray(rng.integers(0, 2, (s, 4, tbs), np.int8))

        @jax.jit
        def stepfn(p, eps):
            td = sp.dl_slot_batch(jnp.bitwise_xor(p, eps), rntis, cell)
            out = sp.ul_slot_batch(td, rntis, cell)
            return out[1], (out[0][0, 0, 0] & jnp.int8(0))

        ok, eps = stepfn(pay, jnp.int8(0))
        ok.block_until_ready()
        assert np.asarray(ok).all(), name
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            ok, eps = stepfn(pay, eps)
        ok.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        seg, rm = sp._plans(cell, 0)
        print(f"{name:22s} TBS={tbs} C={seg.c} Zc={seg.zc} E={rm.e}: "
              f"{dt / s * 1e3:7.4f} ms/slot ({dt * 1e3:7.2f} ms/batch)",
              flush=True)


if __name__ == "__main__":
    main()
