#!/usr/bin/env python3
"""Whole-pipeline and missing-stage profiling on TPU: dl_slot/ul_slot vs
slot-batched variants, plus channel-est/equalizer/extraction sub-stages."""
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    t = cell.timing
    tbs = cell.derived_tbs()
    rng = np.random.default_rng(0)
    u = cell.nof_ue
    rntis = jnp.asarray(0x4601 + np.arange(u), dtype=np.uint32)

    f_dl = jax.jit(lambda p: sp.dl_slot(p, rntis, cell))
    f_ul = jax.jit(lambda s: sp.ul_slot(s, rntis, cell))

    payloads = jnp.asarray(rng.integers(0, 2, (u, tbs), dtype=np.int8))
    td = f_dl(payloads)
    print(f"dl_slot      (S=1): {timeit(f_dl, payloads)*1e3:8.3f} ms", flush=True)
    print(f"ul_slot      (S=1): {timeit(f_ul, td)*1e3:8.3f} ms", flush=True)

    for s in (4, 8, 16):
        pb = jnp.asarray(rng.integers(0, 2, (s, u, tbs), dtype=np.int8))
        f_dlb = jax.jit(lambda p: sp.dl_slot_batch(p, rntis, cell))
        f_ulb = jax.jit(lambda x: sp.ul_slot_batch(x, rntis, cell))
        tdb = f_dlb(pb)
        dt_dl = timeit(f_dlb, pb, iters=10)
        dt_ul = timeit(f_ulb, tdb, iters=10)
        ok = np.asarray(f_ulb(tdb)[1]).all()
        per_slot = (dt_dl + dt_ul) / s
        print(f"slot batch S={s:2d}: dl {dt_dl*1e3:7.3f} ul {dt_ul*1e3:7.3f} ms "
              f"-> {per_slot*1e3:6.3f} ms/slot "
              f"({t.cp.total/per_slot/1e6:7.1f} Msamp/s) ok={ok}", flush=True)


if __name__ == "__main__":
    main()
