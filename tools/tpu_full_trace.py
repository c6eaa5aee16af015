#!/usr/bin/env python3
"""xplane per-op profile of the FULL gNB slot step (bench.bench_full_cell's
program).  Reuses the xplane summarizer from tpu_profile_trace.

Usage: python tools/tpu_full_trace.py [--sbatch=N] [--iters=N]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from tpu_profile_trace import summarize


def main():
    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.parallel import full_cell as fcell
    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    s = 256
    iters = 10
    for a in sys.argv:
        if a.startswith("--sbatch="):
            s = int(a.split("=")[1])
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])

    fc = fcell.FullCellConfig()
    u = fc.nof_ue
    rng = np.random.default_rng(0)
    cell_n, cell_s, cell_u = fc.dl_cell(), fc.dl_cell_ssb(), fc.ul_cell()
    norm_idx, ssb_idx = fc.norm_slots(s), fc.ssb_slots(s)
    seg_u, rm_u = sp._plans(cell_u, 0)

    pay_n = jnp.asarray(rng.integers(0, 2, (len(norm_idx), u,
                                            cell_n.derived_tbs()), np.int8))
    pay_s = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), u,
                                            cell_s.derived_tbs()), np.int8))
    dci = jnp.asarray(rng.integers(0, 2, (s, 2 * u, fc.dci_bits), np.int8))
    pbch = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), 24), np.int8))
    pay_u = jnp.asarray(rng.integers(0, 2, (s, u, cell_u.derived_tbs()),
                                     np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (s, u, 2), np.int8))
    csi = jnp.asarray(rng.integers(0, 2, (len(fc.csi_slots(s)), u,
                                          fc.csi_bits), np.int8))

    @jax.jit
    def make_ul(p, a, c, key):
        td = fcell.ue_ul_slot_batch(p, a, c, fc, s)
        re, im = jnp.real(td), jnp.imag(td)
        sig_pow = jnp.mean(re * re + im * im)
        sigma = jnp.sqrt(sig_pow * 10.0 ** (-2.5) / 2.0)
        n = jax.random.normal(key, td.shape + (2,), jnp.float32) * sigma
        return re, im, n[..., 0], n[..., 1]

    ul_re, ul_im, nre, nim = make_ul(pay_u, ack, csi,
                                     jax.random.key(42, impl="rbg"))
    nd_ones = jnp.ones((s, u), jnp.float32)

    @jax.jit
    def step(pn, eps, flip, soft):
        pn = jnp.bitwise_xor(pn, eps)
        td = fcell.gnb_dl_slot_batch(pn, pay_s, dci, pbch, fc, s)
        dl_pow = jnp.mean(jnp.real(td) ** 2 + jnp.imag(td) ** 2)
        rx = jax.lax.complex(ul_re + nre * flip, ul_im + nim * flip)
        res = fcell.gnb_ul_slot_batch(rx, fc, s, soft_in=soft,
                                      new_data=nd_ones)
        eps_next = (res["payload"][0, 0, 0] & jnp.int8(0)) | \
            (dl_pow > jnp.float32(1e30)).astype(jnp.int8)
        return res, eps_next, -flip

    eps = jnp.int8(0)
    flip = jnp.float32(1.0)
    soft = jnp.zeros((s, u * seg_u.c, rm_u.n_cb), jnp.float32)
    res, eps, flip = step(pay_n, eps, flip, soft)
    res["tb_ok"].block_until_ready()

    trace_dir = tempfile.mkdtemp(prefix="fulltrace_")
    print(f"tracing {iters} iters at S={s} -> {trace_dir}", flush=True)
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for _ in range(iters):
            res, eps, flip = step(pay_n, eps, flip, res["soft"])
        _ = int(eps)
        res["tb_ok"].block_until_ready()
        dt = (time.perf_counter() - t0) / (iters * s)
    print(f"traced: {dt*1e3:.3f} ms/slot", flush=True)
    summarize(trace_dir)


if __name__ == "__main__":
    main()
