#!/usr/bin/env python3
"""Probe the decode early-stop behavior on the TPU with the full-cell
bench's actual LLR realizations: time layered_rolls_bf16 with
early_stop=True vs fixed num_iters, and check bf16 syndrome convergence
per sweep (does the while exit when f32 convergence says it should?)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.ops import ofdm
    from srsran_edgeric_5g_tpu.ops.ldpc import decoder, rate_match
    from srsran_edgeric_5g_tpu.parallel import full_cell as fcell
    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    fc = fcell.FullCellConfig()
    s = 256
    u = 4
    cell = fc.ul_cell()
    rng = np.random.default_rng(0)
    tbs_u = cell.derived_tbs()
    pay = jnp.asarray(rng.integers(0, 2, (s, u, tbs_u), np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (s, u, 2), np.int8))
    csi = jnp.asarray(rng.integers(0, 2, (len(fc.csi_slots(s)), u,
                                          fc.csi_bits), np.int8))
    seg, rm = sp._plans(cell, 0)
    t = cell.timing

    @jax.jit
    def make_llrs(p, a, c, key):
        td = fcell.ue_ul_slot_batch(p, a, c, fc, s)
        sig = jnp.mean(jnp.real(td) ** 2 + jnp.imag(td) ** 2)
        sigma = jnp.sqrt(sig * 10.0 ** (-2.5) / 2.0)
        n = jax.random.normal(key, td.shape + (2,), jnp.float32) * sigma
        rx = jax.lax.complex(jnp.real(td) + n[..., 0],
                             jnp.imag(td) + n[..., 1])
        grid = ofdm.demodulate_slot(rx, t, scale=1.0)
        llr, nv, cfo = sp._ul_front(None, fc.rntis(), cell, rx_grid=grid)
        return rate_match.rate_dematch(
            llr.reshape(s * u * seg.c, rm.e), rm)

    full = make_llrs(pay, ack, csi, jax.random.key(42, impl="rbg"))
    full.block_until_ready()
    print(f"LLR batch: {full.shape}", flush=True)

    def timeit(fn, x, iters=10):
        out = fn(x, jnp.float32(1.0))
        out[1].block_until_ready()
        t0 = time.perf_counter()
        flip = jnp.float32(1.0)
        for _ in range(iters):
            out = fn(x, flip)
            flip = -flip
        out[1].block_until_ready()
        return (time.perf_counter() - t0) / iters

    for label, kw in (
            ("bf16 early_stop iters=6", dict(schedule="layered_rolls_bf16",
                                             num_iters=6, early_stop=True)),
            ("bf16 no-early    iters=6", dict(schedule="layered_rolls_bf16",
                                              num_iters=6, early_stop=False)),
            ("bf16 no-early    iters=2", dict(schedule="layered_rolls_bf16",
                                              num_iters=2, early_stop=False)),
            ("f32  early_stop iters=6", dict(schedule="layered_rolls",
                                             num_iters=6, early_stop=True)),
    ):
        @jax.jit
        def f(x, flip, kw=dict(kw)):
            hard, ok = decoder.decode(x * flip * flip, seg.bg, seg.zc, **kw)
            return hard, ok
        dt = timeit(f, full)
        hard, ok = f(full, jnp.float32(1.0))
        print(f"{label}: {dt * 1e3:7.2f} ms/batch, ok={np.asarray(ok).mean():.4f}",
              flush=True)

    # bf16 syndrome convergence per fixed sweep count.
    for k in (1, 2, 3, 4, 5, 6):
        @jax.jit
        def g(x, k=k):
            return decoder.decode(x, seg.bg, seg.zc, num_iters=k,
                                  schedule="layered_rolls_bf16",
                                  early_stop=False)[1]
        okn = np.asarray(g(full))
        print(f"bf16 fixed iters={k}: parity-ok {okn.mean():.5f} "
              f"({int((~okn).sum())} CBs unconverged)", flush=True)


if __name__ == "__main__":
    main()
