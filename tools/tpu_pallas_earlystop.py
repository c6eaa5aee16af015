#!/usr/bin/env python3
"""Validate + time the Pallas decoder's in-kernel syndrome early exit on TPU.

Chained-dependency timing (the axon relay dedups identical execution
requests).  Measures the f32 and int8 kernels at a realistic operating SNR
(converges in 2-3 sweeps) and on a clean wire (1 sweep), early_stop on/off.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops.ldpc import decoder_pallas, encoder
from srsran_edgeric_5g_tpu.ops.ldpc.graph import get_graph


def timeit_chained(fn, llr, iters=10):
    """fn(llr)->(hard, ok); chain a zero derived from the output into the
    next call's input so the relay cannot dedup."""
    @jax.jit
    def step(l, eps):
        hard, ok = fn(l + eps)
        eps_next = (hard[0, 0].astype(jnp.float32) * 0.0)
        return hard, ok, eps_next

    hard, ok, eps = step(llr, jnp.float32(0.0))
    jax.block_until_ready(ok)
    t0 = time.perf_counter()
    for _ in range(iters):
        hard, ok, eps = step(llr, eps)
    jax.block_until_ready(ok)
    return (time.perf_counter() - t0) / iters, np.asarray(ok)


def main():
    print("backend:", jax.default_backend(), flush=True)
    bg, zc, b = 1, 384, 128
    g = get_graph(bg, zc)
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(rng.integers(0, 2, (b, g.k), dtype=np.int8))
    cw = np.asarray(jax.jit(lambda m: encoder.encode(m, bg, zc))(msgs))
    sym = 1 - 2 * cw.astype(np.float32)
    k_bits = g.kb * zc

    for snr_db, tag in ((100.0, "clean"), (6.5, "op-SNR")):
        sigma = 10 ** (-snr_db / 20)
        y = sym + rng.normal(size=sym.shape) * sigma
        llr = 2 * y / max(sigma, 1e-3) ** 2
        llr = 20 * np.clip(llr / 20, -6.0, 6.0)
        llr[:, :2 * zc] = 0.0
        llr = jnp.asarray(llr.astype(np.float32))
        for name, fn in (
            ("f32 es=0", lambda l: decoder_pallas.decode_pallas(
                l, bg, zc, b_tile=8, early_stop=False)),
            ("f32 es=1", lambda l: decoder_pallas.decode_pallas(
                l, bg, zc, b_tile=8, early_stop=True)),
            ("int8 es=0", lambda l: decoder_pallas.decode_pallas_int8(
                l, bg, zc, b_tile=32, early_stop=False)),
            ("int8 es=1", lambda l: decoder_pallas.decode_pallas_int8(
                l, bg, zc, b_tile=32, early_stop=True)),
        ):
            try:
                dt, ok = timeit_chained(fn, llr)
            except Exception as e:  # Mosaic/compile failures: report, go on
                print(f"{tag:7s} {name}: FAILED "
                      f"{str(e).splitlines()[0][:110]}", flush=True)
                continue
            mbps = b * k_bits / dt / 1e6
            print(f"{tag:7s} {name}: {dt*1e3:7.3f} ms  {mbps:6.0f} Mbit/s "
                  f"ok={ok.all()}", flush=True)


if __name__ == "__main__":
    main()
