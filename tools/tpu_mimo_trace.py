#!/usr/bin/env python3
"""xplane per-op profile of the MIMO data-plane step (bench.bench_mimo's
program).  Reuses the xplane summarizer from tpu_profile_trace.

Usage: python tools/tpu_mimo_trace.py [--layers=N] [--sbatch=N] [--iters=N]
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

    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    s = 32
    iters = 5
    n_layers = 4
    snr_db = 25.0
    for a in sys.argv:
        if a.startswith("--sbatch="):
            s = int(a.split("=")[1])
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])
        if a.startswith("--layers="):
            n_layers = int(a.split("=")[1])

    cell = sp.CellConfig(nof_prb=106, nfft=1536, nof_ue=4, prb_per_ue=26,
                         modulation="qam64", target_rate=0.5,
                         n_layers=n_layers)
    tbs = cell.derived_tbs()
    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 2, (s, 4, tbs), dtype=np.int8))
    rntis = jnp.asarray((0x4601 + np.arange(4)).astype(np.uint32))

    a_np = ((rng.normal(size=(n_layers, n_layers))
             + 1j * rng.normal(size=(n_layers, n_layers))) / np.sqrt(2))
    f = np.exp(-2j * np.pi * np.outer(np.arange(n_layers),
                                      np.arange(n_layers)) / n_layers)
    a_re = (0.35 * a_np + f / np.sqrt(n_layers)).astype(np.complex64)
    a_r, a_i = jnp.asarray(a_re.real), jnp.asarray(a_re.imag)

    @jax.jit
    def make_noise(p, key):
        td = sp.dl_slot_batch_mimo(p, rntis, cell)
        sig_pow = jnp.mean(jnp.abs(td) ** 2)
        sigma = jnp.sqrt(sig_pow * 10.0 ** (-snr_db / 10.0) / 2.0)
        n = jax.random.normal(key, td.shape + (2,), jnp.float32) * sigma
        return n[..., 0], n[..., 1]

    noise = make_noise(payloads, jax.random.key(42, impl="rbg"))

    @jax.jit
    def step(p, eps, flip, noise):
        p = jnp.bitwise_xor(p, eps)
        td = sp.dl_slot_batch_mimo(p, rntis, cell)
        a = jax.lax.complex(a_r, a_i)
        rx = jnp.einsum("pl,slt->spt", a, td)
        nr, ni = noise
        rx = jax.lax.complex(jnp.real(rx) + nr * flip,
                             jnp.imag(rx) + ni * flip)
        hat, tb_ok, nv, cfo, _ = sp.ul_slot_batch_mimo(rx, rntis, cell)
        return hat, tb_ok, (hat[0, 0, 0] & jnp.int8(0)), -flip

    eps = jnp.int8(0)
    key = jnp.float32(1.0)
    hat, tb_ok, eps, key = step(payloads, eps, key, noise)
    ok = np.asarray(tb_ok)
    assert ok.all(), f"MIMO loopback CRC failed: {ok.mean()}"
    print(f"warmed up; tracing {iters} iters at S={s} L={n_layers}",
          flush=True)

    trace_dir = tempfile.mkdtemp(prefix="mimo_trace_")
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for _ in range(iters):
            hat, tb_ok, eps, key = step(payloads, eps, key, noise)
        _ = int(eps)
        tb_ok.block_until_ready()
        dt = (time.perf_counter() - t0) / (iters * s)
    print(f"traced: {dt*1e3:.3f} ms/slot ({1e-3/dt:.2f}x real-time)",
          flush=True)
    summarize(trace_dir)


if __name__ == "__main__":
    main()
