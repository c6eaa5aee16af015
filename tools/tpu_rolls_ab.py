#!/usr/bin/env python3
"""A/B the layered_rolls decoder storage dtypes (f32 / bf16 / i8) on the TPU
at the slot pipeline's decode shape: vmap over S slots of (U*C, N) LLRs.

The xplane profile shows the in-pipeline decode is HBM-bandwidth-bound on the
(S, U*C, edges, Zc) R tensor; bf16/i8 storage attacks exactly that.
Chained data dependency through iterations (relay dedups identical requests).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder
from srsran_edgeric_5g_tpu.ops.ldpc.graph import get_graph


def main():
    s_batch = 64
    cbs = 8           # 4 UE x 2 CB per slot (20 MHz bench config)
    bg, zc = 1, 224
    snr_db = 25.0
    for a in sys.argv:
        if a.startswith("--sbatch="):
            s_batch = int(a.split("=")[1])
        if a.startswith("--zc="):
            zc = int(a.split("=")[1])
    g = get_graph(bg, zc)
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(
        rng.integers(0, 2, (s_batch * cbs, g.k), dtype=np.int8))
    cw = jax.jit(lambda m: encoder.encode(m, bg, zc))(msgs)
    # 64QAM r0.5 @ 25 dB SNR operating point: per-bit LLR noise such that
    # the early stop runs a realistic 2-3 sweeps (same regime as bench.py).
    x = 1.0 - 2.0 * np.asarray(cw, np.float32)
    sigma = 0.5
    noise = rng.normal(0, sigma, x.shape).astype(np.float32)
    llr = 2.0 * (x + noise) / sigma**2
    llr[:, :2 * zc] = 0.0
    llr = jnp.asarray(llr.reshape(s_batch, cbs, -1))

    variants = [
        ("vmap:layered_rolls", "layered_rolls", False),
        ("vmap:rolls_bf16", "layered_rolls_bf16", False),
        ("vmap:rolls_i8", "layered_rolls_i8", False),
        ("flat:rolls_bf16", "layered_rolls_bf16", True),
        ("flat:waves_bf16", "layered_waves_bf16", True),
        ("flat:waves_f32", "layered_waves", True),
        ("flat:cr_bf16", "layered_rolls_cr", True),
        ("flat:cr_f32", "layered_rolls_cr_f32", True),
        ("flat:pallas", "pallas", True),
    ]
    only = [a.split("=")[1] for a in sys.argv if a.startswith("--only=")]
    if only:
        keep = only[0].split(",")
        variants = [v for v in variants if any(k in v[0] for k in keep)]
    for name, sched, flat in variants:
        def step(l, eps, _sched=sched, _flat=flat):
            l = l + eps
            if _flat:
                lf = l.reshape(s_batch * cbs, -1)
                hard, ok = decoder.decode(lf, bg, zc, num_iters=6,
                                          schedule=_sched)
                hard = hard.reshape(s_batch, cbs, -1)
                ok = ok.reshape(s_batch, cbs)
            else:
                hard, ok = jax.vmap(
                    lambda li: decoder.decode(li, bg, zc, num_iters=6,
                                              schedule=_sched))(l)
            eps_next = hard[0, 0, 0].astype(jnp.float32) * 0.0
            return hard, ok, eps_next

        stepj = jax.jit(step)
        t0 = time.perf_counter()
        hard, ok, eps = stepj(llr, jnp.float32(0.0))
        ok.block_until_ready()
        compile_s = time.perf_counter() - t0
        okv = bool(np.asarray(ok).all())
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            hard, ok, eps = stepj(llr, eps)
        _ = float(eps)
        ok.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        info_bits = s_batch * cbs * g.k
        print(f"{name:22s}: {dt*1e3:8.3f} ms/batch "
              f"({dt/s_batch*1e3:6.4f} ms/slot, "
              f"{info_bits/dt/1e6:7.0f} Mb/s info) ok={okv} "
              f"compile={compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
