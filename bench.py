#!/usr/bin/env python3
"""Headline benchmark: full DL+UL slot pipeline throughput on one TPU chip.

Config matches the reference's 20 MHz zmq-mode cell (106 PRB @ 23.04 Msps,
4 UEs — BASELINE.md): per slot, DL = segment+LDPC encode+rate match+scramble+
64QAM+grid+iFFT/CP for all UEs; UL = FFT+channel est+MMSE+demap+descramble+
dematch+layered min-sum decode (6 iters)+CRC.

Timing methodology: every iteration's input carries a data dependency on the
previous iteration's output (the TPU relay on this machine caches identical
execution requests, so constant-input loops measure nothing), with a host
sync only at the end.

The UL direction passes through AWGN at 25 dB SNR (comfortably above the
64QAM r0.5 operating point, so payload recovery stays exact) rather than a
noiseless wire: the decoder's syndrome early stop then runs a realistic
iteration count instead of converging instantly.  `--clean` disables the
channel for A/B timing.

Metric: processed baseband samples per second per chip (23040 samples per
1 ms slot, DL+UL both processed => 23.04e6 = exactly real-time).
vs_baseline divides by the reference system's real-time operating point:
how many 20 MHz 4-UE full-duplex cells' PHY one chip sustains (the srsRAN
gNB runs this workload at 1.0x by construction as a real-time SDR).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    cell = sp.CellConfig(nof_prb=106, nfft=1536, nof_ue=4, prb_per_ue=26,
                         modulation="qam64", target_rate=0.5)
    t = cell.timing
    tbs = cell.derived_tbs()
    # Slots per dispatch (run-ahead pipelining analogue).  Measured on v5e:
    # S=16 0.262 ms/slot, S=32 0.166, S=64 0.138, S=128 0.110, and after the
    # decode-side optimizations the knee moved: S=128 0.052 vs S=256 0.051
    # (19.75x) — the batch amortizes per-layer overheads.  S=256 = 256 ms of
    # run-ahead buffering: a throughput-serving operating point (the
    # real-time analogue of the reference's nof_slot_tti_in_advance
    # headroom, scaled to batch mode); use --sbatch=8/16 for
    # latency-constrained operation.
    s_batch = 256
    n_cells = 1
    for a in sys.argv:
        if a.startswith("--sbatch="):
            s_batch = int(a.split("=")[1])
        if a.startswith("--cells="):
            n_cells = int(a.split("=")[1])
        if a.startswith("--fft="):
            # --fft=mmdft[:default|high|highest] selects the MXU matmul-DFT
            # slot transform (tools/tpu_fft_ab.py measurements).
            from srsran_edgeric_5g_tpu.ops import ofdm as _ofdm
            spec = a.split("=")[1].split(":")
            _ofdm.set_fft_impl(spec[0], spec[1] if len(spec) > 1 else "default")
    rng = np.random.default_rng(0)
    # --cells=N processes N independent carriers per dispatch (the per-cell
    # PHY instances of the reference, vmapped): same amortization as a deep
    # slot batch but the run-ahead latency stays at s_batch slots.
    pshape = (s_batch, 4, tbs) if n_cells == 1 else (n_cells, s_batch, 4, tbs)
    payloads = jnp.asarray(rng.integers(0, 2, pshape, dtype=np.int8))
    rntis = jnp.asarray((0x4601 + np.arange(4 * n_cells)).astype(np.uint32))
    if n_cells > 1:
        rntis = rntis.reshape(n_cells, 4)

    snr_db = None if "--clean" in sys.argv else 25.0

    # The radio hands the receiver NOISY samples: AWGN *generation* is test
    # harness, not pipeline (it was ~9% of device time when drawn with the
    # HW RNG inside the timed step).  Pre-generate one device-resident noise
    # tensor at setup; the timed step applies it with a single fused
    # add — sign-alternated through the chain so successive iterations see
    # different (but statistically identical) noise and the relay cannot
    # dedup.  Payload-exactness is still asserted every setup run.
    @jax.jit
    def make_noise(p, key):
        # Returned as separate re/im f32 planes: a c64 noise *argument* to
        # the timed step costs a per-iteration layout copy plus an
        # X64SplitHigh plane split (~4.5% of device time in the xplane
        # profile); planar f32 planes fuse straight into the add.
        td = (sp.dl_slot_batch(p, rntis, cell) if n_cells == 1
              else sp.multi_cell_dl_slot_batch(p, rntis, cell))
        sig_pow = jnp.mean(jnp.abs(td) ** 2)
        sigma = jnp.sqrt(sig_pow * 10.0 ** (-snr_db / 10.0) / 2.0)
        n = jax.random.normal(key, td.shape + (2,), jnp.float32) * sigma
        return n[..., 0], n[..., 1]

    noise = (make_noise(payloads, jax.random.key(42, impl="rbg"))
             if snr_db is not None else None)

    @jax.jit
    def step(p, eps, flip, noise):
        """One DL+UL (multi-cell) slot-batch with a chained perturbation.
        (noise passed as a pair of f32 plane arguments: the axon backend
        cannot close jits over concrete complex device arrays, and a c64
        argument costs a layout copy + plane split every iteration.)"""
        p = jnp.bitwise_xor(p, eps)            # eps == 0, but data-dependent
        nr, ni = noise

        def add_noise(td):
            if snr_db is None:
                return td
            return jax.lax.complex(jnp.real(td) + nr * flip,
                                   jnp.imag(td) + ni * flip)

        if n_cells == 1:
            td = add_noise(sp.dl_slot_batch(p, rntis, cell))
            payload_hat, tb_ok, nv, cfo, _ = sp.ul_slot_batch(td, rntis, cell)
            eps_next = (payload_hat[0, 0, 0] & jnp.int8(0))
        else:
            td = add_noise(sp.multi_cell_dl_slot_batch(p, rntis, cell))
            payload_hat, tb_ok, nv, cfo, _ = sp.multi_cell_ul_slot_batch(
                td, rntis, cell)
            eps_next = (payload_hat[0, 0, 0, 0] & jnp.int8(0))
        return payload_hat, tb_ok, eps_next, -flip

    if noise is None:
        noise = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    eps = jnp.int8(0)
    key = jnp.float32(1.0)  # noise sign flip, chained
    payload_hat, tb_ok, eps, key = step(payloads, eps, key, noise)
    ok = np.asarray(tb_ok)
    assert ok.all(), f"loopback CRC failed: {ok}"
    assert (np.asarray(payload_hat) == np.asarray(payloads)).all()

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        payload_hat, tb_ok, eps, key = step(payloads, eps, key, noise)
    _ = int(eps)  # host sync through the dependency chain
    tb_ok.block_until_ready()
    slot_s = (time.perf_counter() - t0) / (iters * s_batch * n_cells)

    slot_samples = t.cp.total  # 23040 @ 20 MHz
    samples_per_sec = slot_samples / slot_s
    realtime = slot_samples * 1000.0  # 1 ms slots => 23.04 Msps

    print(json.dumps({
        "metric": "slot_pipeline_samples_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s/chip (20MHz 4UE DL+UL)",
        "vs_baseline": round(samples_per_sec / realtime, 3),
    }))
    print(f"# chained timing, S={s_batch} x {n_cells} cell(s): "
          f"{slot_s*1e3:.3f} ms/cell-slot; TBS {tbs} x 4 UE; "
          f"coded throughput {2 * 4 * tbs / slot_s / 1e6:.0f} Mbit/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
