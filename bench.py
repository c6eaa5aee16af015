#!/usr/bin/env python3
"""Headline benchmark: full DL+UL slot pipeline throughput on one TPU chip.

Config matches the reference's 20 MHz zmq-mode cell (106 PRB @ 23.04 Msps,
4 UEs — BASELINE.md): per slot, DL = segment+LDPC encode+rate match+scramble+
64QAM+grid+iFFT/CP for all UEs; UL = FFT+channel est+MMSE+demap+descramble+
dematch+layered min-sum decode (6 iters)+CRC.

Metric: processed baseband samples per second per chip (23040 samples per
1 ms slot, DL+UL both processed => a value of 23.04e6 means exactly
real-time).  vs_baseline divides by the reference's real-time operating
point (23.04 Msps), i.e. how many 20 MHz 4-UE full-duplex cells one chip
sustains; the srsRAN gNB runs this workload at 1.0x by construction
(real-time SDR), so vs_baseline is the per-chip cell-capacity multiple.

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
    s_batch = 16  # slots per dispatch (run-ahead pipelining analogue)
    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 2, (s_batch, 4, tbs), dtype=np.int8))
    rntis = jnp.asarray(0x4601 + np.arange(4), dtype=np.uint32)

    dl = jax.jit(lambda p: sp.dl_slot_batch(p, rntis, cell))
    ul = jax.jit(lambda s: sp.ul_slot_batch(s, rntis, cell))

    td = dl(payloads)
    payload_hat, tb_ok, _, _ = ul(td)
    ok = np.asarray(tb_ok)
    assert ok.all(), f"loopback CRC failed: {ok}"
    assert (np.asarray(payload_hat) == np.asarray(payloads)).all()

    def timeit(fn, arg, iters=20):
        out = fn(arg)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(arg)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        return (time.perf_counter() - t0) / iters

    dl_s = timeit(dl, payloads)
    ul_s = timeit(ul, td)
    slot_s = (dl_s + ul_s) / s_batch

    slot_samples = t.cp.total  # 23040 @ 20 MHz
    samples_per_sec = slot_samples / slot_s
    realtime = slot_samples * 1000.0  # 1 ms slots => 23.04 Msps

    print(json.dumps({
        "metric": "slot_pipeline_samples_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s/chip (20MHz 4UE DL+UL)",
        "vs_baseline": round(samples_per_sec / realtime, 3),
    }))
    print(f"# S={s_batch}: dl {dl_s*1e3:.3f} ms, ul {ul_s*1e3:.3f} ms per batch "
          f"-> {slot_s*1e3:.3f} ms/slot; TBS {tbs} x 4 UE; coded throughput "
          f"{2 * 4 * tbs / slot_s / 1e6:.0f} Mbit/s", file=sys.stderr)


if __name__ == "__main__":
    main()
