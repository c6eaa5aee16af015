#!/usr/bin/env python3
"""BLER vs SNR sweep of the full coded chain (segment -> LDPC -> RM -> QAM ->
AWGN -> demap (int8 wire) -> dematch -> decode -> TB CRC) per MCS.

The validation counterpart of the reference's pxsch_bler_test: waterfalls
must sit a small implementation margin right of channel capacity for each
MCS.  Writes a markdown table; run on CPU for reproducibility:

  JAX_PLATFORMS=cpu PYTHONPATH=. python tools/bler_sweep.py [out.md]
"""

import sys

import numpy as np


def run_point(mcs_idx, snr_db, n_blocks, rng, nof_prb=52):
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.ops import modulation
    from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder, rate_match, segmenter
    from srsran_edgeric_5g_tpu.ran import tbs as tbs_mod

    mcs = tbs_mod.mcs_config(mcs_idx, "qam64")
    nre = tbs_mod.nof_re(nof_prb, 12, 12)
    a = tbs_mod.tbs(nre, mcs.target_rate, mcs.qm)
    g_total = nre * mcs.qm
    bg = segmenter.select_base_graph(a, mcs.target_rate)
    seg = segmenter.get_segment_plan(a, bg, g_total, mcs.qm)
    rm = rate_match.get_rate_match_plan(seg.bg, seg.zc, seg.e[0], 0, mcs.qm,
                                        seg.k_prime)
    payload = jnp.asarray(rng.integers(0, 2, (n_blocks, a), dtype=np.int8))
    cw = encoder.encode(segmenter.segment_tb(payload, seg), seg.bg, seg.zc)
    syms = np.asarray(modulation.modulate(rate_match.rate_match(cw, rm),
                                          mcs.modulation))
    nv = 10 ** (-snr_db / 10)
    noise = (rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape))
    y = jnp.asarray((syms + noise * np.sqrt(nv / 2)).astype(np.complex64))
    # int8 wire-format LLRs like the reference.
    llr = modulation.demodulate_soft(y, jnp.float32(nv), mcs.modulation
                                     ).astype(jnp.float32)
    full = rate_match.rate_dematch(llr.reshape(-1, rm.e), rm)
    hard, _ = decoder.decode(full, seg.bg, seg.zc, num_iters=8)
    _, tb_ok = segmenter.desegment_tb(hard, seg)
    return a, mcs, 1.0 - np.asarray(tb_ok).mean()


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BLER_R1.md"
    cases = {
        4: [-1.0, 0.0, 1.0, 2.0, 3.0],        # QPSK r~0.3
        15: [5.0, 6.0, 7.0, 8.0, 9.0],        # 16QAM r~0.6
        24: [14.0, 15.0, 16.0, 17.0, 18.0],   # 64QAM r~0.75
    }
    rng = np.random.default_rng(0)
    lines = ["# BLER vs SNR (full coded chain, int8 LLR wire, 8 iterations,",
             "# 52 PRB 12-symbol allocation, AWGN, 64 TBs/point)", "",
             "| MCS | mod | rate | TBS | " +
             " | ".join(f"{s:+.0f} dB" for s in list(cases.values())[0]) + " |",
             "|---|---|---|---|" + "---|" * 5]
    for mcs_idx, snrs in cases.items():
        blers = []
        a = m = None
        for snr in snrs:
            a, m, bler = run_point(mcs_idx, snr, 64, rng)
            blers.append(bler)
            print(f"MCS{mcs_idx} snr={snr:+.1f}: BLER {bler:.3f}", flush=True)
        lines.append(f"| {mcs_idx} | {m.modulation} | {m.target_rate:.2f} | {a} | "
                     + " | ".join(f"{b:.3f}" for b in blers) + " |")
        assert blers[-1] <= blers[0], "waterfall must fall with SNR"
    lines.append("")
    lines.append("SNR columns per row correspond to that row's sweep range "
                 "(QPSK -1..3, 16QAM 5..9, 64QAM 14..18 dB).")
    open(out_path, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
