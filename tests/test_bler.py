"""Statistical BLER validation of the coded chain over AWGN.

The reference validates its decoder with encode->noise->decode round trips
(ldpc_enc_dec_test.cpp) and BLER-vs-SNR integration tests (pxsch_bler_test).
Here: the full segment->encode->rate-match->QPSK->AWGN->demap->dematch->
decode chain must show a falling BLER waterfall in the expected SNR region
for rate-1/2 QPSK (Shannon limit ~0 dB Es/N0; LDPC at this blocklength
converges within ~2-3 dB of it).
"""

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops import modulation
from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder, rate_match, segmenter


def run_bler_point(snr_db, n_blocks=48, a=1000, rate=0.5, seed=0):
    qm = 2
    g_total = int(a / rate) // qm * qm
    bg = segmenter.select_base_graph(a, rate)
    plan = segmenter.get_segment_plan(a, bg, g_total, qm)
    rm = rate_match.get_rate_match_plan(plan.bg, plan.zc, plan.e[0], 0, qm,
                                        plan.k_prime)
    rng = np.random.default_rng(seed)
    payload = jnp.asarray(rng.integers(0, 2, (n_blocks, a), dtype=np.int8))
    cbs = segmenter.segment_tb(payload, plan)
    cw = encoder.encode(cbs, plan.bg, plan.zc)
    tx = rate_match.rate_match(cw, rm)
    syms = np.asarray(modulation.modulate(tx, "qpsk"))
    nv = 10 ** (-snr_db / 10)
    noise = (rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape))
    y = jnp.asarray((syms + noise * np.sqrt(nv / 2)).astype(np.complex64))
    llr = modulation.demodulate_soft(y, jnp.float32(nv), "qpsk", quantize=False)
    full = rate_match.rate_dematch(llr.reshape(-1, rm.e), rm)
    _, ok = decoder.decode(full, plan.bg, plan.zc, num_iters=8)
    ok = np.asarray(ok).reshape(n_blocks, plan.c).all(axis=1)
    return 1.0 - ok.mean()


def test_bler_waterfall():
    bler_low = run_bler_point(snr_db=0.0)    # below waterfall: mostly errors
    bler_mid = run_bler_point(snr_db=2.5)
    bler_high = run_bler_point(snr_db=4.0)   # above waterfall: error-free
    assert bler_low > 0.9, bler_low
    assert bler_high == 0.0, bler_high
    assert bler_low >= bler_mid >= bler_high


def test_int8_llr_path_matches_float():
    """Quantized int8 LLRs (the reference's wire format) decode equally at
    moderate SNR."""
    a, rate, qm = 800, 0.4, 2
    g_total = int(a / rate) // qm * qm
    bg = segmenter.select_base_graph(a, rate)
    plan = segmenter.get_segment_plan(a, bg, g_total, qm)
    rm = rate_match.get_rate_match_plan(plan.bg, plan.zc, plan.e[0], 0, qm,
                                        plan.k_prime)
    rng = np.random.default_rng(5)
    payload = jnp.asarray(rng.integers(0, 2, (16, a), dtype=np.int8))
    cw = encoder.encode(segmenter.segment_tb(payload, plan), plan.bg, plan.zc)
    syms = np.asarray(modulation.modulate(rate_match.rate_match(cw, rm), "qpsk"))
    nv = 10 ** (-3.0 / 10)
    noise = (rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape))
    y = jnp.asarray((syms + noise * np.sqrt(nv / 2)).astype(np.complex64))
    llr_f = modulation.demodulate_soft(y, jnp.float32(nv), "qpsk", quantize=False)
    llr_q = modulation.demodulate_soft(y, jnp.float32(nv), "qpsk").astype(jnp.float32)
    for llr in (llr_f, llr_q):
        full = rate_match.rate_dematch(llr.reshape(-1, rm.e), rm)
        _, ok = decoder.decode(full, plan.bg, plan.zc, num_iters=8)
        assert np.asarray(ok).all()
