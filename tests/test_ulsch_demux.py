"""UCI-on-PUSCH multiplexing: placement plan + end-to-end punctured decode."""

import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops import modulation, short_block, ulsch_demux
from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder, rate_match, segmenter

DATA_SYMBOLS = (3, 4, 5, 6, 7, 8, 9, 10, 12, 13)


def make_plan(g_ack=8, g_csi1=0, qm=2, re_per_symbol=72):
    g = qm * re_per_symbol * len(DATA_SYMBOLS)
    return ulsch_demux.get_demux_plan(g, qm, re_per_symbol, DATA_SYMBOLS,
                                      first_dmrs_symbol=2,
                                      g_ack=g_ack, g_csi1=g_csi1)


def test_plan_properties():
    plan = make_plan(g_ack=16, g_csi1=24)
    assert len(plan.ack_positions) == 16
    assert len(plan.csi1_positions) == 24
    # No overlap, all within G; skip mode: SCH excludes the UCI positions.
    all_pos = np.concatenate([plan.ack_positions, plan.csi1_positions])
    assert len(np.unique(all_pos)) == len(all_pos)
    assert all_pos.max() < plan.g_total
    assert plan.sch_len == plan.g_total - len(all_pos)
    assert not plan.sch_erased.any()
    assert len(np.intersect1d(plan.sch_positions, all_pos)) == 0


def test_multiplex_demultiplex_roundtrip():
    plan = make_plan(g_ack=8, g_csi1=16)
    rng = np.random.default_rng(0)
    sch = jnp.asarray(rng.integers(0, 2, (2, plan.sch_len), dtype=np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (2, 8), dtype=np.int8))
    csi = jnp.asarray(rng.integers(0, 2, (2, 16), dtype=np.int8))
    muxed = ulsch_demux.multiplex(sch, plan, ack, csi)
    llr = (1.0 - 2.0 * muxed.astype(jnp.float32)) * 9.0
    sch_llr, ack_llr, csi_llr, _ = ulsch_demux.demultiplex(llr, plan)
    np.testing.assert_array_equal((np.asarray(ack_llr) < 0).astype(int),
                                  np.asarray(ack))
    np.testing.assert_array_equal((np.asarray(csi_llr) < 0).astype(int),
                                  np.asarray(csi))
    # Skip mode: SCH bits come back exactly (no erasures).
    np.testing.assert_array_equal((np.asarray(sch_llr) < 0).astype(int),
                                  np.asarray(sch))


def test_reserved_mode_puncture():
    """o_ack <= 2 with reserved REs: SCH maps through all G positions; the
    ACK punctures reserved[j*floor(n_rvd/n_ack)] and the RX zeroes those
    SCH LLRs (erasures)."""
    qm, re_per_symbol = 2, 72
    g = qm * re_per_symbol * len(DATA_SYMBOLS)
    plan = ulsch_demux.get_demux_plan(g, qm, re_per_symbol, DATA_SYMBOLS, 2,
                                      g_ack=8, g_ack_rvd=16, o_ack=2)
    assert plan.sch_len == g
    assert plan.sch_erased.sum() == 8
    # ACK positions are a subset of the reserved placement (every other RE).
    rng = np.random.default_rng(1)
    sch = jnp.asarray(rng.integers(0, 2, (1, g), dtype=np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (1, 8), dtype=np.int8))
    muxed = ulsch_demux.multiplex(sch, plan, ack)
    llr = (1.0 - 2.0 * muxed.astype(jnp.float32)) * 9.0
    sch_llr, ack_llr, _, _ = ulsch_demux.demultiplex(llr, plan)
    np.testing.assert_array_equal((np.asarray(ack_llr) < 0).astype(int),
                                  np.asarray(ack))
    z = np.asarray(sch_llr)[0] == 0
    np.testing.assert_array_equal(z, plan.sch_erased)


def test_end_to_end_pusch_with_ack_puncture():
    """SCH survives ACK puncturing (LDPC treats reserved REs as erasures) and
    the ACK decodes via the RM detector."""
    a, qm, rate = 1992, 2, 0.4
    re_per_symbol = 132
    g_total = qm * re_per_symbol * len(DATA_SYMBOLS)
    bg = segmenter.select_base_graph(a, rate)
    seg = segmenter.get_segment_plan(a, bg, g_total, qm)
    rm = rate_match.get_rate_match_plan(seg.bg, seg.zc, seg.e[0], 0, qm,
                                        seg.k_prime)
    g_ack = 64  # 2-bit ACK coded to 64 bits (reserved/puncture mode)
    plan = ulsch_demux.get_demux_plan(g_total, qm, re_per_symbol, DATA_SYMBOLS,
                                      2, g_ack=g_ack, g_ack_rvd=g_ack,
                                      o_ack=2)
    rng = np.random.default_rng(7)
    payload = jnp.asarray(rng.integers(0, 2, (1, a), dtype=np.int8))
    ack_bits = jnp.asarray([[1, 0]], dtype=jnp.int8)

    sch_bits = rate_match.rate_match(
        encoder.encode(segmenter.segment_tb(payload, seg), seg.bg, seg.zc), rm)
    ack_coded = short_block.encode(ack_bits, g_ack)
    tx_bits = ulsch_demux.multiplex(sch_bits, plan, ack_coded)

    syms = modulation.modulate(tx_bits, "qpsk")
    nv = 10 ** (-8.0 / 10)
    noise = (rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape))
    y = jnp.asarray((np.asarray(syms) + noise * np.sqrt(nv / 2)).astype(np.complex64))
    llr = modulation.demodulate_soft(y, jnp.float32(nv), "qpsk", quantize=False)

    sch_llr, ack_llr, _, _ = ulsch_demux.demultiplex(llr, plan)
    ack_hat, _ = short_block.detect(ack_llr, 2)
    np.testing.assert_array_equal(np.asarray(ack_hat), np.asarray(ack_bits))

    full = rate_match.rate_dematch(sch_llr.reshape(-1, rm.e), rm)
    hard, ok = decoder.decode(full, seg.bg, seg.zc, num_iters=8)
    assert np.asarray(ok).all()
    out, tb_ok = segmenter.desegment_tb(hard, seg)
    assert np.asarray(tb_ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))
