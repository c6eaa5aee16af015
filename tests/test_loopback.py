"""End-to-end slot loopback: the SURVEY §7 'minimum end-to-end slice'.

PDSCH TX chain -> OFDM modulate -> (channel: delay/scale/AWGN) -> OFDM
demodulate -> PUSCH RX chain -> payload recovered, TB CRC OK.  Everything
composed from the public package API, mirroring the reference's zmq-mode
single-UE loop (10 MHz / 52 PRB cell, configs/zmq-mode.yml).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.models import pdsch, pusch
from srsran_edgeric_5g_tpu.ops import ofdm
from srsran_edgeric_5g_tpu.ran import numerology as num


def make_cfg(**kw):
    base = dict(rnti=0x4601, nof_prb=24, start_prb=4, first_symbol=2,
                nof_symbols=12, dmrs_symbols=(2, 11), modulation="qam16",
                target_rate=0.4, n_id=1, slot=0)
    base.update(kw)
    return pdsch.PdschConfig(**base)


def run_loopback(cfg, snr_db, seed=0, delay_samples=0, scale=1.0):
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(seed)
    tbs = cfg.derived_tbs()
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))

    grid = pdsch.process(payload, cfg, t.nsymb, t.nof_subc)
    td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)

    sig_power = float(jnp.mean(jnp.abs(td) ** 2))
    nv_time = sig_power * 10 ** (-snr_db / 10)
    noise = (rng.normal(size=td.shape) + 1j * rng.normal(size=td.shape))
    rx_td = np.roll(np.asarray(td), delay_samples) * scale \
        + noise.astype(np.complex64) * np.sqrt(nv_time / 2)

    rx_grid = ofdm.demodulate_slot(jnp.asarray(rx_td.astype(np.complex64)), t,
                                   scale=1.0)
    times = np.asarray(t.cp.data_starts) / t.srate
    # The matched DL pair: gNB pdsch.process TX -> UE-side pdsch.receive
    # (0 dB DM-RS EPRE on both ends).
    res = pdsch.receive(rx_grid, cfg, t.srate, times)
    return payload, res, tbs


def test_noiseless_loopback():
    cfg = make_cfg()
    payload, res, tbs = run_loopback(cfg, snr_db=200.0)
    assert np.asarray(res.cb_crc_ok).all()
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))


def test_awgn_loopback_16qam():
    cfg = make_cfg()
    payload, res, _ = run_loopback(cfg, snr_db=14.0, seed=3)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))
    # Noise estimate should land near the per-RE noise variance.
    assert np.isfinite(float(res.noise_var))


def test_loopback_with_delay_within_cp():
    """A small time offset inside the CP is absorbed by channel estimation."""
    cfg = make_cfg()
    payload, res, _ = run_loopback(cfg, snr_db=18.0, seed=5, delay_samples=5)
    assert np.asarray(res.tb_crc_ok).all()


def test_loopback_with_flat_gain():
    cfg = make_cfg()
    payload, res, _ = run_loopback(cfg, snr_db=16.0, seed=7, scale=0.5)
    assert np.asarray(res.tb_crc_ok).all()


def test_loopback_qam64_20mhz_full_band():
    t20 = num.CELL_20MHZ
    cfg = make_cfg(nof_prb=100, start_prb=3, modulation="qam64",
                   target_rate=0.5)
    t = num.slot_timing(**t20)
    rng = np.random.default_rng(11)
    tbs = cfg.derived_tbs()
    assert tbs > 30000, tbs  # a real multi-codeblock TB (C=5 at BG1)
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))
    # Proper UL pair (pusch.transmit's 3 dB DM-RS boost matches the
    # receiver's beta): the old DL-TX-into-PUSCH-RX mismatch survived only
    # because the unquantized float decode had ~3 dB of slack the
    # reference's int8 wire (now replicated exactly) does not.
    grid = pusch.transmit(payload, cfg, t.nsymb, t.nof_subc)
    td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)
    sig_power = float(jnp.mean(jnp.abs(td) ** 2))
    nv_time = sig_power * 10 ** (-22.0 / 10)
    noise = (rng.normal(size=td.shape) + 1j * rng.normal(size=td.shape))
    rx = jnp.asarray((np.asarray(td) + noise * np.sqrt(nv_time / 2)).astype(np.complex64))
    rx_grid = ofdm.demodulate_slot(rx, t, scale=1.0)
    times = np.asarray(t.cp.data_starts) / t.srate
    res = pusch.process(rx_grid, cfg, t.srate, times)
    assert np.asarray(res.cb_crc_ok).all()
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))


def test_dl_receive_high_rate():
    """UE-side PDSCH receive at rate 0.75 / 64QAM: the DM-RS-beta-matched
    DL pair decodes where a PUSCH-conventions receiver (sqrt(2) estimator
    de-boost on an unboosted DL transmit) fails even at high SNR."""
    cfg = make_cfg(modulation="qam64", target_rate=0.75)
    payload, res, _ = run_loopback(cfg, snr_db=30.0, seed=11)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))

    # Sanity: the mismatched pairing really does fail at this rate.
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(11)
    p = jnp.asarray(rng.integers(0, 2, (1, cfg.derived_tbs()), dtype=np.int8))
    td = ofdm.modulate_slot(pdsch.process(p, cfg, t.nsymb, t.nof_subc), t,
                            scale=1.0 / t.nfft)
    rx_grid = ofdm.demodulate_slot(td, t, scale=1.0)
    times = np.asarray(t.cp.data_starts) / t.srate
    bad = pusch.process(rx_grid, cfg, t.srate, times)
    assert not np.asarray(bad.tb_crc_ok).all()


def test_dl_harq_retransmission():
    """DL HARQ: rv0 fails at low SNR, rv2 retransmission combines in the
    UE-side soft buffer and decodes (the srsue softbuffer role)."""
    cfg = make_cfg(modulation="qam16", target_rate=0.6)
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(17)
    payload = jnp.asarray(rng.integers(0, 2, (1, cfg.derived_tbs()),
                                       dtype=np.int8))
    snr_db = 6.5
    times = np.asarray(t.cp.data_starts) / t.srate

    def one_tx(seed, soft, rv):
        grid = pdsch.process(payload, cfg, t.nsymb, t.nof_subc, rv=rv)
        td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)
        rngl = np.random.default_rng(seed)
        nv = float(jnp.mean(jnp.abs(td) ** 2)) * 10 ** (-snr_db / 10)
        noise = rngl.normal(size=td.shape) + 1j * rngl.normal(size=td.shape)
        rx = jnp.asarray((np.asarray(td) + noise * np.sqrt(nv / 2))
                         .astype(np.complex64))
        rx_grid = ofdm.demodulate_slot(rx, t, scale=1.0)
        return pdsch.receive(rx_grid, cfg, t.srate, times, rv=rv,
                             soft_buffer=soft)

    r1 = one_tx(1, None, rv=0)
    r2 = one_tx(2, r1.soft_buffer, rv=2)
    assert np.asarray(r2.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(r2.payload), np.asarray(payload))


def test_harq_soft_combining():
    """A TB that fails at very low SNR decodes after combining a retransmission."""
    cfg = make_cfg(modulation="qam16", target_rate=0.6)
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(13)
    tbs = cfg.derived_tbs()
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))
    snr_db = 6.5  # too low for rate 0.6 / 16QAM in one shot

    def one_tx(seed, soft, rv):
        grid = pdsch.process(payload, cfg, t.nsymb, t.nof_subc, rv=rv)
        td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)
        rngl = np.random.default_rng(seed)
        sig_power = float(jnp.mean(jnp.abs(td) ** 2))
        nv_time = sig_power * 10 ** (-snr_db / 10)
        noise = (rngl.normal(size=td.shape) + 1j * rngl.normal(size=td.shape))
        rx = jnp.asarray((np.asarray(td) + noise * np.sqrt(nv_time / 2)).astype(np.complex64))
        rx_grid = ofdm.demodulate_slot(rx, t, scale=1.0)
        times = np.asarray(t.cp.data_starts) / t.srate
        return pusch.process(rx_grid, cfg, t.srate, times, rv=rv, soft_buffer=soft)

    r1 = one_tx(1, None, rv=0)
    r2 = one_tx(2, r1.soft_buffer, rv=2)
    assert np.asarray(r2.tb_crc_ok).all(), (
        f"1st tx ok={bool(np.asarray(r1.tb_crc_ok))}, "
        f"2nd (combined) must pass")
    np.testing.assert_array_equal(np.asarray(r2.payload), np.asarray(payload))


def test_lbrm_loopback():
    """Limited-buffer rate matching: TBS_LBRM shortens N_cb below N (buffer
    wrap at high E, shifted rv k0); the loopback stays exact."""
    from srsran_edgeric_5g_tpu.models.pdsch import _plans
    from srsran_edgeric_5g_tpu.ops.ldpc import rate_match as rm_mod

    cfg = make_cfg(modulation="qam16", target_rate=0.6, tbs_lbrm=6500)
    seg, _ = _plans(cfg, 0)
    n_cb = rm_mod.lbrm_n_cb(seg.bg, seg.zc, seg.c, cfg.tbs_lbrm)
    full_n = rm_mod.lbrm_n_cb(seg.bg, seg.zc, seg.c, 10**9)
    assert n_cb < full_n, (n_cb, full_n)
    # rv=2 start position honours the shortened buffer.
    assert rm_mod.k0_offset(seg.bg, 2, n_cb, seg.zc) != \
        rm_mod.k0_offset(seg.bg, 2, full_n, seg.zc)

    payload, res, _ = run_loopback(cfg, snr_db=28.0, seed=3)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))


def test_dfts_ofdm_loopback():
    """Transform-precoded (DFT-s-OFDM) PUSCH: TX DFT spread, RX iDFT
    despread after MMSE; survives AWGN + a multipath-ish flat gain, and the
    time-domain PAPR drops vs plain OFDM."""
    cfg = make_cfg(modulation="qam16", target_rate=0.4,
                   transform_precoding=True)
    payload, res, _ = run_loopback(cfg, snr_db=16.0, seed=21)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))

    # Single-carrier property: data-symbol PAPR strictly below plain OFDM's.
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(3)
    tbs = cfg.derived_tbs()
    p = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))

    def papr(c):
        td = np.asarray(ofdm.modulate_slot(
            pdsch.process(p, c, t.nsymb, t.nof_subc), t, scale=1.0 / t.nfft))
        pw = np.abs(td) ** 2
        return pw.max() / pw.mean()

    assert papr(cfg) < papr(make_cfg(modulation="qam16", target_rate=0.4))


def test_uci_on_pusch_model_loopback():
    """UCI piggybacked on PUSCH through the model API: ACK + CSI1 punch
    through the SCH stream; the receiver recovers payload AND both UCI
    fields through AWGN."""
    from srsran_edgeric_5g_tpu.models import pusch as pusch_mod

    cfg = make_cfg(modulation="qam16", target_rate=0.4)
    uci = pusch_mod.UciConfig(n_ack=2, g_ack=32, n_csi1=4, g_csi1=64,
                              n_csi2=6, g_csi2=96)
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(31)
    tbs = cfg.derived_tbs()
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (1, 2), dtype=np.int8))
    csi = jnp.asarray(rng.integers(0, 2, (1, 4), dtype=np.int8))
    csi2 = jnp.asarray(rng.integers(0, 2, (1, 6), dtype=np.int8))

    grid = pusch_mod.transmit(payload, cfg, t.nsymb, t.nof_subc,
                              uci=uci, ack_bits=ack, csi1_bits=csi,
                              csi2_bits=csi2)
    td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)
    sig = float(jnp.mean(jnp.abs(td) ** 2))
    nv = sig * 10 ** (-16.0 / 10)
    noise = (rng.normal(size=td.shape) + 1j * rng.normal(size=td.shape))
    rx = jnp.asarray((np.asarray(td) + noise * np.sqrt(nv / 2))
                     .astype(np.complex64))
    rx_grid = ofdm.demodulate_slot(rx, t, scale=1.0)
    times = np.asarray(t.cp.data_starts) / t.srate
    res = pusch_mod.process(rx_grid, cfg, t.srate, times, uci=uci)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))
    np.testing.assert_array_equal(np.asarray(res.ack_bits), np.asarray(ack))
    np.testing.assert_array_equal(np.asarray(res.csi1_bits), np.asarray(csi))
    np.testing.assert_array_equal(np.asarray(res.csi2_bits), np.asarray(csi2))


def test_transmit_equals_pdsch_process_without_uci():
    cfg = make_cfg()
    from srsran_edgeric_5g_tpu.models import pusch as pusch_mod
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(1)
    payload = jnp.asarray(rng.integers(0, 2, (1, cfg.derived_tbs()),
                                       dtype=np.int8))
    g1 = np.asarray(pusch_mod.transmit(payload, cfg, t.nsymb, t.nof_subc))
    g2 = np.asarray(pdsch.process(payload, cfg, t.nsymb, t.nof_subc))
    # Data REs identical; PUSCH DM-RS rides 3 dB above the PDSCH DM-RS
    # (TS 38.214, 2 CDM groups without data).
    from srsran_edgeric_5g_tpu.ops import dmrs as dmrs_mod
    pat = dmrs_mod.dmrs_pattern(1, cfg.nof_prb, port=0)
    dm = np.zeros(g1.shape, bool)
    for l in cfg.dmrs_symbols:
        dm[l, pat.subcarriers + cfg.start_prb * 12] = True
    np.testing.assert_allclose(g1[~dm], g2[~dm], atol=1e-6)
    np.testing.assert_allclose(g1[dm], g2[dm] * np.sqrt(2.0), atol=1e-5)


def test_loopback_with_cfo():
    """PUSCH through a 2-tap channel + 300 Hz CFO: the estimated CFO is
    compensated on the data symbols (estimates are anchored at t=0 by the
    pilot derotation; the reference instead re-applies the ramp per symbol,
    port_channel_estimator_average_impl.cpp:245-253).  Regression for the
    round-2 chest BLER A/B finding: before the fix ANY real CFO failed every
    TB while the CFO estimate itself read exactly right."""
    cfg = make_cfg(nof_prb=24, start_prb=4, modulation="qam16",
                   target_rate=0.4)
    t = num.slot_timing(nof_prb=52, nfft=768, mu=0)
    times = np.asarray(t.cp.data_starts) / t.srate
    rng = np.random.default_rng(17)
    payload = jnp.asarray(rng.integers(0, 2, (1, cfg.derived_tbs()),
                                       dtype=np.int8))
    grid = pdsch.process(payload, cfg, t.nsymb, t.nof_subc)

    k = np.arange(t.nof_subc)
    h = (np.exp(-2j * np.pi * 15e3 * k * 100e-9)
         + 0.4 * np.exp(-2j * np.pi * 15e3 * k * 300e-9))
    rot = np.exp(2j * np.pi * 300.0 * times[:t.nsymb])
    ch = (rot[:, None] * h[None, :]).astype(np.complex64)
    sig = np.abs(np.asarray(grid))[np.asarray(grid) != 0].mean() ** 2
    noise = (rng.normal(size=grid.shape) + 1j * rng.normal(size=grid.shape))
    rx = jnp.asarray((np.asarray(grid) * ch
                      + noise * np.sqrt(sig * 10 ** -2.2 / 2)
                      ).astype(np.complex64))

    res = pusch.process(rx, cfg, t.srate, times)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload),
                                  np.asarray(payload))
    assert abs(float(np.asarray(res.cfo_hz)) - 300.0) < 30.0
