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
