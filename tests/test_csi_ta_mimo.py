import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import csi_rs, equalizer, ta_estimator


# ------------------------------------------------------------ TA estimator

@pytest.mark.parametrize("delay_s", [0.0, 1e-6, -0.5e-6, 2.3e-6])
def test_ta_from_linear_phase(delay_s):
    scs = 15e3
    nsubc = 624
    k = np.arange(nsubc)
    h = np.exp(-2j * np.pi * k * scs * delay_s).astype(np.complex64)
    ta = float(ta_estimator.estimate_ta(jnp.asarray(h[None]), scs)[0])
    assert ta == pytest.approx(delay_s, abs=3e-8)


def test_ta_with_noise():
    rng = np.random.default_rng(0)
    scs = 15e3
    nsubc = 312
    delay_s = 0.8e-6
    k = np.arange(nsubc)
    h = np.exp(-2j * np.pi * k * scs * delay_s)
    h = h + (rng.normal(size=nsubc) + 1j * rng.normal(size=nsubc)) * 0.1
    ta = float(ta_estimator.estimate_ta(jnp.asarray(h[None].astype(np.complex64)),
                                        scs)[0])
    assert ta == pytest.approx(delay_s, abs=5e-8)


@pytest.mark.parametrize("delay_s", [0.0, 1e-6, -0.5e-6, 2.3e-6])
def test_ta_windowed_matmul_matches_fft(delay_s):
    """The max_ta_s matmul path evaluates the SAME 4096-point IDFT bins as
    the zero-padded FFT path — identical estimates inside the window."""
    rng = np.random.default_rng(3)
    scs = 30e3                      # pilot-spaced channel (gap=2)
    nsubc = 156
    k = np.arange(nsubc)
    h = np.exp(-2j * np.pi * k * scs * delay_s)
    h = h + (rng.normal(size=nsubc) + 1j * rng.normal(size=nsubc)) * 0.05
    h = jnp.asarray(h[None].astype(np.complex64))
    ta_fft = float(ta_estimator.estimate_ta(h, scs)[0])
    ta_win = float(ta_estimator.estimate_ta(h, scs, max_ta_s=2.5e-6)[0])
    assert ta_win == pytest.approx(ta_fft, abs=2e-9)
    assert ta_win == pytest.approx(delay_s, abs=5e-8)


# ----------------------------------------------------------------- CSI-RS

def test_csi_rs_map_and_estimate():
    cfg = csi_rs.CsiRsConfig(scrambling_id=41, slot=3, symbol=5, start_prb=2,
                             nof_prb=8, density=1, comb_offset=1)
    grid = jnp.zeros((1, 14, 312), jnp.complex64)
    grid = csi_rs.map_csi_rs(grid, cfg)
    sc = csi_rs.csi_rs_subcarriers(cfg)
    assert sc[0] == 25 and len(sc) == 8
    # Flat channel h=0.7-0.2j: estimate recovers it at the pilots.
    h = np.complex64(0.7 - 0.2j)
    est = csi_rs.csi_rs_estimate(grid * h, cfg)
    np.testing.assert_allclose(np.asarray(est)[0], np.full(8, h), atol=1e-6)


def test_csi_rs_density3():
    cfg = csi_rs.CsiRsConfig(scrambling_id=1, slot=0, symbol=4, start_prb=0,
                             nof_prb=2, density=3)
    sc = csi_rs.csi_rs_subcarriers(cfg)
    np.testing.assert_array_equal(sc, [0, 4, 8, 12, 16, 20])


# -------------------------------------------------------------------- SRS

def test_srs_map_and_estimate():
    cfg = csi_rs.SrsConfig(sequence_id=7, slot=1, symbol=13, start_prb=0,
                           nof_prb=8, comb=2, cyclic_shift=3)
    grid = jnp.zeros((14, 96), jnp.complex64)
    grid = csi_rs.map_srs(grid, cfg)
    seq = csi_rs.srs_sequence(cfg)
    np.testing.assert_allclose(np.abs(seq), 1.0, atol=1e-6)
    h_true = np.complex64(0.5 + 0.9j)
    h, snr = csi_rs.srs_estimate(grid * h_true, cfg)
    np.testing.assert_allclose(np.asarray(h), np.full(cfg.m_sc, h_true), atol=1e-6)
    assert float(snr) > 40  # noiseless


def test_srs_snr_with_noise():
    cfg = csi_rs.SrsConfig(sequence_id=3, slot=0, symbol=12, start_prb=0,
                           nof_prb=16, comb=2)
    rng = np.random.default_rng(1)
    grid = jnp.zeros((14, 192), jnp.complex64)
    grid = csi_rs.map_srs(grid, cfg)
    noise = (rng.normal(size=(14, 192)) + 1j * rng.normal(size=(14, 192))) * 0.1
    rx = jnp.asarray((np.asarray(grid) + noise).astype(np.complex64))
    _, snr = csi_rs.srs_estimate(rx, cfg)
    assert 10 < float(snr) < 25  # sigma^2=0.02 -> ~17 dB


# ------------------------------------------------------------- 2xN MMSE

def test_mmse_2x2_separates_layers():
    rng = np.random.default_rng(2)
    n = 256
    h = (rng.normal(size=(2, 2, n)) + 1j * rng.normal(size=(2, 2, n))
         ).astype(np.complex64)
    x = (rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
         ).astype(np.complex64)
    y = np.einsum("plr,lr->pr", h, x)
    nv = np.full((2, n), 1e-4, np.float32)
    xh, nvo = equalizer.equalize_mmse_2xn(jnp.asarray(y), jnp.asarray(h),
                                          jnp.asarray(nv))
    np.testing.assert_allclose(np.asarray(xh), x, atol=0.05)
    assert (np.asarray(nvo) > 0).all()


def test_mmse_2xn_more_ports_reduces_noise():
    rng = np.random.default_rng(3)
    n = 512
    nv_val = 0.05

    def run(ports):
        h = (rng.normal(size=(ports, 2, n)) + 1j * rng.normal(size=(ports, 2, n))
             ).astype(np.complex64) / np.sqrt(2)
        x = (rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
             ).astype(np.complex64)
        noise = (rng.normal(size=(ports, n)) + 1j * rng.normal(size=(ports, n))
                 ) * np.sqrt(nv_val / 2)
        y = np.einsum("plr,lr->pr", h, x) + noise
        xh, nvo = equalizer.equalize_mmse_2xn(
            jnp.asarray(y.astype(np.complex64)), jnp.asarray(h),
            jnp.full((ports, n), nv_val, np.float32))
        return np.mean(np.abs(np.asarray(xh) - x) ** 2), np.mean(np.asarray(nvo))

    mse2, nvo2 = run(2)
    mse4, nvo4 = run(4)
    assert mse4 < mse2
    assert nvo4 < nvo2