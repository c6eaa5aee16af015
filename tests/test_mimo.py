"""Multi-layer MIMO end-to-end: layer map -> CDM DM-RS (both type-1 CDM
groups at 4 layers) -> LxN channel -> OCC-separated estimation -> 2x2 /
general LxN MMSE -> decode."""

import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.models import mimo, pdsch
from srsran_edgeric_5g_tpu.ops import equalizer
from srsran_edgeric_5g_tpu.ran import numerology as num


def _cfg(**kw):
    base = dict(rnti=0x31, nof_prb=24, start_prb=4, modulation="qam16",
                target_rate=0.4)
    base.update(kw)
    return pdsch.PdschConfig(**base)


def _run(cfg, h2x2, snr_db, seed=0):
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(seed)
    tbs = mimo.derived_tbs(cfg)
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))
    grids = np.asarray(mimo.process_2layer(payload, cfg, t.nsymb, t.nof_subc))

    # Flat 2x2 channel in the frequency domain + per-antenna AWGN.
    rx = np.einsum("ap,psk->ask", h2x2, grids)
    sig = float(np.mean(np.abs(rx[np.abs(rx) > 0]) ** 2))
    nv = sig * 10 ** (-snr_db / 10)
    rx = rx + (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape)) \
        * np.sqrt(nv / 2)

    times = np.asarray(t.cp.data_starts) / t.srate
    res = mimo.receive_2layer(jnp.asarray(rx.astype(np.complex64)), cfg,
                              t.srate, times)
    return payload, res, tbs


def test_2x2_identity_channel():
    cfg = _cfg()
    payload, res, tbs = _run(cfg, np.eye(2, dtype=np.complex64), snr_db=25.0)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))
    # 2-layer TBS really is ~2x the single-layer TBS.
    assert tbs > 1.8 * cfg.derived_tbs()


def test_2x2_mixing_channel():
    """Well-conditioned complex mixing channel: layers separated by the
    closed-form 2x2 MMSE, exact payload recovery."""
    h = np.array([[1.0 + 0.2j, 0.45 - 0.3j],
                  [-0.35 + 0.4j, 0.9 - 0.1j]], dtype=np.complex64)
    payload, res, _ = _run(_cfg(), h, snr_db=27.0, seed=2)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))


def _run4(cfg, h, snr_db, seed=0):
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(seed)
    tbs = mimo.derived_tbs(cfg, n_layers=4)
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))
    grids = np.asarray(mimo.process_mimo(payload, cfg, t.nsymb, t.nof_subc,
                                         n_layers=4))
    rx = np.einsum("ap,psk->ask", h, grids)
    sig = float(np.mean(np.abs(rx[np.abs(rx) > 0]) ** 2))
    nv = sig * 10 ** (-snr_db / 10)
    rx = rx + (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape)) \
        * np.sqrt(nv / 2)
    times = np.asarray(t.cp.data_starts) / t.srate
    res = mimo.receive_mimo(jnp.asarray(rx.astype(np.complex64)), cfg,
                            t.srate, times, n_layers=4)
    return payload, res, tbs


def test_mmse_lxn_matches_2xn_closed_form():
    """The general LxN whitened-Gram solve reproduces the closed-form 2x2
    MMSE path at L=2 (same unbias + post-eq noise convention)."""
    rng = np.random.default_rng(11)
    shape = (3, 2, 5, 7)   # (ports, layers, ...)
    h = (rng.normal(size=shape) + 1j * rng.normal(size=shape)) \
        .astype(np.complex64)
    y = (rng.normal(size=(3, 5, 7)) + 1j * rng.normal(size=(3, 5, 7))) \
        .astype(np.complex64)
    nv = rng.uniform(0.01, 0.3, size=(3, 1, 1)).astype(np.float32)
    x2, n2 = equalizer.equalize_mmse_2xn(jnp.asarray(y), jnp.asarray(h),
                                         jnp.asarray(nv))
    xl, nl = equalizer.equalize_mmse_lxn(jnp.asarray(y), jnp.asarray(h),
                                         jnp.asarray(nv))
    np.testing.assert_allclose(np.asarray(xl), np.asarray(x2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(nl), np.asarray(n2),
                               rtol=2e-4, atol=2e-5)


def test_4x4_identity_channel():
    cfg = _cfg()
    payload, res, tbs = _run4(cfg, np.eye(4, dtype=np.complex64), snr_db=27.0)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))
    # 4-layer TBS really is ~2x the 2-layer TBS.
    assert tbs > 1.8 * mimo.derived_tbs(cfg)


def test_4x4_mixing_channel():
    """Well-conditioned 4x4 complex mixing channel: layers (two per CDM
    group) separated by the general LxN MMSE, exact payload recovery."""
    h = (np.eye(4)
         + 0.3 * np.exp(1j * 0.7) * np.eye(4, k=1)
         + 0.25 * np.exp(-1j * 1.1) * np.eye(4, k=-1)
         + 0.15 * np.exp(1j * 2.0) * np.eye(4, k=2)).astype(np.complex64)
    payload, res, _ = _run4(_cfg(), h, snr_db=30.0, seed=5)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))


def test_4x6_rx_diversity():
    """6 rx antennas over 4 layers: extra diversity decodes a random
    Rayleigh mix at moderate SNR."""
    rng = np.random.default_rng(9)
    h = (rng.normal(size=(6, 4)) + 1j * rng.normal(size=(6, 4))) \
        .astype(np.complex64) / np.sqrt(2)
    payload, res, _ = _run4(_cfg(), h, snr_db=24.0, seed=6)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))


def test_2x4_rx_diversity():
    """4 rx antennas: the extra diversity lets the same channel mix decode
    at lower SNR."""
    rng = np.random.default_rng(7)
    h = (rng.normal(size=(4, 2)) + 1j * rng.normal(size=(4, 2))) \
        .astype(np.complex64) / np.sqrt(2)
    payload, res, _ = _run(_cfg(), h, snr_db=18.0, seed=3)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))


def test_2x2_mixing_channel_with_cfo():
    """2x2 MIMO through a mixing channel plus a 300 Hz CFO: the CFO is
    combined energy-weighted over every (antenna, OCC stream) complex
    correlation — an identity channel's dead cross-streams must carry no
    weight (regression: plain averaging let a noise-only stream's random
    phase poison the estimate) — and compensated on the data symbols."""
    cfg = _cfg()
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(3)
    tbs = mimo.derived_tbs(cfg)
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))
    grids = np.asarray(mimo.process_2layer(payload, cfg, t.nsymb, t.nof_subc))
    h2x2 = np.array([[1.0, 0.35 + 0.2j], [0.3 - 0.25j, 0.9j]],
                    dtype=np.complex64)
    rx = np.einsum("ap,psk->ask", h2x2, grids)
    times = np.asarray(t.cp.data_starts) / t.srate
    rot = np.exp(2j * np.pi * 300.0 * times[:t.nsymb])
    rx = rx * rot[None, :, None]
    sig = float(np.mean(np.abs(rx[np.abs(rx) > 0]) ** 2))
    nv = sig * 10 ** (-25.0 / 10)
    rx = rx + (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape)) \
        * np.sqrt(nv / 2)
    res = mimo.receive_2layer(jnp.asarray(rx.astype(np.complex64)), cfg,
                              t.srate, times)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload),
                                  np.asarray(payload))
    assert abs(float(np.asarray(res.cfo_hz)) - 300.0) < 30.0


def test_identity_channel_cfo_estimate_not_poisoned():
    """Identity 2x2 channel (off-diagonal OCC streams are pure noise): the
    energy-weighted CFO estimate stays near zero instead of the random
    hundreds of Hz the dead streams' phases used to inject."""
    cfg = _cfg()
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(4)
    tbs = mimo.derived_tbs(cfg)
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs), dtype=np.int8))
    grids = np.asarray(mimo.process_2layer(payload, cfg, t.nsymb, t.nof_subc))
    rx = grids.copy()
    sig = float(np.mean(np.abs(rx[np.abs(rx) > 0]) ** 2))
    nv = sig * 10 ** (-25.0 / 10)
    rx = rx + (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape)) \
        * np.sqrt(nv / 2)
    times = np.asarray(t.cp.data_starts) / t.srate
    res = mimo.receive_2layer(jnp.asarray(rx.astype(np.complex64)), cfg,
                              t.srate, times)
    assert np.asarray(res.tb_crc_ok).all()
    assert abs(float(np.asarray(res.cfo_hz))) < 30.0
