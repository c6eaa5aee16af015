"""2-layer MIMO end-to-end: layer map -> 2-port CDM DM-RS -> 2x2 channel ->
OCC-separated estimation -> 2x2 MMSE -> decode."""

import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.models import mimo, pdsch
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


def test_2x4_rx_diversity():
    """4 rx antennas: the extra diversity lets the same channel mix decode
    at lower SNR."""
    rng = np.random.default_rng(7)
    h = (rng.normal(size=(4, 2)) + 1j * rng.normal(size=(4, 2))) \
        .astype(np.complex64) / np.sqrt(2)
    payload, res, _ = _run(_cfg(), h, snr_db=18.0, seed=3)
    assert np.asarray(res.tb_crc_ok).all()
    np.testing.assert_array_equal(np.asarray(res.payload), np.asarray(payload))
