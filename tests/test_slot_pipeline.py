"""Multi-UE sharded slot pipeline on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.parallel import make_mesh, slot_pipeline as sp


def small_cell(nof_ue=4):
    return sp.CellConfig(nof_prb=52, nfft=768, nof_ue=nof_ue, prb_per_ue=12,
                         modulation="qam16", target_rate=0.4)


def _run(cell, mesh=None, snr_db=20.0, seed=0):
    rng = np.random.default_rng(seed)
    tbs = cell.derived_tbs()
    payloads = jnp.asarray(rng.integers(0, 2, (cell.nof_ue, tbs), dtype=np.int8))
    rntis = jnp.asarray(0x4601 + np.arange(cell.nof_ue), dtype=np.uint32)

    dl = jax.jit(lambda p: sp.dl_slot(p, rntis, cell, mesh=mesh))
    td = dl(payloads)

    nv = float(jnp.mean(jnp.abs(td) ** 2)) * 10 ** (-snr_db / 10)
    noise = (rng.normal(size=td.shape) + 1j * rng.normal(size=td.shape))
    rx = jnp.asarray((np.asarray(td) + noise * np.sqrt(nv / 2)).astype(np.complex64))

    ul = jax.jit(lambda s: sp.ul_slot(s, rntis, cell, mesh=mesh))
    payload_hat, tb_ok, nv_est, cfo, _ = ul(rx)
    return payloads, payload_hat, tb_ok, nv_est


def test_single_device_cell_loopback():
    cell = small_cell()
    payloads, payload_hat, tb_ok, _ = _run(cell)
    assert np.asarray(tb_ok).all()
    np.testing.assert_array_equal(np.asarray(payload_hat), np.asarray(payloads))


def test_sharded_cell_loopback_matches():
    """Same slot through a (4 ue, 2 cb) mesh: identical results, still correct."""
    cell = small_cell()
    mesh = make_mesh(n_ue=4, n_cb=2)
    payloads, payload_hat, tb_ok, _ = _run(cell, mesh=mesh, seed=1)
    assert np.asarray(tb_ok).all()
    np.testing.assert_array_equal(np.asarray(payload_hat), np.asarray(payloads))


def test_sharded_equals_unsharded():
    cell = small_cell()
    rng = np.random.default_rng(2)
    tbs = cell.derived_tbs()
    payloads = jnp.asarray(rng.integers(0, 2, (4, tbs), dtype=np.int8))
    rntis = jnp.asarray([1, 2, 3, 4], dtype=np.uint32)
    td0 = jax.jit(lambda p: sp.dl_slot(p, rntis, cell))(payloads)
    mesh = make_mesh(n_ue=8, n_cb=1)
    td1 = jax.jit(lambda p: sp.dl_slot(p, rntis, cell, mesh=mesh))(payloads)
    np.testing.assert_allclose(np.asarray(td0), np.asarray(td1), atol=1e-5)


def test_8ue_20mhz_cell():
    cell = sp.CellConfig(nof_prb=106, nfft=1536, nof_ue=8, prb_per_ue=13,
                         modulation="qam64", target_rate=0.5)
    mesh = make_mesh(n_ue=8, n_cb=1)
    payloads, payload_hat, tb_ok, _ = _run(cell, mesh=mesh, snr_db=25.0, seed=3)
    assert np.asarray(tb_ok).all()
    np.testing.assert_array_equal(np.asarray(payload_hat), np.asarray(payloads))


def test_cell_with_estimator_smoothing():
    """delay_spread_us > 0 routes the UL front-end through the TA +
    frequency-smoothing estimator; the noisy loopback still decodes."""
    cell = sp.CellConfig(nof_prb=52, nfft=768, nof_ue=4, prb_per_ue=12,
                         modulation="qam16", target_rate=0.4,
                         delay_spread_us=1.0)
    payloads, payload_hat, tb_ok, _ = _run(cell, snr_db=14.0, seed=2)
    assert np.asarray(tb_ok).all()
    np.testing.assert_array_equal(np.asarray(payload_hat), np.asarray(payloads))


def test_multi_cell_mesh_loopback():
    """Two independent carriers sharded over the 'cell' axis of a
    (2 cell, 2 ue, 2 cb) mesh: both cells' slot batches decode exactly."""
    from srsran_edgeric_5g_tpu.parallel.mesh import make_cell_mesh
    cell = small_cell(nof_ue=2)
    mesh = make_cell_mesh(n_cell=2, n_ue=2, n_cb=2)
    rng = np.random.default_rng(7)
    tbs = cell.derived_tbs()
    s = 2
    payloads = jnp.asarray(
        rng.integers(0, 2, (2, s, cell.nof_ue, tbs), dtype=np.int8))
    rntis = jnp.asarray(0x10 + np.arange(2 * cell.nof_ue, dtype=np.uint32)
                        .reshape(2, cell.nof_ue))

    step = jax.jit(lambda p, r: sp.multi_cell_ul_slot_batch(
        sp.multi_cell_dl_slot_batch(p, r, cell, mesh=mesh), r, cell,
        mesh=mesh))
    payload_hat, tb_ok, _, _, _ = step(payloads, rntis)
    assert np.asarray(tb_ok).all()
    np.testing.assert_array_equal(np.asarray(payload_hat),
                                  np.asarray(payloads))


def test_cell_loopback_with_cfo():
    """CFO end-to-end through the fused pipeline: a 400 Hz carrier offset on
    the time-domain samples is estimated from the DM-RS phase drift and
    compensated on the data symbols before equalization (the reference
    re-applies the ramp per symbol estimate,
    port_channel_estimator_average_impl.cpp:245-253).  Without the data-
    symbol compensation the mid-slot common phase error (~25 degrees at
    400 Hz) breaks 16QAM decode outright."""
    cell = small_cell()
    rng = np.random.default_rng(5)
    tbs = cell.derived_tbs()
    payloads = jnp.asarray(rng.integers(0, 2, (cell.nof_ue, tbs),
                                        dtype=np.int8))
    rntis = jnp.asarray(0x4601 + np.arange(cell.nof_ue), dtype=np.uint32)
    td = jax.jit(lambda p: sp.dl_slot(p, rntis, cell))(payloads)

    t = cell.timing
    cfo_hz = 400.0
    n = np.arange(t.cp.total, dtype=np.float64)
    rot = np.exp(2j * np.pi * cfo_hz * n / t.srate)
    nv = float(jnp.mean(jnp.abs(td) ** 2)) * 10 ** (-22.0 / 10)
    noise = (rng.normal(size=td.shape) + 1j * rng.normal(size=td.shape))
    rx = jnp.asarray((np.asarray(td) * rot
                      + noise * np.sqrt(nv / 2)).astype(np.complex64))

    payload_hat, tb_ok, nv_est, cfo, _ = jax.jit(
        lambda s: sp.ul_slot(s, rntis, cell))(rx)
    assert np.asarray(tb_ok).all()
    np.testing.assert_array_equal(np.asarray(payload_hat),
                                  np.asarray(payloads))
    got = np.asarray(cfo)
    assert (np.abs(got - cfo_hz) < 30.0).all(), got


def test_cell_256qam_mcs_table2():
    """256QAM operating point (TS 38.214 MCS table 2): the fused pipeline
    carries a Qm=8 cell end-to-end — TBS derives from the qam256 table's
    (Qm, R), DL+UL loopback decodes payload-exactly at 28 dB."""
    from srsran_edgeric_5g_tpu.ran import tbs as tbs_mod

    mcs = tbs_mod.mcs_config(23, "qam256")   # Qm 8, R ~0.753
    assert mcs.qm == 8
    cell = sp.CellConfig(nof_prb=52, nfft=768, nof_ue=4, prb_per_ue=12,
                         modulation=mcs.modulation,
                         target_rate=mcs.target_rate)
    payloads, payload_hat, tb_ok, _ = _run(cell, snr_db=28.0, seed=7)
    assert np.asarray(tb_ok).all()
    np.testing.assert_array_equal(np.asarray(payload_hat),
                                  np.asarray(payloads))
