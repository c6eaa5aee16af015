"""Heterogeneous-allocation cell: mixed widths/modulations/rates per slot."""

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.models import hetero_cell, pdsch
from srsran_edgeric_5g_tpu.ran import numerology as num


def _cfgs():
    return [
        pdsch.PdschConfig(rnti=0x21, start_prb=0, nof_prb=8,
                          modulation="qpsk", target_rate=0.3),
        # rate 0.75: guards the DM-RS-boost pairing (a beta-mismatched TX/RX
        # pair scales the equalized constellation by sqrt(2) — rates <= 0.5
        # survive that distortion, >= 0.65 fail even noiseless)
        pdsch.PdschConfig(rnti=0x22, start_prb=8, nof_prb=24,
                          modulation="qam64", target_rate=0.75),
        pdsch.PdschConfig(rnti=0x23, start_prb=36, nof_prb=12,
                          modulation="qam16", target_rate=0.4),
    ]


def _awgn(td, snr_db, rng):
    x = np.asarray(td)
    nv = float((np.abs(x) ** 2).mean()) * 10 ** (-snr_db / 10)
    noise = (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape))
    return jnp.asarray((x + noise * np.sqrt(nv / 2)).astype(np.complex64))


def test_mixed_allocation_dl_loopback():
    """3 UEs with different widths, modulations and code rates through the
    true DL pair (gNB pdsch.process TX -> UE-side pdsch.receive RX, 0 dB
    DM-RS EPRE); exact payload recovery at 25 dB AWGN."""
    t = num.slot_timing(**num.CELL_10MHZ)
    proc = hetero_cell.HeteroCellProcessor(t, _cfgs())
    rng = np.random.default_rng(5)
    payloads = [jnp.asarray(rng.integers(0, 2, (1, n), dtype=np.int8))
                for n in proc.tbs]

    rx = _awgn(proc.process_dl_slot(payloads), 25.0, rng)
    outs = proc.process_dl_rx_slot(rx)
    assert len(outs) == 3
    for (payload, ok, nv_est, _), want in zip(outs, payloads):
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(payload), np.asarray(want))


def test_mixed_allocation_ul_loopback():
    """Same allocations through the UL pair (UE pusch.transmit with the
    TS 38.214 3 dB DM-RS boost -> gNB pusch.process)."""
    t = num.slot_timing(**num.CELL_10MHZ)
    proc = hetero_cell.HeteroCellProcessor(t, _cfgs())
    rng = np.random.default_rng(6)
    payloads = [jnp.asarray(rng.integers(0, 2, (1, n), dtype=np.int8))
                for n in proc.tbs]

    rx = _awgn(proc.process_ul_tx_slot(payloads), 25.0, rng)
    outs = proc.process_ul_slot(rx)
    assert len(outs) == 3
    for (payload, ok, nv_est, _), want in zip(outs, payloads):
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(payload), np.asarray(want))


def test_overlap_rejected():
    t = num.slot_timing(**num.CELL_10MHZ)
    cfgs = [pdsch.PdschConfig(rnti=1, start_prb=0, nof_prb=10),
            pdsch.PdschConfig(rnti=2, start_prb=8, nof_prb=10)]
    try:
        hetero_cell.HeteroCellProcessor(t, cfgs)
        raise RuntimeError("expected overlap assert")
    except AssertionError:
        pass
