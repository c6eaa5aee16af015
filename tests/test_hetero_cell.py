"""Heterogeneous-allocation cell: mixed widths/modulations/rates per slot."""

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.models import hetero_cell, pdsch
from srsran_edgeric_5g_tpu.ran import numerology as num


def test_mixed_allocation_loopback():
    """3 UEs with different widths, modulations and code rates through one
    DL+UL slot program; exact payload recovery at 25 dB AWGN."""
    t = num.slot_timing(**num.CELL_10MHZ)
    cfgs = [
        pdsch.PdschConfig(rnti=0x21, start_prb=0, nof_prb=8,
                          modulation="qpsk", target_rate=0.3),
        # rate 0.75: guards the DM-RS-boost pairing (an unboosted TX into
        # pusch.process scales the constellation by sqrt(2) — rates <= 0.5
        # survive that distortion, >= 0.65 fail even noiseless)
        pdsch.PdschConfig(rnti=0x22, start_prb=8, nof_prb=24,
                          modulation="qam64", target_rate=0.75),
        pdsch.PdschConfig(rnti=0x23, start_prb=36, nof_prb=12,
                          modulation="qam16", target_rate=0.4),
    ]
    proc = hetero_cell.HeteroCellProcessor(t, cfgs)
    rng = np.random.default_rng(5)
    payloads = [jnp.asarray(rng.integers(0, 2, (1, n), dtype=np.int8))
                for n in proc.tbs]

    td = proc.process_dl_slot(payloads)
    x = np.asarray(td)
    nv = float((np.abs(x) ** 2).mean()) * 10 ** (-25 / 10)
    noise = (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape))
    rx = jnp.asarray((x + noise * np.sqrt(nv / 2)).astype(np.complex64))

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
