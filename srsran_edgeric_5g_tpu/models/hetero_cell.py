"""Heterogeneous-allocation cell: per-UE PRB spans, modulations and code
rates in one slot program.

The fused slot_pipeline requires the scheduler's uniform equal-split layout
(one flat (S*U) batch).  This module is the general path the reference
actually implements — a per-PDU loop (pdsch_processor_impl.cpp:30 per
codeword, uplink_processor_impl.cpp:86 per PUSCH PDU) — in TPU form: every
UE's chain is traced into ONE jitted DL program (grids summed before a
single OFDM modulate) and ONE jitted UL program (one OFDM demod feeding all
UEs' receivers), so the per-UE "loop" costs zero dispatches at run time; XLA
schedules the independent per-UE subgraphs in parallel.

Shapes are static per (cell, allocation set): changing the scheduler's
allocation recompiles — the bucket-and-pad strategy from SURVEY §7 (the
reference pays the same cost structurally via its per-configuration code
paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ofdm
from ..ran.numerology import SlotTiming
from . import pdsch, pusch


class HeteroCellProcessor:
    """DL+UL slot processing for UEs with arbitrary distinct allocations.

    ue_cfgs: list of PdschConfig — start_prb/nof_prb/modulation/target_rate
    free per UE (allocations must not overlap).
    """

    def __init__(self, timing: SlotTiming, ue_cfgs: list[pdsch.PdschConfig],
                 delay_spread_s: float | None = None):
        spans = sorted((c.start_prb, c.start_prb + c.nof_prb) for c in ue_cfgs)
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 <= b0, f"overlapping allocations {(a0, a1)} {(b0, b1)}"
        self.timing = timing
        self.ue_cfgs = list(ue_cfgs)
        self.tbs = [c.derived_tbs() for c in ue_cfgs]
        t = timing
        times = np.asarray(t.cp.data_starts) / t.srate

        def dl(payloads):
            # True DL conventions: pdsch.process (0 dB DM-RS EPRE ratio,
            # no UCI) — decoded UE-side by dl_rx below via pdsch.receive.
            grid = None
            for p, cfg in zip(payloads, self.ue_cfgs):
                g = pdsch.process(p, cfg, t.nsymb, t.nof_subc)
                grid = g if grid is None else grid + g
            return ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)

        def dl_rx(rx_samples):
            # UE-side PDSCH receivers (srsue role), one per UE, traced into
            # one jitted program.
            rx_grid = ofdm.demodulate_slot(rx_samples, t, scale=1.0)
            outs = []
            for cfg in self.ue_cfgs:
                r = pdsch.receive(rx_grid, cfg, t.srate, times,
                                  delay_spread_s=delay_spread_s)
                outs.append((r.payload, r.tb_crc_ok, r.noise_var, r.cfo_hz))
            return outs

        def ul_tx(payloads):
            # UE-side PUSCH transmit (TS 38.214 3 dB DM-RS boost).
            grid = None
            for p, cfg in zip(payloads, self.ue_cfgs):
                g = pusch.transmit(p, cfg, t.nsymb, t.nof_subc)
                grid = g if grid is None else grid + g
            return ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)

        def ul(rx_samples):
            rx_grid = ofdm.demodulate_slot(rx_samples, t, scale=1.0)
            outs = []
            for cfg in self.ue_cfgs:
                r = pusch.process(rx_grid, cfg, t.srate, times,
                                  delay_spread_s=delay_spread_s)
                outs.append((r.payload, r.tb_crc_ok, r.noise_var, r.cfo_hz))
            return outs

        self._dl = jax.jit(dl)
        self._dl_rx = jax.jit(dl_rx)
        self._ul_tx = jax.jit(ul_tx)
        self._ul = jax.jit(ul)

    def process_dl_slot(self, payloads: list[jnp.ndarray]) -> jnp.ndarray:
        """gNB DL TX: [(1, TBS_i)] per-UE payloads -> (total,) samples."""
        assert len(payloads) == len(self.ue_cfgs)
        return self._dl(payloads)

    def process_dl_rx_slot(self, rx_samples: jnp.ndarray):
        """UE-side DL RX: (total,) samples -> [(payload, tb_ok, nv, cfo)]."""
        return self._dl_rx(rx_samples)

    def process_ul_tx_slot(self, payloads: list[jnp.ndarray]) -> jnp.ndarray:
        """UE PUSCH TX: [(1, TBS_i)] per-UE payloads -> (total,) samples."""
        assert len(payloads) == len(self.ue_cfgs)
        return self._ul_tx(payloads)

    def process_ul_slot(self, rx_samples: jnp.ndarray):
        """gNB UL RX: (total,) samples -> [(payload, tb_ok, nv, cfo)]."""
        return self._ul(rx_samples)
