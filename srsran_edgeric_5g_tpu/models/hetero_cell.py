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

        def dl_rv(payloads, rvs):
            grid = None
            for p, cfg, rv in zip(payloads, self.ue_cfgs, rvs):
                g = pdsch.process(p, cfg, t.nsymb, t.nof_subc, rv=rv)
                grid = g if grid is None else grid + g
            return ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)

        def dl_rx_harq(rx_samples, soft_buffers, rvs):
            # UE-side HARQ receive: soft-combine the retransmission with
            # the stored buffer (dl_harq_process soft combining on the UE,
            # same contract as the gNB-side ul_harq below).
            rx_grid = ofdm.demodulate_slot(rx_samples, t, scale=1.0)
            outs = []
            for cfg, sb, rv in zip(self.ue_cfgs, soft_buffers, rvs):
                r = pdsch.receive(rx_grid, cfg, t.srate, times, rv=rv,
                                  soft_buffer=sb,
                                  delay_spread_s=delay_spread_s)
                outs.append((r.payload, r.tb_crc_ok, r.noise_var, r.cfo_hz,
                             r.soft_buffer))
            return outs

        def ul_tx_rv(payloads, rvs):
            grid = None
            for p, cfg, rv in zip(payloads, self.ue_cfgs, rvs):
                g = pusch.transmit(p, cfg, t.nsymb, t.nof_subc, rv=rv)
                grid = g if grid is None else grid + g
            return ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)

        def ul_harq(rx_samples, soft_buffers, rvs):
            # HARQ receive path: per-UE rv + accumulated soft buffer
            # (zeros = no prior information), the rx_buffer_pool +
            # pusch_decoder_impl soft-combining contract.  Returns the
            # updated soft state so a further retransmission can combine.
            rx_grid = ofdm.demodulate_slot(rx_samples, t, scale=1.0)
            outs = []
            for cfg, sb, rv in zip(self.ue_cfgs, soft_buffers, rvs):
                r = pusch.process(rx_grid, cfg, t.srate, times, rv=rv,
                                  soft_buffer=sb,
                                  delay_spread_s=delay_spread_s)
                outs.append((r.payload, r.tb_crc_ok, r.noise_var, r.cfo_hz,
                             r.soft_buffer))
            return outs

        self._dl = jax.jit(dl)
        self._dl_rx = jax.jit(dl_rx)
        self._ul_tx = jax.jit(ul_tx)
        self._ul = jax.jit(ul)
        self._ul_tx_rv = jax.jit(ul_tx_rv, static_argnums=1)
        self._ul_harq = jax.jit(ul_harq, static_argnums=2)
        self._dl_rv = jax.jit(dl_rv, static_argnums=1)
        self._dl_rx_harq = jax.jit(dl_rx_harq, static_argnums=2)

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

    # ------------------------------------------------- HARQ retransmission

    def soft_buffer_shape(self, ue: int) -> tuple[int, int]:
        """(C, N_cb) circular-buffer shape of UE ``ue``'s soft state."""
        seg, rms = pdsch._plans(self.ue_cfgs[ue], 0)
        return (seg.c, rms[0].n_cb)

    def process_dl_rv_slot(self, payloads: list[jnp.ndarray],
                           rvs: tuple[int, ...]) -> jnp.ndarray:
        """gNB DL TX at per-UE redundancy versions (retransmissions)."""
        assert len(payloads) == len(self.ue_cfgs) == len(rvs)
        return self._dl_rv(payloads, tuple(rvs))

    def process_dl_rx_harq_slot(self, rx_samples: jnp.ndarray,
                                soft_buffers: list, rvs: tuple[int, ...]):
        """UE-side DL RX with HARQ soft combining; same contract as
        ``process_ul_harq_slot`` (zeros = fresh transmission)."""
        assert len(soft_buffers) == len(self.ue_cfgs) == len(rvs)
        return self._dl_rx_harq(rx_samples, soft_buffers, tuple(rvs))

    def process_ul_tx_rv_slot(self, payloads: list[jnp.ndarray],
                              rvs: tuple[int, ...]) -> jnp.ndarray:
        """UE PUSCH TX at per-UE redundancy versions (retransmissions)."""
        assert len(payloads) == len(self.ue_cfgs) == len(rvs)
        return self._ul_tx_rv(payloads, tuple(rvs))

    def process_ul_harq_slot(self, rx_samples: jnp.ndarray,
                             soft_buffers: list, rvs: tuple[int, ...]):
        """gNB UL RX with HARQ soft combining.

        ``soft_buffers``: per-UE (C, N_cb) accumulated-LLR arrays (pass
        zeros — ``soft_buffer_shape`` — for a fresh transmission);
        ``rvs``: per-UE redundancy version of THIS transmission.  Returns
        [(payload, tb_ok, nv, cfo, new_soft)] — feed ``new_soft`` back on
        the next retransmission (reference: rate dematcher accumulating
        into the persistent rx_buffer, pusch_decoder_impl.cpp).
        """
        assert len(soft_buffers) == len(self.ue_cfgs) == len(rvs)
        return self._ul_harq(rx_samples, soft_buffers, tuple(rvs))
