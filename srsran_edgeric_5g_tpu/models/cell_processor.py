"""Cell-level upper-PHY orchestration: one object per cell, slot-by-slot.

Counterpart of the reference's upper-PHY glue (upper_phy_impl,
downlink_processor_single_executor_impl.h:67-131 — process PDCCH/PDSCH/SSB
then send the grid — and uplink_processor_impl.cpp:70-154) plus the HARQ
rx-softbuffer pool (rx_buffer_pool_impl.cpp): the only cross-slot PHY state,
kept as device-resident arrays keyed by (rnti, harq process).

The heavy per-slot math lives in parallel.slot_pipeline (jitted once); this
layer sequences control channels, tracks HARQ state, and reports metrics —
the role the reference spreads across executors and FSMs, collapsed into
explicit slot-step calls.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import slot_pipeline as sp
from ..utils.metrics import MetricsHub, SlotMetrics, UeSlotMetrics
from ..utils.tracing import l1_tracer
from . import pdcch as pdcch_mod, ssb as ssb_mod

NOF_HARQ = 8


@dataclasses.dataclass
class HarqProcess:
    """Per-(UE, pid) soft-combining state (reference rx_buffer)."""

    soft_buffer: jnp.ndarray | None = None
    rv_sequence: tuple[int, ...] = (0, 2, 3, 1)
    tx_count: int = 0

    def next_rv(self) -> int:
        return self.rv_sequence[min(self.tx_count, len(self.rv_sequence) - 1)]

    def reset(self):
        self.soft_buffer = None
        self.tx_count = 0


class HarqPool:
    """rnti -> pid -> HarqProcess, the reference rx_buffer_pool equivalent."""

    def __init__(self):
        self._pool: dict[tuple[int, int], HarqProcess] = {}

    def get(self, rnti: int, pid: int) -> HarqProcess:
        key = (rnti, pid % NOF_HARQ)
        if key not in self._pool:
            self._pool[key] = HarqProcess()
        return self._pool[key]


class CellProcessor:
    """Slot-driven DL/UL processing for one cell."""

    def __init__(self, cell: sp.CellConfig, pci: int = 1,
                 ssb_period_slots: int = 20, metrics: MetricsHub | None = None,
                 mesh=None, tx_gain: float = 1.0, tx_ceiling: float = 0.0):
        self.cell = cell
        self.pci = pci
        self.ssb_period = ssb_period_slots
        self.metrics = metrics or MetricsHub()
        self.mesh = mesh
        self.harq = HarqPool()
        # TX amplitude controller (reference: per-symbol scale/clip at the
        # lower-PHY baseband output, downlink_processor_baseband_impl +
        # amplitude_controller_{scaling,clipping}_impl).  ceiling 0 = scale
        # mode; > 0 = clipping mode.  Applied to every DL transmit; the
        # metrics land in SlotMetrics.tx_*.
        from ..ops import amplitude
        if tx_ceiling > 0:
            self._amp = jax.jit(lambda x: amplitude.clip(x, tx_gain,
                                                         tx_ceiling))
        else:
            self._amp = jax.jit(lambda x: amplitude.scale(x, tx_gain))
        self._last_amp = None
        self.rntis = jnp.asarray(0x4601 + np.arange(cell.nof_ue),
                                 dtype=np.uint32)
        self.tbs = cell.derived_tbs()
        self._dl = jax.jit(lambda p, rv: sp.dl_slot(p, self.rntis, cell,
                                                    rv=rv, mesh=mesh),
                           static_argnums=1)
        self._ul = jax.jit(lambda s, rv: sp.ul_slot(s, self.rntis, cell,
                                                    rv=rv, mesh=mesh),
                           static_argnums=1)
        self._ul_harq = jax.jit(
            lambda s, sb, rv: sp.ul_slot(s, self.rntis, cell, rv=rv,
                                         mesh=mesh, soft_buffer=sb),
            static_argnums=2)
        self._slot = 0

    # ------------------------------------------------------------------ DL

    def process_dl_slot(self, payloads: jnp.ndarray,
                        mib: jnp.ndarray | None = None,
                        dci: jnp.ndarray | None = None,
                        rv: int = 0) -> jnp.ndarray:
        """(U, TBS) payloads -> (total,) DL samples for this slot.

        Adds SSB every `ssb_period` slots and a PDCCH when `dci` given —
        the downlink_processor 'process pdcch/pdsch/ssb then send' sequence.
        ``rv`` drives HARQ retransmissions (rv_sequence 0,2,3,1).
        """
        with l1_tracer.span("dl_slot", slot=self._slot):
            td = self._dl(payloads, rv)
        # Control-channel grid contributions are modulated separately and
        # added in the time domain (disjoint REs -> additive grids).
        extra = None
        t = self.cell.timing
        if mib is not None and self._slot % self.ssb_period == 0:
            cfg = ssb_mod.SsbConfig(pci=self.pci, first_symbol=0,
                                    first_subcarrier=0)
            g = ssb_mod.process(mib, cfg, t.nsymb, t.nof_subc)
            extra = g if extra is None else extra + g
        if dci is not None:
            pcfg = pdcch_mod.PdcchConfig(rnti=int(self.rntis[0]),
                                         n_id=self.cell.n_id,
                                         aggregation_level=4, cce_index=0,
                                         start_symbol=0,
                                         payload_bits=dci.shape[-1])
            g = pdcch_mod.process(dci, pcfg, t.nsymb, t.nof_subc)
            extra = g if extra is None else extra + g
        if extra is not None:
            from ..ops import ofdm
            td = td + ofdm.modulate_slot(extra, t, scale=1.0 / t.nfft)
        td, amp = self._amp(td)
        self._last_amp = amp
        return td

    # ------------------------------------------------------------------ UL

    def process_prach_occasion(self, rx_window: jnp.ndarray,
                               prach_cfg) -> "object":
        """Detect preambles from a PRACH occasion's time samples.

        ``rx_window``: (cp + dft,) samples at the occasion position.  Returns
        ops.prach.PrachDetection (the RACH indication the MAC would consume).
        """
        from ..ops import prach as prach_mod

        info = prach_mod.prach_ofdm_info(self.cell.timing.srate,
                                         prach_cfg.l_ra)
        freq = prach_mod.ofdm_demodulate_prach(rx_window, info)
        det = prach_mod.detect(freq, prach_cfg)
        for p in np.nonzero(np.asarray(det.detected))[0]:
            l1_tracer.instant("prach_detect", preamble=int(p),
                              delay=int(np.asarray(det.delays)[p]))
        return det

    def process_pucch(self, rx_grid: jnp.ndarray, pucch_cfg):
        """Decode a PUCCH F2 resource from an (nsymb, nsubc) rx grid."""
        from ..ops import pucch as pucch_mod

        bits, ok = pucch_mod.format2_decode(rx_grid, pucch_cfg)
        return bits, ok

    def process_pucch_f0(self, rx_grid: jnp.ndarray, cfg01,
                         m0_candidates: tuple[int, ...]):
        """PUCCH F0 detection from the rx grid (pucch_detector_format0
        counterpart): slice the single-PRB resource, correlate m0
        hypotheses.  Returns (metrics, best_index)."""
        from ..ops import pucch as pucch_mod

        sc0 = cfg01.prb * 12
        rx = rx_grid[cfg01.start_symbol:cfg01.start_symbol + cfg01.nof_symbols,
                     sc0:sc0 + 12]
        return pucch_mod.format0_detect(rx, cfg01, m0_candidates)

    def process_pucch_f1(self, rx_grid: jnp.ndarray, cfg01, nof_bits: int,
                         occ_index: int = 0):
        """PUCCH F1 detection from the rx grid (pucch_detector_format1
        counterpart): despread the data symbols (ODD offsets — DM-RS rides
        the even ones, TS 38.211 §6.4.1.3.1) with the time-domain OCC.
        Returns (bits, metric)."""
        from ..ops import pucch as pucch_mod

        sc0 = cfg01.prb * 12
        data_syms = [cfg01.start_symbol + 2 * m + 1
                     for m in range(cfg01.nof_symbols // 2)]
        rx = rx_grid[jnp.asarray(data_syms), sc0:sc0 + 12]
        return pucch_mod.format1_detect(rx, cfg01, nof_bits, occ_index)

    def process_srs(self, rx_grid: jnp.ndarray, srs_cfg):
        """SRS channel snapshot + wideband SNR from the rx grid."""
        from ..ops import csi_rs as csi_mod

        return csi_mod.srs_estimate(rx_grid, srs_cfg)

    def process_ul_slot(self, rx_samples: jnp.ndarray, pid: int = 0,
                        rv: int = 0):
        """(total,) UL samples -> decode results; updates HARQ + metrics.

        If any UE of this HARQ process holds a soft buffer from a failed
        attempt, the whole-cell buffer is assembled (zeros = no prior
        information for fresh UEs) and soft-combined in the decoder — the
        reference's persistent rx_buffer_pool reservation per (rnti, pid).
        """
        u_cnt = self.cell.nof_ue
        prevs = [self.harq.get(int(self.rntis[u]), pid).soft_buffer
                 for u in range(u_cnt)]
        with l1_tracer.span("ul_slot", slot=self._slot):
            if any(p is not None for p in prevs):
                c = next(p for p in prevs if p is not None).shape[0]
                n_cb = next(p for p in prevs if p is not None).shape[1]
                full = jnp.concatenate(
                    [p if p is not None else jnp.zeros((c, n_cb), jnp.float32)
                     for p in prevs], axis=0)
                payload, tb_ok, nv, cfo, soft = self._ul_harq(
                    rx_samples, full, rv)
            else:
                payload, tb_ok, nv, cfo, soft = self._ul(rx_samples, rv)
        ok = np.asarray(tb_ok)
        c_per_ue = soft.shape[0] // u_cnt
        ues = []
        for u in range(self.cell.nof_ue):
            rnti = int(self.rntis[u])
            h = self.harq.get(rnti, pid)
            if ok[u]:
                h.reset()
            else:
                h.tx_count += 1
                h.soft_buffer = soft[u * c_per_ue:(u + 1) * c_per_ue]
            nv_u = float(np.asarray(nv)[u])
            ues.append(UeSlotMetrics(
                rnti=rnti, tb_crc_ok=bool(ok[u]), tbs=self.tbs,
                sinr_db=float(-10.0 * np.log10(max(nv_u, 1e-12))),
                noise_var=nv_u,
                cfo_hz=float(np.asarray(cfo)[u]),
                ul_bytes=self.tbs // 8 if ok[u] else 0,
                dl_bytes=self.tbs // 8))
        amp = self._last_amp
        if amp is not None:
            sm = SlotMetrics(slot=self._slot, ues=ues,
                             tx_avg_power=float(amp.avg_power),
                             tx_papr_db=amp.papr_db(),
                             tx_clipped_ratio=float(amp.clipped_ratio))
        else:
            sm = SlotMetrics(slot=self._slot, ues=ues)
        self.metrics.report(sm)
        self._slot += 1
        return payload, tb_ok
