"""Full gNB slot pipeline: every per-slot channel of the reference's hot
loops folded into the jitted DL/UL slot-batch programs.

The reference's DL slot carries SSB + PDCCH alongside PDSCH every TTI
(cell_scheduler.cpp:117-138 schedules SSB/SIB/control before UE data;
downlink_processor_single_executor_impl.h:88-98 processes
pdsch/pdcch/ssb/csi-rs then sends the grid), and the UL slot carries PUCCH,
SRS and PRACH occasions alongside PUSCH (uplink_processor_impl.cpp:70-154
process_prach/pusch/pucch).  parallel.slot_pipeline benches the data plane
only; THIS module is the full-cell counterpart:

  DL TX (``gnb_dl_slot_batch``), one jitted program per slot batch:
    * PDSCH for all UEs (slot_pipeline coding front-end, DL DM-RS at 0 dB);
    * a PDCCH CORESET on symbol 0 with 2 DCIs per UE per slot (the DL and
      UL grants the scheduler emits every TTI), all S*2U DCIs polar-encoded
      as ONE batch;
    * the SS/PBCH block at its configured periodicity — slots with an SSB
      move their PDSCH to symbols 6..13 (a second uniform sub-batch shape:
      the TPU form of the reference's rate-matching around SSB — shapes
      stay static per sub-batch, SURVEY §7 bucket-and-pad), PBCH payloads
      of all occasions polar-encoded as one batch.

  UE UL TX (``ue_ul_slot_batch``): the srsue-side generator the loopback
    bench feeds through the channel — PUSCH (3 dB DM-RS boost) + PUCCH F1
    HARQ-ACK every slot + PUCCH F2 CSI occasions + SRS occasions + PRACH
    preambles on PRACH slots (time-domain overlay, delayed).

  UL RX (``gnb_ul_slot_batch``), one jitted program per slot batch:
    * ONE OFDM demodulation shared by every UL channel;
    * PUSCH for all UEs with HARQ soft-buffer carry (soft state in/out of
      the program; per-TB new_data mask zeroes buffers in-graph, the
      rx_buffer_pool reservation rule);
    * PUCCH F1 detection (DM-RS-despread channel estimate, coherent data
      despread) for every UE every slot;
    * PUCCH F2 channel estimate + MMSE + UCI decode on CSI occasions;
    * SRS channel snapshots + wideband SNR on SRS occasions;
    * PRACH demodulation + 64-preamble detection on PRACH occasions.

Slot-position layout of the default 20 MHz / 106 PRB / 4 UE cell (all REs
disjoint by construction):

  DL:  PDCCH symbol 0 PRBs 2..97 (16 CCEs, 8 DCIs @ AL2);
       PDSCH symbols 2..13 PRBs 2..101 (25/UE); SSB slots: PDSCH symbols
       6..13, SSB symbols 2..5 subcarriers 516..755 (band centre).
  UL:  PUSCH symbols 0..12 PRBs 4..99 (24/UE); PUCCH F1 PRB u (u = UE),
       14 symbols; PUCCH F2 PRB 100+u symbols 0..1 on CSI slots; SRS
       symbol 13 comb-4 over the PUSCH band on SRS slots; PRACH format 0
       (839, 1.25 kHz) in PRBs 100..105 on PRACH slots.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import pdcch as pdcch_mod, ssb as ssb_mod
from ..ops import csi_rs, dmrs as dmrs_mod, modulation, ofdm, prach as prach_mod, \
    pucch as pucch_mod, sequences, short_block, sync_signals
from ..ops.crc import crc, crc_attach
from ..ops.ldpc import decoder
from ..ops.polar import encoder as penc, rate_match as prm
from ..ran.numerology import N_SC_PER_PRB
from . import slot_pipeline as sp

SQRT2 = float(np.sqrt(2.0))


def _slot_take(x: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """Static slot-axis selection x[idx] without a gather.

    Every occasion set here is an arithmetic progression (offset::period),
    which lowers to ONE strided lax.slice.  jnp.take over the slot axis
    instead lowers to a sequential dynamic-slice while loop on TPU that
    carries the whole source tensor through every iteration — the F2
    occasion gather alone was ~16% of the MIMO full-cell step's device
    time at S=64.
    """
    idx = np.asarray(idx)
    if idx.size == 0:
        return x[:0]
    if os.environ.get("SRSRAN_TPU_TAKE_GATHER") == "1":
        return jnp.take(x, jnp.asarray(idx), axis=0)   # A/B: pre-r3 form
    if idx.size == 1:
        i = int(idx[0])
        return jax.lax.slice_in_dim(x, i, i + 1)
    d = np.diff(idx)
    if d[0] > 0 and (d == d[0]).all():
        start, step = int(idx[0]), int(d[0])
        return jax.lax.slice_in_dim(x, start,
                                    start + (idx.size - 1) * step + 1,
                                    stride=step)
    return jnp.take(x, jnp.asarray(idx), axis=0)


def _slot_drop_period(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x[i] for i % k != 0 (the norm-slot complement of the period-k
    occasions at offset 0) via reshape + slice — no gather."""
    n = x.shape[0]
    rest = x.shape[1:]
    nb = n // k
    head = x[:nb * k].reshape(nb, k, *rest)[:, 1:].reshape(nb * (k - 1),
                                                           *rest)
    if n == nb * k:
        return head
    return jnp.concatenate([head, x[nb * k + 1:]], axis=0)


def _slot_merge_period(x_occ: jnp.ndarray, x_norm: jnp.ndarray,
                       k: int, s_total: int) -> jnp.ndarray:
    """Re-interleave per-occasion (i % k == 0) and complement slot batches
    back to slot order via reshape + concat (no permutation gather)."""
    rest = x_norm.shape[1:]
    nb = s_total // k
    head = jnp.concatenate(
        [x_occ[:nb][:, None], x_norm[:nb * (k - 1)].reshape(nb, k - 1,
                                                            *rest)], axis=1)
    head = head.reshape(nb * k, *rest)
    if s_total == nb * k:
        return head
    return jnp.concatenate([head, x_occ[nb:], x_norm[nb * (k - 1):]], axis=0)


@dataclasses.dataclass(frozen=True)
class FullCellConfig:
    """Static full-cell geometry + control-channel periodicities."""

    nof_prb: int = 106
    nfft: int = 1536
    nof_ue: int = 4
    mu: int = 0
    pci: int = 1
    n_id: int = 1
    # PDSCH (DL data)
    dl_first_prb: int = 2
    dl_prb_per_ue: int = 25
    dl_modulation: str = "qam64"
    dl_target_rate: float = 0.5
    # PUSCH (UL data)
    ul_first_prb: int = 4
    ul_prb_per_ue: int = 24
    ul_modulation: str = "qam64"
    ul_target_rate: float = 0.5
    # PDCCH: 2 DCIs (DL + UL grant) per UE per slot, one CORESET
    dci_bits: int = 40
    pdcch_al: int = 2
    coreset_start_prb: int = 2
    coreset_nof_prb: int = 96
    # SSB (slots ≡ 0 mod ssb_period; 10 slots/frame at mu=0 -> 10 ms)
    ssb_period: int = 10
    ssb_first_subcarrier: int = 516    # band centre (1272 - 240) / 2
    # NZP-CSI-RS occasions (csi_rs_scheduler.cpp run_slot counterpart):
    # full-BWP density-1 row on symbol 1 (PDCCH owns 0, PDSCH starts at 2).
    csi_rs_period: int = 10
    csi_rs_offset: int = 2
    csi_rs_symbol: int = 1
    # PUCCH F2 CSI occasions
    csi_period: int = 5
    csi_offset: int = 1
    csi_bits: int = 8
    # SRS occasions (symbol 13, comb 4, per-UE comb offset)
    srs_period: int = 10
    srs_offset: int = 3
    # PRACH occasions (format 0, long preamble)
    prach_period: int = 10
    prach_offset: int = 5
    prach_root: int = 1
    prach_ncs: int = 13
    prach_freq_prb: int = 100
    # Peak-to-floor detection threshold: a fractional-bin delay spreads a
    # strong preamble's peak ~2% into the adjacent N_cs zone, so the
    # threshold sits well above that leak and the noise floor (~0.5) but
    # far under a real peak (>500 at the operating point) — same role as
    # prach_detector_generic_thresholds.h.
    prach_threshold: float = 20.0
    # TX amplitude controller (lower-PHY scale/clip tail,
    # amplitude_controller_{scaling,clipping}_impl): ceiling 0 = scale mode.
    tx_gain: float = 1.0
    tx_ceiling: float = 0.0
    # Spatial layers per UE (1 = SISO programs; 2/4 route the data plane
    # through the *_mimo slot programs — control channels stay single-port
    # on port/antenna 0).
    n_layers: int = 1
    # PUSCH channel-estimator chain: 0 = plain LS+interp; > 0 enables the
    # reference's TA + frequency-smoothing estimator with this expected
    # delay spread (us) — ~3-4 dB less estimator noise, which at the
    # 256QAM r0.92 point buys back the decode sweeps the noisy estimate
    # costs (port_channel_estimator_average_impl.h:41-45 counterpart).
    ul_delay_spread_us: float = 0.0

    # ------------------------------------------------------- derived cells

    def dl_cell(self) -> sp.CellConfig:
        return sp.CellConfig(
            nof_prb=self.nof_prb, nfft=self.nfft, nof_ue=self.nof_ue,
            prb_per_ue=self.dl_prb_per_ue, modulation=self.dl_modulation,
            target_rate=self.dl_target_rate, first_symbol=2, nof_symbols=12,
            dmrs_symbols=(2, 11), n_id=self.n_id, mu=self.mu,
            first_prb=self.dl_first_prb)

    def dl_cell_ssb(self) -> sp.CellConfig:
        """PDSCH shape on SSB slots: symbols 6..13 (SSB owns 2..5)."""
        return dataclasses.replace(self.dl_cell(), first_symbol=6,
                                   nof_symbols=8, dmrs_symbols=(6, 11))

    def ul_cell(self) -> sp.CellConfig:
        return sp.CellConfig(
            nof_prb=self.nof_prb, nfft=self.nfft, nof_ue=self.nof_ue,
            prb_per_ue=self.ul_prb_per_ue, modulation=self.ul_modulation,
            target_rate=self.ul_target_rate, first_symbol=0, nof_symbols=13,
            dmrs_symbols=(2, 11), n_id=self.n_id, mu=self.mu,
            first_prb=self.ul_first_prb, n_layers=self.n_layers,
            delay_spread_us=self.ul_delay_spread_us)

    def dl_cell_mimo(self) -> sp.CellConfig:
        return dataclasses.replace(self.dl_cell(), n_layers=self.n_layers)

    def dl_cell_ssb_mimo(self) -> sp.CellConfig:
        return dataclasses.replace(self.dl_cell_ssb(),
                                   n_layers=self.n_layers)

    @property
    def timing(self):
        return self.dl_cell().timing

    def rntis(self) -> jnp.ndarray:
        return jnp.asarray(0x4601 + np.arange(self.nof_ue), dtype=np.uint32)

    # ------------------------------------------------ slot classification

    def ssb_slots(self, s: int) -> np.ndarray:
        return np.arange(0, s, self.ssb_period)

    def norm_slots(self, s: int) -> np.ndarray:
        return np.asarray([i for i in range(s) if i % self.ssb_period != 0])

    def csi_slots(self, s: int) -> np.ndarray:
        return np.asarray([i for i in range(s)
                           if i % self.csi_period == self.csi_offset])

    def srs_slots(self, s: int) -> np.ndarray:
        return np.asarray([i for i in range(s)
                           if i % self.srs_period == self.srs_offset])

    def prach_slots(self, s: int) -> np.ndarray:
        return np.asarray([i for i in range(s)
                           if i % self.prach_period == self.prach_offset])

    def csi_rs_slots(self, s: int) -> np.ndarray:
        if self.csi_rs_period <= 0:
            return np.asarray([], dtype=np.int64)
        return np.asarray([i for i in range(s)
                           if i % self.csi_rs_period == self.csi_rs_offset])

    def csi_rs_cfg(self, slot: int) -> csi_rs.CsiRsConfig:
        return csi_rs.CsiRsConfig(scrambling_id=self.pci, slot=slot,
                                  symbol=self.csi_rs_symbol, start_prb=0,
                                  nof_prb=self.nof_prb)

    # ------------------------------------------------------- sub-configs

    def pdcch_cfgs(self) -> list[pdcch_mod.PdcchConfig]:
        """2 DCIs per UE (DL grant, UL grant), consecutive CCEs."""
        out = []
        for i in range(2 * self.nof_ue):
            out.append(pdcch_mod.PdcchConfig(
                rnti=0x4601 + (i % self.nof_ue), n_id=self.n_id,
                aggregation_level=self.pdcch_al,
                cce_index=i * self.pdcch_al, start_symbol=0,
                coreset_start_prb=self.coreset_start_prb,
                coreset_nof_prb=self.coreset_nof_prb, duration=1,
                payload_bits=self.dci_bits))
        return out

    def pucch_f2_cfg(self, ue: int, slot: int = 0) -> pucch_mod.Pucch2Config:
        return pucch_mod.Pucch2Config(
            rnti=0x4601 + ue, n_id=self.n_id, n_id0=self.n_id, slot=slot,
            start_symbol=0, nof_symbols=2, start_prb=self.prach_freq_prb + ue,
            nof_prb=1, uci_bits=self.csi_bits)

    def srs_cfg(self, ue: int) -> csi_rs.SrsConfig:
        return csi_rs.SrsConfig(
            sequence_id=self.pci, slot=0, symbol=13,
            start_prb=self.ul_first_prb,
            nof_prb=self.nof_ue * self.ul_prb_per_ue,
            comb=4, comb_offset=ue, cyclic_shift=0)

    def prach_cfg(self) -> prach_mod.PrachConfig:
        return prach_mod.PrachConfig(root_sequence_index=self.prach_root,
                                     zero_correlation_zone=self.prach_ncs)

    def prach_info(self) -> prach_mod.PrachOfdmInfo:
        t = self.timing
        # Frequency offset of PRB prach_freq_prb relative to baseband DC
        # (grid subcarrier k maps to (k - nof_subc/2) * scs).
        off_hz = (self.prach_freq_prb * N_SC_PER_PRB
                  - t.nof_subc // 2) * 15e3 * (1 << self.mu)
        return prach_mod.prach_ofdm_info(int(t.srate), freq_offset_hz=off_hz)


# ============================================================ DL control

@functools.lru_cache(maxsize=None)
def _pdcch_static(fc: FullCellConfig, s_total: int):
    """Static PDCCH mapping: (data_sc, dmrs_sc, per-slot DM-RS values,
    per-DCI scrambling inits, per-DCI RNTI CRC masks)."""
    cfgs = fc.pdcch_cfgs()
    pos = [pdcch_mod._re_positions(c) for c in cfgs]
    data_sc = np.concatenate([p[0] for p in pos])
    assert len(np.unique(data_sc)) == len(data_sc), "overlapping CCEs"
    dmrs_sc = np.unique(np.concatenate([p[1] for p in pos]))
    dmrs_vals = np.stack([
        pdcch_mod._dmrs_values(dataclasses.replace(cfgs[0], slot=sl),
                               dmrs_sc, 0)
        for sl in range(s_total)])                          # (S, ndmrs)
    ci = np.asarray([pdcch_mod._scrambling_cinit(c) for c in cfgs],
                    np.uint32)
    rnti_mask = np.asarray([[(c.rnti >> (15 - i)) & 1 for i in range(16)]
                            for c in cfgs], np.int8)
    return cfgs, data_sc, dmrs_sc, dmrs_vals, ci, rnti_mask


def pdcch_rows(dci: jnp.ndarray, fc: FullCellConfig,
               s_total: int) -> jnp.ndarray:
    """(S, NDCI, A) DCI payloads -> (S, nsubc) CORESET symbol rows.

    All S*NDCI DCIs run through ONE batched CRC24C+RNTI-mask -> polar ->
    rate-match -> scramble -> QPSK chain (the per-slot PDCCH PDU loop of
    pdcch_processor_impl.cpp, traced flat); DM-RS values are per-slot
    host-precomputed Gold constants.
    """
    cfgs, data_sc, dmrs_sc, dmrs_vals, ci, rnti_mask = \
        _pdcch_static(fc, s_total)
    s, ndci, a = dci.shape
    assert s == s_total and ndci == len(cfgs)
    code = pdcch_mod._polar(cfgs[0])
    pay = dci.reshape(s * ndci, a).astype(jnp.int8)
    ones = jnp.ones((s * ndci, 24), jnp.int8)
    crc_bits = crc(jnp.concatenate([ones, pay], axis=1), "crc24c")
    mask = jnp.asarray(np.tile(rnti_mask, (s, 1)))
    crc_bits = crc_bits.at[:, 8:].set(jnp.bitwise_xor(crc_bits[:, 8:], mask))
    cw = penc.encode(jnp.concatenate([pay, crc_bits], axis=1), code)
    bits = prm.rate_match(cw, code)                         # (S*NDCI, E)
    scr = sequences.scramble_bits(bits, jnp.asarray(np.tile(ci, s)))
    syms = modulation.modulate(scr, "qpsk")                 # (S*NDCI, E/2)

    nsubc = fc.timing.nof_subc
    rows = jnp.zeros((s, nsubc), jnp.complex64)
    rows = rows.at[:, jnp.asarray(data_sc)].set(
        syms.reshape(s, -1).astype(jnp.complex64))
    rows = rows.at[:, jnp.asarray(dmrs_sc)].set(jnp.asarray(dmrs_vals))
    return rows


@functools.lru_cache(maxsize=None)
def _ssb_static(fc: FullCellConfig, s_total: int):
    """Static SSB machinery for the batch's occasions (sfn0 = 0)."""
    slots = fc.ssb_slots(s_total)
    slots_per_frame = 10 * (1 << fc.mu)
    cfgs = [ssb_mod.SsbConfig(pci=fc.pci, ssb_index=0, l_max=4,
                              hrf=False, sfn=int(sl) // slots_per_frame)
            for sl in slots]
    maps = [ssb_mod._payload_maps(c) for c in cfgs]
    pos = maps[0][0]
    epos = maps[0][1]
    evals = np.stack([m[2] for m in maps])                  # (N, n_extra)
    seq1 = np.stack([m[3] for m in maps])                   # (N, 32)
    _, data_pos, dmrs_pos = ssb_mod._pbch_positions(cfgs[0])
    # Static PSS/SSS/DM-RS built in numpy (no eager device complex ops —
    # the axon TPU backend cannot run them outside jit).
    base = np.zeros((4, 240), np.complex64)
    n_id1, n_id2 = sync_signals.pci_to_nid(fc.pci)
    base[0, 56:56 + 127] = sync_signals.pss_sequence(n_id2)
    base[2, 56:56 + 127] = sync_signals.sss_sequence(n_id1, n_id2)
    base[dmrs_pos[:, 0], dmrs_pos[:, 1]] = \
        ssb_mod._dmrs_sequence(cfgs[0], len(dmrs_pos))
    seq2 = ssb_mod._seq2(cfgs[0])
    return pos, epos, evals, seq1, data_pos, base, seq2


def ssb_blocks(pbch: jnp.ndarray, fc: FullCellConfig,
               s_total: int) -> jnp.ndarray:
    """(N_occ, 24) MIB payloads -> (N_occ, 4, 240) SSB blocks.

    All occasions' PBCH payloads go through ONE batched §7.1.1 chain
    (payload interleave + per-occasion SFN timing bits + 1st scrambling ->
    CRC24C -> polar -> 2nd scrambling -> QPSK); PSS/SSS/DM-RS are static.
    """
    pos, epos, evals, seq1, data_pos, base, seq2 = _ssb_static(fc, s_total)
    n = pbch.shape[0]
    a = jnp.zeros((n, ssb_mod.PBCH_A), jnp.int8)
    a = a.at[:, jnp.asarray(pos)].set(pbch.astype(jnp.int8))
    a = a.at[:, jnp.asarray(epos)].set(jnp.asarray(evals))
    a = jnp.bitwise_xor(a, jnp.asarray(seq1))
    cw = penc.encode(crc_attach(a, "crc24c"), ssb_mod._polar())
    bits = prm.rate_match(cw, ssb_mod._polar())
    bits = jnp.bitwise_xor(bits, jnp.asarray(seq2)[None])
    syms = modulation.modulate(bits, "qpsk")                # (N, 432)
    blocks = jnp.broadcast_to(jnp.asarray(base), (n, 4, 240))
    return blocks.at[:, jnp.asarray(data_pos[:, 0]),
                     jnp.asarray(data_pos[:, 1])].set(
        syms.astype(jnp.complex64))


@functools.lru_cache(maxsize=None)
def _csi_rs_rows_np(fc: FullCellConfig, s_total: int) -> np.ndarray:
    """(S, nsubc) NZP-CSI-RS contribution of each slot's csi_rs_symbol
    (zeros off-occasion); per-slot Gold pilots (§7.4.1.5.2 c_init)."""
    t = fc.timing
    rows = np.zeros((s_total, t.nof_subc), np.complex64)
    for sl in fc.csi_rs_slots(s_total):
        c = fc.csi_rs_cfg(int(sl))
        rows[sl, csi_rs.csi_rs_subcarriers(c)] = csi_rs.csi_rs_pilots(c)
    return rows


def gnb_dl_slot_batch(pay_norm: jnp.ndarray, pay_ssb: jnp.ndarray,
                      dci: jnp.ndarray, pbch: jnp.ndarray,
                      fc: FullCellConfig, s_total: int,
                      mesh=None) -> jnp.ndarray:
    """Full DL slot batch -> (S, total) baseband samples.

    pay_norm: (S_norm, U, TBS_dl) PDSCH payloads of the non-SSB slots;
    pay_ssb: (S_ssb, U, TBS_dl_ssb) payloads of the SSB slots (shorter
    PDSCH); dci: (S, 2U, A) DCI payloads; pbch: (S_ssb, 24) MIB payloads.
    """
    cell_n, cell_s = fc.dl_cell(), fc.dl_cell_ssb()
    t = cell_n.timing
    norm_idx, ssb_idx = fc.norm_slots(s_total), fc.ssb_slots(s_total)
    # _slot_drop_period/_slot_merge_period assume the SSB occasions sit
    # at offset 0 with period fc.ssb_period; a future slot offset must
    # fail loudly, not silently corrupt the DL slot ordering.
    assert ssb_idx[0] == 0, "SSB slot offset != 0 unsupported here"
    rntis = fc.rntis()
    u = fc.nof_ue

    syms_n = sp._dl_code(pay_norm.reshape(len(norm_idx) * u, -1), rntis,
                         cell_n, mesh=mesh).reshape(len(norm_idx), u, -1)
    syms_s = sp._dl_code(pay_ssb.reshape(len(ssb_idx) * u, -1), rntis,
                         cell_s, mesh=mesh).reshape(len(ssb_idx), u, -1)
    prows = pdcch_rows(dci, fc, s_total)                    # (S, nsubc)
    blocks = ssb_blocks(pbch, fc, s_total)                  # (S_ssb, 4, 240)

    sc0 = fc.ssb_first_subcarrier
    left = jnp.zeros((sc0,), jnp.complex64)
    right = jnp.zeros((t.nof_subc - sc0 - 240,), jnp.complex64)

    # csi_rs_period <= 0 disables NZP-CSI-RS (cells without CSI-RS
    # occasions; also the perf A/B for the occasion rows).
    use_csirs = fc.csi_rs_period > 0
    crows = (jnp.asarray(_csi_rs_rows_np(fc, s_total))      # (S, nsubc)
             if use_csirs else None)

    # Grid assembly per sub-batch; the SSB/norm re-interleave happens at
    # the GRID level (clean row-major c64), and ONE modulate_slot runs
    # over the merged (S, nsymb, nsubc) batch.  Merging the time-domain
    # SAMPLES instead (the r3 form, A/B below) made XLA materialise the
    # matmul-DFT's transposed output layout through the merge reshapes —
    # two full-tensor strided copies, 36% of the DL program's device time
    # at S=256 (xplane: copy+reshape f32[225,1920,12]->[25,9,23040]).
    def grid_norm(sy, prow, crow=None):
        rows = {0: prow}
        if crow is not None:
            rows[fc.csi_rs_symbol] = crow
        return sp._dl_grid(sy, cell_n, dmrs_scale=1.0, add_rows=rows)

    def grid_ssb(sy, prow, blk, crow=None):
        rows = {0: prow}
        if crow is not None:
            rows[fc.csi_rs_symbol] = crow
        for j in range(4):
            rows[2 + j] = rows.get(2 + j, 0) + jnp.concatenate(
                [left, blk[j], right])
        return sp._dl_grid(sy, cell_s, dmrs_scale=1.0, add_rows=rows)

    k = fc.ssb_period
    merge_samples = os.environ.get("SRSRAN_TPU_MERGE_SAMPLES") == "1"
    if use_csirs:
        g_n = jax.vmap(grid_norm)(syms_n, _slot_drop_period(prows, k),
                                  _slot_drop_period(crows, k))
        g_s = jax.vmap(grid_ssb)(syms_s, _slot_take(prows, ssb_idx),
                                 blocks, _slot_take(crows, ssb_idx))
    else:
        g_n = jax.vmap(grid_norm)(syms_n, _slot_drop_period(prows, k))
        g_s = jax.vmap(grid_ssb)(syms_s, _slot_take(prows, ssb_idx),
                                 blocks)
    if merge_samples:
        # A/B: the r3 formulation — modulate the sub-batches separately
        # and re-interleave the time-domain samples.
        td_n = ofdm.modulate_slot(g_n, t, scale=1.0 / t.nfft)
        td_s = ofdm.modulate_slot(g_s, t, scale=1.0 / t.nfft)
        td = _slot_merge_period(td_s, td_n, k, s_total)
    else:
        grid = _slot_merge_period(g_s, g_n, k, s_total)
        td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)
    # TX amplitude controller tail (every transmit passes through it, like
    # the reference's per-symbol lower-PHY scale/clip).
    from ..ops import amplitude
    if fc.tx_ceiling > 0:
        td, _ = amplitude.clip(td, fc.tx_gain, fc.tx_ceiling)
    else:
        td, _ = amplitude.scale(td, fc.tx_gain)
    return td


# ============================================================ PUCCH tables

@functools.lru_cache(maxsize=None)
def _f1_static(fc: FullCellConfig, s_total: int):
    """PUCCH F1 low-PAPR sequences per (slot, symbol) + OCC rows.

    One UE per PRB with initial_cs 0 and occ 0 — the sequence values are
    UE-independent (shared n_id); only the PRB placement differs.
    """
    cfg0 = pucch_mod.Pucch01Config(n_id=fc.n_id, slot=0, start_symbol=0,
                                   nof_symbols=14, initial_cs=0)
    ndata = 7
    data_seq = np.empty((s_total, ndata, 12), np.complex64)
    dmrs_seq = np.empty((s_total, ndata, 12), np.complex64)
    for sl in range(s_total):
        c = dataclasses.replace(cfg0, slot=sl)
        for m in range(ndata):
            data_seq[sl, m] = pucch_mod._f0_sequence(c, 0, 2 * m + 1)
            dmrs_seq[sl, m] = pucch_mod._f0_sequence(c, 0, 2 * m)
    w = pucch_mod._occ(ndata, 0)
    return data_seq, dmrs_seq, w


def _f1_symbols(ack: jnp.ndarray, fc: FullCellConfig,
                s_total: int) -> jnp.ndarray:
    """(S, U, 2) ACK bits -> (S, 14, 12U) PUCCH F1 REs (QPSK data on odd
    symbols, DM-RS on even — TS 38.211 §6.4.1.3.1)."""
    data_seq, dmrs_seq, w = _f1_static(fc, s_total)
    s, u, _ = ack.shape
    b = ack.astype(jnp.float32)
    d = ((1.0 - 2.0 * b[..., 0]) + 1j * (1.0 - 2.0 * b[..., 1])) / SQRT2
    wj = jnp.asarray(w)                                     # (7,)
    data = (d[:, :, None, None] * wj[None, None, :, None]
            * jnp.asarray(data_seq)[:, None])               # (S, U, 7, 12)
    dmrs = jnp.broadcast_to(
        (wj[None, None, :, None] * jnp.asarray(dmrs_seq)[:, None]),
        data.shape)
    # Interleave DM-RS (even) / data (odd) along symbols; UE u at PRB u.
    rows = jnp.stack([dmrs, data], axis=3)                  # (S, U, 7, 2, 12)
    rows = rows.reshape(s, u, 14, 12).transpose(0, 2, 1, 3)
    return rows.reshape(s, 14, u * 12).astype(jnp.complex64)


def _f1_detect(rx_grid: jnp.ndarray, fc: FullCellConfig, s_total: int):
    """(S, nsymb, nsubc) grid -> ((S, U, 2) ACK bits, (S, U) |metric|).

    DM-RS despread estimates the per-occasion channel; the data despread is
    then derotated coherently (pucch_detector_format1.cpp structure).
    """
    data_seq, dmrs_seq, w = _f1_static(fc, s_total)
    u = fc.nof_ue
    s = rx_grid.shape[0]
    rx = rx_grid[:, :14, :u * 12].reshape(s, 7, 2, u, 12)
    rx_dmrs = rx[:, :, 0].transpose(0, 2, 1, 3)             # (S, U, 7, 12)
    rx_data = rx[:, :, 1].transpose(0, 2, 1, 3)
    wc = jnp.conj(jnp.asarray(w))
    h = jnp.einsum("sumn,smn,m->su", rx_dmrs,
                   jnp.conj(jnp.asarray(dmrs_seq)), wc) / (7 * 12)
    z = jnp.einsum("sumn,smn,m->su", rx_data,
                   jnp.conj(jnp.asarray(data_seq)), wc) / (7 * 12)
    d = z * jnp.conj(h)
    bits = jnp.stack([(jnp.real(d) < 0), (jnp.imag(d) < 0)],
                     axis=-1).astype(jnp.int8)
    return bits, jnp.abs(z)


@functools.lru_cache(maxsize=None)
def _f2_static(fc: FullCellConfig, s_total: int):
    """PUCCH F2 static mapping: per-(occasion, UE, symbol) DM-RS values and
    the absolute data/DM-RS subcarriers per UE."""
    slots = fc.csi_slots(s_total)
    u_cnt = fc.nof_ue
    data_sc = np.stack([pucch_mod._f2_data_sc(1) + 12 * (fc.prach_freq_prb + u)
                        for u in range(u_cnt)])             # (U, 8)
    dmrs_sc = np.stack([pucch_mod._f2_dmrs_sc(1) + 12 * (fc.prach_freq_prb + u)
                        for u in range(u_cnt)])             # (U, 4)
    pil = np.empty((len(slots), u_cnt, 2, 4), np.complex64)
    for i, sl in enumerate(slots):
        for u in range(u_cnt):
            cfg = fc.pucch_f2_cfg(u, int(sl))
            for l in range(2):
                cinit = pucch_mod._f2_dmrs_cinit(cfg, l)
                c = sequences.np_gold_sequence(
                    cinit, 2 * (4 + 4 * cfg.start_prb))
                c = c[8 * cfg.start_prb:]
                pil[i, u, l] = (((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2]))
                                / SQRT2)[:4]
    ci = np.asarray([(0x4601 + u) << 15 | fc.n_id for u in range(u_cnt)],
                    np.uint32)
    return slots, data_sc, dmrs_sc, pil, ci


def _f2_symbols(csi: jnp.ndarray, fc: FullCellConfig,
                s_total: int) -> jnp.ndarray:
    """(S_csi, U, K) UCI bits -> (S_csi, 2, nsubc) F2 symbol rows."""
    slots, data_sc, dmrs_sc, pil, ci = _f2_static(fc, s_total)
    n, u, k = csi.shape
    e = 2 * 8 * 2   # QPSK * 8 data sc * 2 symbols (1 PRB)
    coded = short_block.encode(csi.reshape(n * u, k), e)
    scr = sequences.scramble_bits(coded, jnp.asarray(np.tile(ci, n)))
    syms = modulation.modulate(scr, "qpsk").reshape(n, u, 2, 8)
    nsubc = fc.timing.nof_subc
    rows = jnp.zeros((n, 2, nsubc), jnp.complex64)
    for uu in range(u):
        rows = rows.at[:, :, jnp.asarray(data_sc[uu])].set(
            syms[:, uu].astype(jnp.complex64))
        rows = rows.at[:, :, jnp.asarray(dmrs_sc[uu])].set(
            jnp.asarray(pil[:, uu]))
    return rows


def _f2_decode(rx_grid_csi: jnp.ndarray, fc: FullCellConfig, s_total: int):
    """(S_csi, nsymb, nsubc) grids of the CSI slots -> ((S_csi, U, K) bits,
    (S_csi, U) valid) — pucch_demodulator + uci_decoder, batched."""
    slots, data_sc, dmrs_sc, pil, ci = _f2_static(fc, s_total)
    n = rx_grid_csi.shape[0]
    u = fc.nof_ue
    k = fc.csi_bits
    rx_d = jnp.stack([rx_grid_csi[:, :2, jnp.asarray(dmrs_sc[uu])]
                      for uu in range(u)], axis=1)          # (N, U, 2, 4)
    h_syms = rx_d * jnp.conj(jnp.asarray(pil))
    h_p = jnp.mean(h_syms, axis=2)                          # (N, U, 4)
    resid = h_syms - h_p[:, :, None]
    nv = jnp.mean(jnp.abs(resid) ** 2, axis=(2, 3)) * 2.0   # (N, U)
    nearest = np.abs(pucch_mod._f2_data_sc(1)[:, None]
                     - pucch_mod._f2_dmrs_sc(1)[None, :]).argmin(axis=1)
    h_data = h_p[:, :, jnp.asarray(nearest)]                # (N, U, 8)
    y = jnp.stack([rx_grid_csi[:, :2, jnp.asarray(data_sc[uu])]
                   for uu in range(u)], axis=1)             # (N, U, 2, 8)
    hh = jnp.broadcast_to(h_data[:, :, None], y.shape)
    nvb = jnp.broadcast_to(nv[:, :, None, None], y.shape).astype(jnp.float32)
    xh = y * jnp.conj(hh) / (jnp.abs(hh) ** 2 + nvb)
    nv_out = nvb / jnp.maximum(jnp.abs(hh) ** 2, 1e-12)
    llr = modulation.demodulate_soft(xh.reshape(n * u, -1),
                                     nv_out.reshape(n * u, -1), "qpsk",
                                     quantize=False)
    llr = sequences.scramble_llrs(llr, jnp.asarray(np.tile(ci, n)))
    bits, metric = short_block.detect(llr, k)
    return bits.reshape(n, u, k), (metric > 0).reshape(n, u)


# ================================================================= SRS

@functools.lru_cache(maxsize=None)
def _srs_static(fc: FullCellConfig):
    seqs = np.stack([csi_rs.srs_sequence(fc.srs_cfg(u))
                     for u in range(fc.nof_ue)])            # (U, m_sc)
    scs = np.stack([csi_rs.srs_subcarriers(fc.srs_cfg(u))
                    for u in range(fc.nof_ue)])             # (U, m_sc)
    return seqs, scs


def _srs_rows(fc: FullCellConfig) -> jnp.ndarray:
    """Static (nsubc,) symbol-13 row carrying all UEs' SRS combs."""
    seqs, scs = _srs_static(fc)
    row = jnp.zeros((fc.timing.nof_subc,), jnp.complex64)
    for u in range(fc.nof_ue):
        row = row.at[jnp.asarray(scs[u])].set(jnp.asarray(seqs[u]))
    return row


def _srs_estimate(rx_grid_srs: jnp.ndarray, fc: FullCellConfig):
    """(S_srs, nsymb, nsubc) -> ((S_srs, U, m_sc) H, (S_srs, U) SNR dB)."""
    seqs, scs = _srs_static(fc)
    h_list, snr_list = [], []
    for u in range(fc.nof_ue):
        rx = rx_grid_srs[:, 13, jnp.asarray(scs[u])]
        h = rx * jnp.conj(jnp.asarray(seqs[u]))
        d = h[..., 1::2] - h[..., 0::2]
        noise = jnp.mean(jnp.abs(d) ** 2, axis=-1) / 2.0
        sig = jnp.mean(jnp.abs(h) ** 2, axis=-1)
        h_list.append(h)
        snr_list.append(10.0 * jnp.log10(jnp.maximum(sig, 1e-30)
                                         / jnp.maximum(noise, 1e-30)))
    return jnp.stack(h_list, axis=1), jnp.stack(snr_list, axis=1)


# ================================================================ PRACH

@functools.lru_cache(maxsize=None)
def _prach_static(fc: FullCellConfig):
    cfg = fc.prach_cfg()
    l_ra = cfg.l_ra
    table = cfg.preamble_table
    offsets = sorted({off for off, _, _ in table})
    row_of = {off: i for i, off in enumerate(offsets)}
    roots = np.stack([prach_mod.root_sequence(
        prach_mod.sequence_number(cfg.root_sequence_index + off, l_ra), l_ra)
        for off in offsets])
    root_f = np.fft.fft(roots, axis=-1).astype(np.complex64)
    ncs = cfg.n_cs if cfg.n_cs else l_ra
    win = min(ncs, l_ra)
    rows = np.asarray([row_of[off] for off, _, _ in table])
    starts = np.asarray([(l_ra - cv) % l_ra for _, _, cv in table])
    # L_RA = 839 is PRIME: jnp.fft.ifft over it lowers to a sequential
    # while loop on TPU (measured 30% of the whole full-slot step!).  The
    # MXU-native form is an explicit IDFT matmul — an (839, 839) c64
    # constant (11 MB) and one tiny matrix product per occasion batch.
    n = np.arange(l_ra)
    idft = (np.exp(2j * np.pi * np.outer(n, n) / l_ra) / l_ra
            ).astype(np.complex64)
    return cfg, root_f, rows, starts, win, l_ra, idft


def _prach_detect_batch(rx_freq: jnp.ndarray, fc: FullCellConfig):
    """(B, L_RA) freq-domain occasions -> ((B, 64) metric, delay, detected).

    The batched form of ops.prach.detect: per-root IDFT correlations (as an
    MXU matmul against the prime-length IDFT matrix — see _prach_static),
    each preamble's windowed max over its own N_cs zone against the
    occasion noise floor (prach_detector_generic_impl.cpp structure).
    """
    cfg, root_f, rows, starts, win, l_ra, idft = _prach_static(fc)
    corr_f = rx_freq[:, None, :] * jnp.conj(jnp.asarray(root_f))  # (B, R, L)
    corr_t = jnp.matmul(corr_f, jnp.asarray(idft),
                        preferred_element_type=jnp.complex64)
    power = jnp.abs(corr_t) ** 2                            # (B, R, L)
    floor = jnp.mean(power, axis=(1, 2), keepdims=True) + 1e-30
    power2 = jnp.concatenate([power, power], axis=-1)       # wrap-around
    idx = starts[:, None] + np.arange(win)[None, :]         # (64, win)
    # Gather each preamble's root row, then its N_cs zone window.
    per_pre = power2[:, jnp.asarray(rows)]                  # (B, 64, 2L)
    zones = jnp.take_along_axis(per_pre, jnp.asarray(idx)[None], axis=-1)
    metrics = jnp.max(zones, axis=-1) / floor[:, :, 0]
    delays = jnp.argmax(zones, axis=-1)
    return metrics, delays, metrics > fc.prach_threshold


def prach_occasion_td(fc: FullCellConfig, preamble_index: int,
                      delay: int = 24, amplitude: float = 1.0) -> np.ndarray:
    """Static time-domain PRACH occasion, padded to one slot and delayed
    (the UE-side transmit the detector sees after propagation)."""
    cfg = fc.prach_cfg()
    info = fc.prach_info()
    # Pure numpy (host-side setup constant; the axon TPU backend cannot run
    # eager complex ops): generate + ofdm_modulate_prach equivalents.
    u_root, cv = cfg.preamble(preamble_index)
    pre = np.fft.fft(np.roll(prach_mod.root_sequence(u_root, cfg.l_ra), -cv))
    x = np.zeros(info.dft_size, np.complex128)
    k = (info.freq_offset_bins + np.arange(cfg.l_ra)) % info.dft_size
    x[k] = pre
    body = np.fft.ifft(x) * np.sqrt(info.dft_size)
    td = np.concatenate([body[info.dft_size - info.cp_samples:], body])
    # Raised-cosine edge taper (~0.5 of the CP each side): a rectangular
    # occasion window has sinc sidelobes that leak across the whole carrier
    # (the 1.25 kHz preamble is not orthogonal to the 15 kHz grid) — the
    # measured PUSCH noise floor on PRACH slots was 2.3x worse, which
    # dragged the flat decode batch's early-stop loop to worst-case sweep
    # counts.  Real UEs pulse-shape the preamble for the same reason.
    ramp = info.cp_samples // 2
    w = 0.5 - 0.5 * np.cos(np.pi * np.arange(ramp) / ramp)
    td[:ramp] *= w
    td[-ramp:] *= w[::-1]
    td = (td / np.sqrt(np.mean(np.abs(td) ** 2)) * amplitude
          ).astype(np.complex64)
    total = fc.timing.cp.total
    out = np.zeros(total, np.complex64)
    n = min(len(td), total - delay)
    out[delay:delay + n] = td[:n]
    return out


# ============================================================ UE UL TX

def ue_ul_slot_batch(payloads: jnp.ndarray, ack: jnp.ndarray,
                     csi: jnp.ndarray, fc: FullCellConfig, s_total: int,
                     prach_preamble: int = 7, prach_delay: int = 24,
                     prach_amplitude: float = 0.002,
                     mesh=None) -> jnp.ndarray:
    """UE-side UL generator: (S, U, TBS_ul) PUSCH payloads + (S, U, 2) ACK
    bits + (S_csi, U, K) CSI bits -> (S, total) clean UL samples with
    PUSCH + PUCCH F1 (+F2/SRS/PRACH on their occasions).

    ``prach_amplitude`` models PRACH open-loop power control: the preamble
    arrives ~-21 dB under the PUSCH RMS (real PRACH targets the DETECTOR,
    which has ~29 dB of correlation processing gain over 839 bins — metric
    ~770 vs threshold 20 at this level), because the 1.25 kHz preamble is
    not orthogonal to the 15 kHz grid and its inter-numerology leakage
    raises the adjacent PUSCH PRBs' noise floor: at the old -7 dB level the
    PRACH-slot noise floor was 2.1x elevated, which capped the adjacent
    UE's SINR (~18 dB — fatal for 256QAM) and dragged the flat decode
    batch's early-stop loop to extra sweeps on every PRACH slot.
    """
    cell = fc.ul_cell()
    t = cell.timing
    s, u, tbs = payloads.shape
    syms = sp._dl_code(payloads.reshape(s * u, tbs), fc.rntis(), cell,
                       mesh=mesh).reshape(s, u, -1)
    extra = jnp.zeros((s, t.nsymb, t.nof_subc), jnp.complex64)
    extra = extra.at[:, :14, :u * 12].set(_f1_symbols(ack, fc, s_total))
    csi_idx = fc.csi_slots(s_total)
    extra = extra.at[jnp.asarray(csi_idx), 0:2].add(
        _f2_symbols(csi, fc, s_total))
    srs_idx = fc.srs_slots(s_total)
    extra = extra.at[jnp.asarray(srs_idx), 13].add(
        jnp.broadcast_to(_srs_rows(fc), (len(srs_idx), t.nof_subc)))

    def mod(sy, ex):
        grid = sp._dl_grid(sy, cell)        # PUSCH DM-RS boost (sqrt 2)
        return ofdm.modulate_slot(grid + ex, t, scale=1.0 / t.nfft)

    td = jax.vmap(mod)(syms, extra)
    prach_idx = fc.prach_slots(s_total)
    ptd = jnp.asarray(prach_occasion_td(fc, prach_preamble, prach_delay,
                                        prach_amplitude))
    return td.at[jnp.asarray(prach_idx)].add(ptd[None])


# ============================================================ gNB UL RX

def gnb_ul_slot_batch(rx: jnp.ndarray, fc: FullCellConfig, s_total: int,
                      soft_in: jnp.ndarray | None = None,
                      new_data: jnp.ndarray | None = None,
                      num_iters: int = decoder.DEFAULT_ITERS,
                      mesh=None, soft_flat: bool = False,
                      early_stop: bool = True) -> dict:
    """Full UL slot batch: (S, total) samples -> every UL channel's results.

    Returns a dict: payload (S,U,TBS), tb_ok (S,U), noise_var, cfo,
    soft (S,U*C,n_cb) HARQ state, ack_bits (S,U,2), ack_metric (S,U),
    csi_bits (S_csi,U,K), csi_ok (S_csi,U), srs_h (S_srs,U,m_sc),
    srs_snr_db (S_srs,U), prach_metric/delay/detected (S_prach,64).

    ``soft_flat``: accept/return the HARQ state in the decoder's native
    flat (S*U*C, n_cb) layout — round-tripping it through (S, U*C, n_cb)
    costs two full-tensor layout copies per batch when the state feeds
    straight back into the next dispatch (the bench path).
    """
    cell = fc.ul_cell()
    t = cell.timing
    s = rx.shape[0]
    u = fc.nof_ue
    rx_grid = ofdm.demodulate_slot(rx, t, scale=1.0)        # (S, nsymb, nsubc)

    llr, nv, cfo = sp._ul_front(None, fc.rntis(), cell, mesh=mesh,
                                rx_grid=rx_grid)
    seg, _ = sp._plans(cell, 0)
    sb_flat = soft_in if soft_in is None or soft_flat else \
        soft_in.reshape(s * u * seg.c, -1)
    nd_flat = None if new_data is None else new_data.reshape(s * u)
    payload, tb_ok, soft = sp._ul_back(llr.reshape(s * u, -1), cell, 0,
                                       num_iters, mesh, sb_flat,
                                       new_data=nd_flat,
                                       early_stop=early_stop)

    ack_bits, ack_metric = _f1_detect(rx_grid, fc, s_total)
    csi_idx = fc.csi_slots(s_total)
    csi_bits, csi_ok = _f2_decode(_slot_take(rx_grid, csi_idx), fc, s_total)
    srs_idx = fc.srs_slots(s_total)
    srs_h, srs_snr = _srs_estimate(_slot_take(rx_grid, srs_idx), fc)
    prach_idx = fc.prach_slots(s_total)
    info = fc.prach_info()
    win = _slot_take(rx, prach_idx)[:, :info.cp_samples + info.dft_size]
    rx_freq = prach_mod.ofdm_demodulate_prach(win, info)
    pr_metric, pr_delay, pr_det = _prach_detect_batch(rx_freq, fc)

    return {
        "payload": payload.reshape(s, u, -1),
        "tb_ok": tb_ok.reshape(s, u),
        "noise_var": nv, "cfo": cfo,
        "soft": soft if soft_flat else soft.reshape(s, u * seg.c, -1),
        "ack_bits": ack_bits, "ack_metric": ack_metric,
        "csi_bits": csi_bits, "csi_ok": csi_ok,
        "srs_h": srs_h, "srs_snr_db": srs_snr,
        "prach_metric": pr_metric, "prach_delay": pr_delay,
        "prach_detected": pr_det,
    }


# ============================================================ MIMO variants
#
# The multi-layer full gNB slot: the DATA plane (PDSCH/PUSCH) runs through
# the *_mimo slot programs (layer-mapped single codeword, type-1 CDM DM-RS,
# LxP whitened-Gram MMSE — slot_pipeline.dl_slot_batch_mimo /
# _ul_front_mimo); control channels (PDCCH/SSB down, PUCCH/SRS/PRACH up)
# stay single-port on port/antenna 0, like the reference transmits
# broadcast+control on a fixed port while PDSCH uses the precoded ports
# (resource_grid [sc x sym x port], precoding on PDSCH put only).

def _dl_control_rows(dci: jnp.ndarray, fc: FullCellConfig,
                     s_total: int) -> jnp.ndarray:
    """(S, nsymb, nsubc) port-0 control contribution: PDCCH row 0 every
    slot + NZP-CSI-RS occasions.  SSB blocks are added onto the SSB
    sub-batch by the caller (a static slice add — scattering them into the
    full batch here would lower to a per-occasion update loop)."""
    t = fc.timing
    prows = pdcch_rows(dci, fc, s_total)                    # (S, nsubc)
    extra = jnp.zeros((s_total, t.nsymb, t.nof_subc), jnp.complex64)
    extra = extra.at[:, 0].add(prows)
    extra = extra.at[:, fc.csi_rs_symbol].add(
        jnp.asarray(_csi_rs_rows_np(fc, s_total)))
    return extra


def gnb_dl_slot_batch_mimo(pay_norm: jnp.ndarray, pay_ssb: jnp.ndarray,
                           dci: jnp.ndarray, pbch: jnp.ndarray,
                           fc: FullCellConfig, s_total: int,
                           mesh=None) -> jnp.ndarray:
    """Full MIMO DL slot batch -> (S, L, total) per-port samples.

    pay_norm/pay_ssb at the L-layer TBS of dl_cell_mimo / dl_cell_ssb_mimo.
    """
    cell_n, cell_s = fc.dl_cell_mimo(), fc.dl_cell_ssb_mimo()
    ssb_idx = fc.ssb_slots(s_total)
    assert ssb_idx[0] == 0, "SSB slot offset != 0 unsupported here"
    k = fc.ssb_period
    rntis = fc.rntis()
    extra = _dl_control_rows(dci, fc, s_total)
    blocks = ssb_blocks(pbch, fc, s_total)                  # (S_ssb, 4, 240)
    sc0 = fc.ssb_first_subcarrier
    ex_s = _slot_take(extra, ssb_idx)
    ex_s = ex_s.at[:, 2:6, sc0:sc0 + 240].add(blocks)

    if os.environ.get("SRSRAN_TPU_MERGE_SAMPLES") == "1":
        # A/B: the r3 form — per-sub-batch modulate + sample interleave.
        td_n = sp.dl_slot_batch_mimo(pay_norm, rntis, cell_n, mesh=mesh,
                                     extra_rows=_slot_drop_period(extra, k))
        td_s = sp.dl_slot_batch_mimo(pay_ssb, rntis, cell_s, mesh=mesh,
                                     extra_rows=ex_s)
        td = _slot_merge_period(td_s, td_n, k, s_total)
    else:
        # Merge at the GRID level and modulate once (see gnb_dl_slot_batch:
        # the sample-level interleave materialised the matmul-DFT's
        # transposed layout through two full-tensor copies).
        g_n = sp.dl_slot_batch_mimo(pay_norm, rntis, cell_n, mesh=mesh,
                                    extra_rows=_slot_drop_period(extra, k),
                                    return_grid=True)
        g_s = sp.dl_slot_batch_mimo(pay_ssb, rntis, cell_s, mesh=mesh,
                                    extra_rows=ex_s, return_grid=True)
        grid = _slot_merge_period(g_s, g_n, k, s_total)
        t = fc.timing
        td = ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)
    from ..ops import amplitude
    if fc.tx_ceiling > 0:
        td, _ = amplitude.clip(td, fc.tx_gain, fc.tx_ceiling)
    else:
        td, _ = amplitude.scale(td, fc.tx_gain)
    return td


def ue_ul_slot_batch_mimo(payloads: jnp.ndarray, ack: jnp.ndarray,
                          csi: jnp.ndarray, fc: FullCellConfig,
                          s_total: int, prach_preamble: int = 7,
                          prach_delay: int = 24,
                          prach_amplitude: float = 0.002,
                          mesh=None) -> jnp.ndarray:
    """UE-side MIMO UL generator: (S, U, TBS_L) PUSCH payloads (+ ACK/CSI
    control) -> (S, L, total) per-port samples.  PUSCH layers on all ports;
    PUCCH F1/F2 + SRS + PRACH single-port on port 0 (see
    `ue_ul_slot_batch` for the PRACH power-control note)."""
    cell = fc.ul_cell()
    t = cell.timing
    u = fc.nof_ue
    extra = jnp.zeros((s_total, t.nsymb, t.nof_subc), jnp.complex64)
    extra = extra.at[:, :14, :u * 12].set(_f1_symbols(ack, fc, s_total))
    csi_idx = fc.csi_slots(s_total)
    extra = extra.at[jnp.asarray(csi_idx), 0:2].add(
        _f2_symbols(csi, fc, s_total))
    srs_idx = fc.srs_slots(s_total)
    extra = extra.at[jnp.asarray(srs_idx), 13].add(
        jnp.broadcast_to(_srs_rows(fc), (len(srs_idx), t.nof_subc)))

    td = sp.dl_slot_batch_mimo(payloads, fc.rntis(), cell, mesh=mesh,
                               extra_rows=extra)            # (S, L, total)
    prach_idx = fc.prach_slots(s_total)
    ptd = jnp.asarray(prach_occasion_td(fc, prach_preamble, prach_delay,
                                        prach_amplitude))
    return td.at[jnp.asarray(prach_idx), 0].add(ptd[None])


def gnb_ul_slot_batch_mimo(rx: jnp.ndarray, fc: FullCellConfig,
                           s_total: int,
                           soft_in: jnp.ndarray | None = None,
                           new_data: jnp.ndarray | None = None,
                           num_iters: int = decoder.DEFAULT_ITERS,
                           mesh=None, soft_flat: bool = False,
                           early_stop: bool = True) -> dict:
    """Full MIMO UL slot batch: (S, P, total) antenna samples -> the same
    result dict as `gnb_ul_slot_batch` (payload at the L-layer TBS).

    PUSCH runs the LxP whitened-Gram MMSE front over every antenna; the
    single-port control channels (PUCCH F1/F2, SRS, PRACH) are taken from
    antenna 0 — they ride REs disjoint from the PDSCH band, so antenna 0
    sees them through the channel's column 0 only.
    """
    cell = fc.ul_cell()
    t = cell.timing
    s, p_rx = rx.shape[:2]
    u = fc.nof_ue
    rx_grid = ofdm.demodulate_slot(rx.reshape(s * p_rx, -1), t, scale=1.0)
    rx_grid = rx_grid.reshape(s, p_rx, t.nsymb, t.nof_subc)

    llr, nv, cfo = sp._ul_front_mimo(None, fc.rntis(), cell, mesh=mesh,
                                     rx_grid=rx_grid)
    seg, _ = sp._plans(cell, 0)
    sb_flat = soft_in if soft_in is None or soft_flat else \
        soft_in.reshape(s * u * seg.c, -1)
    nd_flat = None if new_data is None else new_data.reshape(s * u)
    payload, tb_ok, soft = sp._ul_back(llr, cell, 0, num_iters, mesh,
                                       sb_flat, new_data=nd_flat,
                                       early_stop=early_stop)

    rx_grid0 = rx_grid[:, 0]
    ack_bits, ack_metric = _f1_detect(rx_grid0, fc, s_total)
    csi_idx = fc.csi_slots(s_total)
    csi_bits, csi_ok = _f2_decode(_slot_take(rx_grid0, csi_idx), fc,
                                  s_total)
    srs_idx = fc.srs_slots(s_total)
    srs_h, srs_snr = _srs_estimate(_slot_take(rx_grid0, srs_idx), fc)
    prach_idx = fc.prach_slots(s_total)
    info = fc.prach_info()
    win = _slot_take(rx, prach_idx)[:, 0, :info.cp_samples + info.dft_size]
    rx_freq = prach_mod.ofdm_demodulate_prach(win, info)
    pr_metric, pr_delay, pr_det = _prach_detect_batch(rx_freq, fc)

    return {
        "payload": payload.reshape(s, u, -1),
        "tb_ok": tb_ok.reshape(s, u),
        "noise_var": nv, "cfo": cfo,
        "soft": soft if soft_flat else soft.reshape(s, u * seg.c, -1),
        "ack_bits": ack_bits, "ack_metric": ack_metric,
        "csi_bits": csi_bits, "csi_ok": csi_ok,
        "srs_h": srs_h, "srs_snr_db": srs_snr,
        "prach_metric": pr_metric, "prach_delay": pr_delay,
        "prach_detected": pr_det,
    }
