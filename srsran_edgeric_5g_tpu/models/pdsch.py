"""PDSCH transmit processor: TB bits -> resource-grid contribution.

Counterpart of the reference's pdsch_processor_impl.cpp:30-183 (segment+CRC ->
LDPC encode -> rate match -> scramble -> modulate -> RE map -> DM-RS) and its
concurrent codeblock-forking variant (pdsch_processor_concurrent_impl.cpp:239)
— here codeblock parallelism is just the batch dimension of the encoder, and
multi-UE parallelism is vmap/sharding at the slot-pipeline level.

Static configuration (allocation, MCS, DM-RS layout) lives in PdschConfig;
`process` is jit-traceable with payload bits as the only runtime input.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from ..ops import dmrs as dmrs_mod
from ..ops import modulation, sequences
from ..ops.ldpc import encoder, rate_match, segmenter
from ..ran.numerology import N_SC_PER_PRB


@dataclasses.dataclass(frozen=True)
class PdschConfig:
    """Static per-UE PDSCH parameters for one slot."""

    rnti: int
    nof_prb: int                      # allocation width
    start_prb: int                    # within the grid
    first_symbol: int = 2             # data+dmrs span start
    nof_symbols: int = 12             # span length
    dmrs_symbols: tuple[int, ...] = (2, 11)   # absolute symbol indices
    modulation: str = "qam64"
    target_rate: float = 0.5          # code rate for TBS derivation
    n_id: int = 1                     # scrambling / DM-RS identity
    n_scid: int = 0
    slot: int = 0
    tbs: int | None = None            # explicit TBS (bits); derived if None
    # Limited-buffer rate matching (TS 38.212 §5.4.2.1): 0 = full buffer
    # N_cb = N; > 0 shortens the circular buffer to N_ref derived from this
    # TBS_LBRM (the reference derives it from the max supported TB size).
    tbs_lbrm: int = 0
    # DFT-s-OFDM (PUSCH transform precoding, TS 38.211 §6.3.1.4): per-symbol
    # DFT spread on TX, iDFT despread after equalization on RX (the
    # reference's transform_precoder_dft_impl / pusch_demodulator_impl:202).
    # DM-RS switches to the low-PAPR ZC sequence (§6.4.1.1.3, u = n_id mod
    # 30, no hopping) via pilot_values().
    transform_precoding: bool = False
    # Grid subcarrier index of the radio's DC position (None = no DC inside
    # the band / ZMQ loopback).  The receive chain zeroes the channel
    # estimate there so the equalizer's abnormal-input rule erases that
    # RE's LLRs — real radios put a distorted carrier at DC
    # (pusch_processor_impl.cpp:184-199).
    dc_position: int | None = None

    @property
    def data_symbols(self) -> tuple[int, ...]:
        return tuple(s for s in range(self.first_symbol,
                                      self.first_symbol + self.nof_symbols)
                     if s not in self.dmrs_symbols)

    @property
    def qm(self) -> int:
        return modulation.QM[self.modulation]

    @property
    def nof_data_re(self) -> int:
        return len(self.data_symbols) * self.nof_prb * N_SC_PER_PRB

    @property
    def g_total(self) -> int:
        """Total rate-matched bits G."""
        return self.nof_data_re * self.qm

    def derived_tbs(self) -> int:
        """TBS (payload bits): explicit override, or TS 38.214 §5.1.3.2.

        DM-RS symbols carry no data in this configuration, so the per-PRB
        DM-RS overhead is 12 REs per DM-RS symbol.
        """
        if self.tbs is not None:
            return self.tbs
        from ..ran.tbs import tbs as tbs_calc, nof_re
        nre = nof_re(self.nof_prb, self.nof_symbols,
                     12 * len(self.dmrs_symbols))
        return tbs_calc(nre, self.target_rate, self.qm)


@functools.lru_cache(maxsize=None)
def _plans(cfg: PdschConfig, rv: int = 0, e_total: int | None = None):
    """``e_total`` overrides the rate-matched length (UCI-on-PUSCH
    rate-matches the UL-SCH around the UCI REs: E = G - G_uci)."""
    tbs = cfg.derived_tbs()
    bg = segmenter.select_base_graph(tbs, cfg.target_rate)
    seg = segmenter.get_segment_plan(tbs, bg, e_total or cfg.g_total, cfg.qm)
    n_cb = (rate_match.lbrm_n_cb(seg.bg, seg.zc, seg.c, cfg.tbs_lbrm)
            if cfg.tbs_lbrm > 0 else None)
    rms = tuple(rate_match.get_rate_match_plan(seg.bg, seg.zc, e, rv, cfg.qm,
                                               seg.k_prime, n_cb=n_cb)
                for e in sorted(set(seg.e)))
    return seg, rms


def scrambling_c_init(rnti: int, n_id: int, q: int = 0) -> int:
    """TS 38.211 §7.3.1.1: c_init = rnti*2^15 + q*2^14 + n_id."""
    return (rnti << 15) + (q << 14) + n_id


def encode_transport_block(payload: jnp.ndarray, cfg: PdschConfig,
                           rv: int = 0, scramble: bool = True,
                           e_total: int | None = None) -> jnp.ndarray:
    """(1, TBS) payload bits -> (1, G) scrambled codeword bits.

    ``scramble=False`` returns the pre-scrambling stream (UCI-on-PUSCH
    multiplexing happens between rate matching and scrambling);
    ``e_total`` shortens the rate-matched length (SCH around UCI)."""
    seg, rms = _plans(cfg, rv, e_total)
    cbs = segmenter.segment_tb(payload, seg)          # (C, K)
    cw = encoder.encode(cbs, seg.bg, seg.zc)          # (C, cols*Zc)
    if len(rms) == 1:
        bits = rate_match.rate_match(cw, rms[0]).reshape(1, -1)
    else:  # unequal E split: short CBs first (TS 38.212 §5.4.2.1)
        parts, idx = [], 0
        for e in seg.e:
            plan = next(p for p in rms if p.e == e)
            parts.append(rate_match.rate_match(cw[idx:idx + 1], plan))
            idx += 1
        bits = jnp.concatenate([p.reshape(-1) for p in parts])[None, :]
    if not scramble:
        return bits
    ci = jnp.asarray([scrambling_c_init(cfg.rnti, cfg.n_id)], dtype=jnp.uint32)
    return sequences.scramble_bits(bits, ci)


def pilot_values(cfg: PdschConfig, l: int, pat) -> jnp.ndarray:
    """DM-RS values for symbol ``l`` over ``pat``'s pilots (without w_f).

    CP-OFDM: Gold pseudo-random QPSK (TS 38.211 §7.4.1.1.1).  Transform
    precoding (DFT-s-OFDM): low-PAPR ZC-based sequence r_{u,v} with
    u = n_id mod 30, v = 0, alpha = 0 (no group/sequence hopping, TS 38.211
    §6.4.1.1.3 — the reference's low_papr_sequence_generator path).
    """
    if cfg.transform_precoding:
        from ..ops import low_papr
        seq = low_papr.base_sequence(cfg.n_id % 30, 0, len(pat.subcarriers))
        return jnp.asarray(seq.astype(np.complex64))
    ci = jnp.asarray([dmrs_mod.dmrs_c_init(cfg.slot, l, cfg.n_id, cfg.n_scid)],
                     dtype=jnp.uint32)
    return dmrs_mod.dmrs_sequence(ci, len(pat.subcarriers),
                                  skip_pilots=6 * cfg.start_prb)[0]


def map_to_grid(symbols: jnp.ndarray, cfg: PdschConfig, nsymb: int,
                nsubc: int, amplitude: float = 1.0,
                dmrs_scale: float = 1.0) -> jnp.ndarray:
    """(1, nof_data_re) symbols -> (nsymb, nsubc) grid contribution.

    Frequency-first mapping across the allocation, symbols in time order,
    plus DM-RS pilots on the configured symbols.  ``dmrs_scale`` is the
    DM-RS-to-data amplitude ratio beta: 1.0 for the DL defaults
    (cross-validated vs pdsch_processor at 0 dB EPRE ratios); the PUSCH
    paths pass sqrt(2) — the reference receiver ASSUMES the TS 38.214
    3 dB DM-RS boost for 2 CDM groups without data
    (get_sch_to_dmrs_ratio_dB, dmrs_pusch_estimator scaling), and an
    unboosted transmit scales its equalized constellation by sqrt(2),
    breaking every modulation above QPSK.
    """
    sc0 = cfg.start_prb * N_SC_PER_PRB
    width = cfg.nof_prb * N_SC_PER_PRB
    grid = jnp.zeros((nsymb, nsubc), jnp.complex64)
    data = symbols.reshape(len(cfg.data_symbols), width) * jnp.float32(amplitude)
    sym_idx = jnp.asarray(np.asarray(cfg.data_symbols, dtype=np.int32))
    grid = grid.at[sym_idx, sc0:sc0 + width].set(data.astype(jnp.complex64))

    pat = dmrs_mod.dmrs_pattern(1, cfg.nof_prb, port=0)
    for l in cfg.dmrs_symbols:
        pil = pilot_values(cfg, l, pat)
        vals = pil * jnp.asarray(pat.wf) * jnp.float32(amplitude * dmrs_scale)
        grid = grid.at[l, jnp.asarray(pat.subcarriers + sc0)].set(vals)
    return grid


def process(payload: jnp.ndarray, cfg: PdschConfig, nsymb: int, nsubc: int,
            rv: int = 0, amplitude: float = 1.0) -> jnp.ndarray:
    """Full PDSCH: (1, TBS) payload -> (nsymb, nsubc) grid contribution."""
    bits = encode_transport_block(payload, cfg, rv)
    syms = modulation.modulate(bits, cfg.modulation)
    if cfg.transform_precoding:
        from ..ops import precoding
        syms = precoding.transform_precode(syms, cfg.nof_prb * N_SC_PER_PRB)
    return map_to_grid(syms, cfg, nsymb, nsubc, amplitude)


def receive(rx_grid: jnp.ndarray, cfg: PdschConfig, srate: float,
            symbol_times: np.ndarray, rv: int = 0,
            soft_buffer: jnp.ndarray | None = None,
            num_iters: int | None = None, scs_hz: float = 15e3,
            delay_spread_s: float | None = None):
    """UE-side PDSCH receiver: (nsymb, nsubc) rx grid -> PuschResult.

    Fills the srsue role (the reference closes DL through the 4G UE's NR
    PHY, srs-4G-UE/lib/src/phy/phch/): the same estimate -> MMSE equalize ->
    demap -> descramble -> dematch -> LDPC chain as the gNB PUSCH receiver,
    but with DL DM-RS conventions — no TS 38.214 3 dB DM-RS boost
    (pdsch_processor transmits 0 dB EPRE ratios) and no UCI multiplexing.
    DL BLER and link adaptation can therefore close the loop as actual DL
    (pdsch.process TX -> channel -> pdsch.receive RX) instead of reusing the
    PUSCH pair.  HARQ retransmission combining uses ``soft_buffer``/``rv``
    exactly as in UL.
    """
    from . import pusch
    kw = {} if num_iters is None else {"num_iters": num_iters}
    return pusch.process(rx_grid, cfg, srate, symbol_times, rv=rv,
                         soft_buffer=soft_buffer, scs_hz=scs_hz,
                         delay_spread_s=delay_spread_s, uci=None,
                         dmrs_beta=1.0, **kw)
