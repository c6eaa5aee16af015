"""PUSCH receive processor: rx resource grid -> decoded TB + CSI.

Counterpart of the reference's pusch_processor_impl.cpp:115-298 /
pusch_demodulator_impl.cpp:129-260 / pusch_decoder_impl.cpp: DM-RS channel
estimation -> MMSE equalization -> max-log soft demap -> descramble -> rate
dematch (with HARQ soft combining) -> layered min-sum LDPC decode -> TB CRC.

Configuration shares PdschConfig's allocation geometry (the zmq loopback uses
symmetric DL/UL shapes); `process` is jit-traceable over the received grid
and an optional HARQ soft buffer.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

PUSCH_DMRS_BETA = float(np.sqrt(2.0))  # DM-RS 3 dB above data (2 CDM groups w/o data, TS 38.214)

from ..ops import channel_est, dmrs as dmrs_mod, equalizer, modulation, \
    sequences, short_block, ulsch_demux
from ..ops.ldpc import decoder, rate_match, segmenter
from ..ran.numerology import N_SC_PER_PRB
from .pdsch import PdschConfig, _plans, scrambling_c_init


@dataclasses.dataclass(frozen=True)
class UciConfig:
    """UCI piggybacked on PUSCH (TS 38.212 §6.2.7 / the reference's
    ulsch_demultiplex + pusch UCI decoder buffers,
    pusch_processor_impl.cpp:222-289).

    n_* are payload bits (short block for <= 11, polar CA-SCL for >= 12 —
    ops.uci, matching the reference's uci_decoder); g_* are the coded bit
    counts reserved on the PUSCH.
    """

    n_ack: int = 0
    g_ack: int = 0
    n_csi1: int = 0
    g_csi1: int = 0
    g_ack_rvd: int = 0   # reserved REs (o_ack <= 2 puncture mode)
    n_csi2: int = 0
    g_csi2: int = 0


def _uci_plan(cfg: PdschConfig, uci: UciConfig):
    return ulsch_demux.get_demux_plan(
        cfg.g_total, cfg.qm, cfg.nof_prb * N_SC_PER_PRB,
        cfg.data_symbols, cfg.dmrs_symbols[0], uci.g_ack, uci.g_csi1,
        g_ack_rvd=uci.g_ack_rvd, o_ack=uci.n_ack if uci.n_ack else 3,
        g_csi2=uci.g_csi2)


def transmit(payload: jnp.ndarray, cfg: PdschConfig, nsymb: int, nsubc: int,
             rv: int = 0, uci: UciConfig | None = None,
             ack_bits: jnp.ndarray | None = None,
             csi1_bits: jnp.ndarray | None = None,
             csi2_bits: jnp.ndarray | None = None) -> jnp.ndarray:
    """UE-side PUSCH transmit: UL-SCH (+ optional UCI mux) -> grid.

    Identical to pdsch.process when no UCI; with UCI the short-block-coded
    ACK/CSI bits overwrite their reserved PUSCH positions before scrambling.
    """
    from . import pdsch as pdsch_mod

    if uci is None:
        bits = pdsch_mod.encode_transport_block(payload, cfg, rv)
    else:
        # The UL-SCH rate-matches to G_sch = len(plan.sch_positions):
        # G - G_uci in the skip mode (o_ack > 2), the full G in the
        # reserved mode (the ACK then punctures its reserved subset).
        plan = _uci_plan(cfg, uci)
        bits = pdsch_mod.encode_transport_block(payload, cfg, rv,
                                                scramble=False,
                                                e_total=plan.sch_len)
        from ..ops import uci as uci_ops
        ack_c = uci_ops.encode(ack_bits, uci.g_ack) if uci.n_ack else None
        csi_c = uci_ops.encode(csi1_bits, uci.g_csi1) if uci.n_csi1 else None
        csi2_c = uci_ops.encode(csi2_bits, uci.g_csi2) if uci.n_csi2 else None
        bits = ulsch_demux.multiplex(bits, plan, ack_c, csi_c, csi2_c)
        ci = jnp.asarray([scrambling_c_init(cfg.rnti, cfg.n_id)],
                         dtype=jnp.uint32)
        bits = sequences.scramble_bits(bits, ci)
    syms = modulation.modulate(bits, cfg.modulation)
    if cfg.transform_precoding:
        from ..ops import precoding
        syms = precoding.transform_precode(syms, cfg.nof_prb * N_SC_PER_PRB)
    # PUSCH DM-RS is 3 dB above data (2 CDM groups w/o data, TS 38.214;
    # the reference receiver assumes it — see map_to_grid docstring).
    return pdsch_mod.map_to_grid(syms, cfg, nsymb, nsubc,
                                 dmrs_scale=PUSCH_DMRS_BETA)


@dataclasses.dataclass
class PuschResult:
    payload: jnp.ndarray        # (1, TBS) decoded bits
    tb_crc_ok: jnp.ndarray      # (1,) bool
    cb_crc_ok: jnp.ndarray      # (C,) bool per-codeblock parity
    soft_buffer: jnp.ndarray    # (C, N_cb) accumulated LLRs (HARQ state)
    noise_var: jnp.ndarray      # scalar estimated noise variance
    cfo_hz: jnp.ndarray         # scalar estimated CFO
    evm_sinr_db: jnp.ndarray    # scalar post-equalization SINR estimate
    ack_bits: jnp.ndarray | None = None   # (1, n_ack) detected HARQ-ACK
    csi1_bits: jnp.ndarray | None = None  # (1, n_csi1) detected CSI part 1
    csi2_bits: jnp.ndarray | None = None  # (1, n_csi2) detected CSI part 2


def channel_estimate(rx_grid: jnp.ndarray, cfg: PdschConfig, srate: float,
                     symbol_times: np.ndarray, scs_hz: float = 15e3,
                     delay_spread_s: float | None = None,
                     dmrs_beta: float = PUSCH_DMRS_BETA):
    """Estimate the allocation's channel from the configured DM-RS symbols.

    rx_grid: (nsymb, nsubc).  Returns (h (width,), noise_var (), cfo ()).

    ``delay_spread_s`` switches to the reference's full estimator chain
    (port_channel_estimator_average_impl: IDFT time alignment + smoothing):
    TA-derotated interpolation plus windowed-sinc frequency denoising sized
    to the given delay spread.

    ``dmrs_beta`` is the transmitted DM-RS-to-data amplitude ratio the
    estimator undoes before the conj-product LS estimate: sqrt(2) for PUSCH
    (TS 38.214 3 dB boost, 2 CDM groups w/o data), 1.0 for the DL PDSCH
    defaults (0 dB EPRE ratios) when this chain runs as the UE-side PDSCH
    receiver (srsue role, srs-4G-UE/lib/src/phy/phch/pdsch_nr.c).
    """
    sc0 = cfg.start_prb * N_SC_PER_PRB
    width = cfg.nof_prb * N_SC_PER_PRB
    pat = dmrs_mod.dmrs_pattern(1, cfg.nof_prb, port=0)
    rx_p, ref_p = [], []
    from .pdsch import pilot_values
    for l in cfg.dmrs_symbols:
        pil = pilot_values(cfg, l, pat)      # Gold QPSK / low-PAPR ZC
        ref_p.append(pil * jnp.asarray(pat.wf))
        # Undo the transmitted DM-RS boost (ls_estimate wants |P|=1).
        rx_p.append(rx_grid[l, jnp.asarray(pat.subcarriers + sc0)]
                    * jnp.float32(1.0 / dmrs_beta))
    rx_pilots = jnp.stack(rx_p)[None]      # (1, ndmrs, npil)
    ref_pilots = jnp.stack(ref_p)[None]
    times = np.asarray([symbol_times[l] for l in cfg.dmrs_symbols])
    times = times if len(cfg.dmrs_symbols) > 1 else None
    if delay_spread_s is not None:
        h, nv, cfo, _ = channel_est.estimate_port_ta(
            rx_pilots, ref_pilots, pat.subcarriers, width, scs_hz,
            dmrs_symbol_times_s=times, delay_spread_s=delay_spread_s)
    else:
        h, nv, cfo = channel_est.estimate_port(
            rx_pilots, ref_pilots, pat.subcarriers, width,
            dmrs_symbol_times_s=times)
    return h[0], nv[0], cfo[0]


def process(rx_grid: jnp.ndarray, cfg: PdschConfig, srate: float,
            symbol_times: np.ndarray, rv: int = 0,
            soft_buffer: jnp.ndarray | None = None,
            num_iters: int = decoder.DEFAULT_ITERS,
            scs_hz: float = 15e3,
            delay_spread_s: float | None = None,
            uci: UciConfig | None = None,
            dmrs_beta: float = PUSCH_DMRS_BETA) -> PuschResult:
    """Full PUSCH receive for one UE from an (nsymb, nsubc) rx grid.

    With ``dmrs_beta=1.0`` and no UCI this same chain is the UE-side PDSCH
    receiver (DL DM-RS conventions) — see ``models.pdsch.receive``.
    """
    plan_u = _uci_plan(cfg, uci) if uci is not None else None
    seg, rms = _plans(cfg, rv,
                      plan_u.sch_len if plan_u is not None else None)
    sc0 = cfg.start_prb * N_SC_PER_PRB
    width = cfg.nof_prb * N_SC_PER_PRB

    h, nv, cfo = channel_estimate(rx_grid, cfg, srate, symbol_times,
                                  scs_hz, delay_spread_s, dmrs_beta)
    # DC-position zeroing (pusch_processor_impl.cpp:184-199): a zero
    # channel estimate makes equalize_mmse_1xn treat the DC RE as an
    # invalid port -> x_hat 0, nvar inf -> the demapper erases its LLRs.
    if cfg.dc_position is not None and \
            sc0 <= cfg.dc_position < sc0 + width:
        h = h.at[cfg.dc_position - sc0].set(0.0 + 0.0j)

    sym_idx = jnp.asarray(np.asarray(cfg.data_symbols, dtype=np.int32))
    y = rx_grid[sym_idx, sc0:sc0 + width]             # (ndata_sym, width)
    # CFO compensation of the data symbols: the estimate is anchored at t=0
    # (estimate_port derotates the pilots by their symbol times), so each
    # data symbol still rotates by e^{j2pi*cfo*t_l}.  The reference instead
    # re-applies the CFO ramp onto every symbol's channel estimate
    # (port_channel_estimator_average_impl.cpp:245-253) — same algebra.
    if len(cfg.dmrs_symbols) > 1:
        import jax
        t_data = np.asarray([symbol_times[l] for l in cfg.data_symbols],
                            np.float32)
        ph = np.float32(-2.0 * np.pi) * cfo * jnp.asarray(t_data)
        y = y * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))[:, None]
    hh = jnp.broadcast_to(h, y.shape)
    x_hat, nv_out = equalizer.equalize_mmse_1xn(
        y[None], hh[None], nv[None, None])            # port axis added

    if cfg.transform_precoding:
        # iDFT despread per data symbol (pusch_demodulator_impl.cpp:202);
        # the block iDFT whitens the per-RE noise, so demap with the
        # block-average variance.
        from ..ops import precoding
        x_hat = precoding.transform_deprecode(x_hat, width)
        nv_out = jnp.broadcast_to(
            jnp.mean(nv_out, axis=-1, keepdims=True), nv_out.shape)

    # Soft demap with per-RE noise variance, then descramble.
    llr = modulation.demodulate_soft(x_hat.reshape(1, -1), nv_out.reshape(1, -1),
                                     cfg.modulation, quantize=False)
    # Reference int8 wire domain (float dtype) -> 'wire_auto' decode below
    # is bit-identical to the reference's production (avx2) decoder.
    llr = modulation.wire_quantize(llr, cfg.modulation)
    ci = jnp.asarray([scrambling_c_init(cfg.rnti, cfg.n_id)], dtype=jnp.uint32)
    llr = sequences.scramble_llrs(llr, ci)            # (1, G)

    # UCI-on-PUSCH: pull ACK/CSI LLRs out, erase their SCH positions
    # (pusch_processor_impl.cpp:222-289 buffer split + ulsch_demultiplex).
    ack_bits = csi1_bits = csi2_bits = None
    if uci is not None:
        from ..ops import uci as uci_ops
        llr, ack_llr, csi_llr, csi2_llr = ulsch_demux.demultiplex(llr, plan_u)
        if uci.n_ack:
            ack_bits, _ = uci_ops.decode(ack_llr, uci.n_ack, uci.g_ack)
        if uci.n_csi1:
            csi1_bits, _ = uci_ops.decode(csi_llr, uci.n_csi1, uci.g_csi1)
        if uci.n_csi2:
            csi2_bits, _ = uci_ops.decode(csi2_llr, uci.n_csi2, uci.g_csi2)

    # Split G into per-codeblock E spans and rate-dematch each.
    per_cb = []
    off = 0
    for i, e in enumerate(seg.e):
        plan = next(p for p in rms if p.e == e)
        cb_llr = llr[:, off:off + e]
        prev = None if soft_buffer is None else soft_buffer[i:i + 1]
        per_cb.append((rate_match.rate_dematch(cb_llr, plan, prev), plan))
        off += e
    full_llrs = jnp.concatenate([x for x, _ in per_cb], axis=0)  # (C, cols*Zc)
    # HARQ state: the accumulated circular buffer (strip puncture/fillers tail).
    zc = seg.zc
    new_soft = full_llrs[:, 2 * zc:2 * zc + rms[0].n_cb]

    hard, cb_ok = decoder.decode(full_llrs, seg.bg, seg.zc,
                                 num_iters=num_iters, schedule="wire_auto")
    payload, tb_ok = segmenter.desegment_tb(hard, seg)

    sinr = 10.0 * jnp.log10(jnp.maximum(
        1.0 / jnp.maximum(jnp.mean(jnp.where(jnp.isfinite(nv_out), nv_out, 1.0)),
                          1e-9), 1e-9))
    return PuschResult(payload=payload, tb_crc_ok=tb_ok, cb_crc_ok=cb_ok,
                       soft_buffer=new_soft, noise_var=nv, cfo_hz=cfo,
                       evm_sinr_db=sinr, ack_bits=ack_bits,
                       csi1_bits=csi1_bits, csi2_bits=csi2_bits)
