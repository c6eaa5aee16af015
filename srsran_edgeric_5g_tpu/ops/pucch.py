"""PUCCH formats 0, 1 and 2 (TS 38.211 §6.3.2, TS 38.213 §9.2).

Counterparts of the reference's pucch_detector_format0.cpp,
pucch_detector_format1.cpp, pucch_demodulator_impl.cpp and
pucch_processor_impl.cpp:

  * Format 0: sequence-selection on one PRB — detection is a correlation of
    the received REs against all cyclic-shift hypotheses at once (one matmul
    over the 12-point sequences).
  * Format 1: base sequence with time-domain OCC spreading and BPSK/QPSK
    data; detection despreads across symbols then correlates.
  * Format 2: QPSK data + DM-RS on subcarriers (3k+1); receive = channel
    estimate from its DM-RS, MMSE equalize, demap, then short-block or polar
    UCI decode (ops.short_block / ops.polar).

Group hopping: 'neither' (the default in the reference configs) — u = n_ID
mod 30, v = 0.  Cyclic-shift hopping n_cs(ns, l) uses the slot's Gold
sequence, precomputed host-side per static config.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from . import short_block
from .equalizer import equalize_mmse_1xn
from .low_papr import base_sequence
from .modulation import demodulate_soft, modulate
from .sequences import np_gold_sequence
from .polar import code as polar_code, decoder as polar_decoder
from .polar import encoder as polar_encoder, list_decoder as polar_list
from .polar import rate_match as polar_rm
from .sequences import gold_sequence, scramble_bits, scramble_llrs

NSC = 12


# ---------------------------------------------------------------- format 0/1

@dataclasses.dataclass(frozen=True)
class Pucch01Config:
    n_id: int          # hopping id (cell id by default)
    slot: int
    start_symbol: int
    nof_symbols: int   # 1-2 (F0), 4-14 (F1)
    initial_cs: int
    prb: int = 0       # PRB offset of the single-PRB allocation

    @property
    def u(self) -> int:
        return self.n_id % 30


@functools.lru_cache(maxsize=None)
def _ncs_table(n_id: int, slot: int) -> np.ndarray:
    """n_cs(ns, l) for all 14 symbols (TS 38.211 §6.3.2.2.2)."""
    c = np_gold_sequence(n_id, 8 * 14 * (slot + 1))
    base = 8 * 14 * slot
    out = np.zeros(14, dtype=np.int64)
    for l in range(14):
        bits = c[base + 8 * l: base + 8 * l + 8]
        out[l] = int((bits * (1 << np.arange(8))).sum())
    return out


def _f0_sequence(cfg: Pucch01Config, m0: int, symbol: int) -> np.ndarray:
    ncs = _ncs_table(cfg.n_id, cfg.slot)[symbol]
    alpha = 2.0 * np.pi / NSC * ((m0 + ncs) % NSC)
    base = base_sequence(cfg.u, 0, NSC)
    n = np.arange(NSC)
    return (np.exp(1j * alpha * n) * base).astype(np.complex64)


def format0_generate(cfg: Pucch01Config, m0: int) -> jnp.ndarray:
    """(nof_symbols, 12) sequence REs for initial cyclic shift m0."""
    rows = [_f0_sequence(cfg, m0, cfg.start_symbol + i)
            for i in range(cfg.nof_symbols)]
    return jnp.asarray(np.stack(rows))


def format0_detect(rx: jnp.ndarray, cfg: Pucch01Config,
                   m0_candidates: tuple[int, ...]) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Correlate (nof_symbols, 12) rx REs against m0 hypotheses.

    Returns (metrics (len(cands),), best index).  The caller maps m0 to
    HARQ-ACK/SR values per TS 38.213 §9.2.3/9.2.5.
    """
    cands = jnp.stack([format0_generate(cfg, m0) for m0 in m0_candidates])
    corr = jnp.abs(jnp.sum(rx[None] * jnp.conj(cands), axis=(-2, -1)))
    energy = jnp.sqrt(jnp.sum(jnp.abs(rx) ** 2) + 1e-30)
    metrics = corr / (energy * np.sqrt(NSC * cfg.nof_symbols))
    return metrics, jnp.argmax(metrics)


# Format 1 time-domain OCC: w_i(m) = e^{j 2 pi phi_i(m) / N_SF} with
# phi_i(m) = i*m (TS 38.211 Table 6.3.2.4.1-2; the reference builds the same
# table in pucch_orthogonal_sequence.h with std::polar(+rho)).
def _occ(n: int, i: int) -> np.ndarray:
    k = np.arange(n)
    return np.exp(2j * np.pi * i * k / n).astype(np.complex64)


def format1_generate(cfg: Pucch01Config, bits: np.ndarray,
                     occ_index: int = 0) -> jnp.ndarray:
    """PUCCH F1 data rows: d * w_i(m) * r^(alpha)(n) at the ODD symbol
    offsets (TS 38.211 §6.3.2.4.1 — DM-RS rides the even offsets, see
    format1_dmrs; the reference detector despreads the odd symbols,
    pucch_detector_format1.cpp:239).  1 bit -> BPSK, 2 bits -> QPSK.
    """
    nof_data = cfg.nof_symbols // 2
    if len(bits) == 1:
        d = (1 - 2 * int(bits[0])) / np.sqrt(2) * (1 + 1j)
    else:
        d = ((1 - 2 * int(bits[0])) + 1j * (1 - 2 * int(bits[1]))) / np.sqrt(2)
    w = _occ(nof_data, occ_index)
    rows = []
    for m in range(nof_data):
        seq = _f0_sequence(cfg, cfg.initial_cs, cfg.start_symbol + 2 * m + 1)
        rows.append(d * w[m] * seq)
    return jnp.asarray(np.stack(rows).astype(np.complex64))


def format1_dmrs(cfg: Pucch01Config, occ_index: int = 0) -> jnp.ndarray:
    """PUCCH F1 DM-RS rows: w_i(m) * r^(alpha)(n) at the EVEN symbol offsets
    (TS 38.211 §6.4.1.3.1, N_SF^DMRS = ceil(nof_symbols/2); reference
    dmrs_pucch_processor_format1_impl.cpp:128)."""
    nof_dmrs = (cfg.nof_symbols + 1) // 2
    w = _occ(nof_dmrs, occ_index)
    rows = []
    for m in range(nof_dmrs):
        seq = _f0_sequence(cfg, cfg.initial_cs, cfg.start_symbol + 2 * m)
        rows.append(w[m] * seq)
    return jnp.asarray(np.stack(rows).astype(np.complex64))


def format1_process(bits: np.ndarray, cfg: Pucch01Config, nsymb: int,
                    nsubc: int, occ_index: int = 0) -> jnp.ndarray:
    """Full F1 occasion -> (nsymb, nsubc) grid contribution (data + DM-RS)."""
    data = format1_generate(cfg, bits, occ_index)
    dmrs = format1_dmrs(cfg, occ_index)
    sc0 = cfg.prb * NSC
    grid = jnp.zeros((nsymb, nsubc), jnp.complex64)
    for m in range(dmrs.shape[0]):
        grid = grid.at[cfg.start_symbol + 2 * m, sc0:sc0 + NSC].set(dmrs[m])
    for m in range(data.shape[0]):
        grid = grid.at[cfg.start_symbol + 2 * m + 1, sc0:sc0 + NSC].set(data[m])
    return grid


def format1_detect(rx_data: jnp.ndarray, cfg: Pucch01Config, nof_bits: int,
                   occ_index: int = 0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Despread + correlate: (nof_data_symbols, 12) rx rows (the ODD symbol
    offsets of the occasion) -> (bits, metric)."""
    nof_data = rx_data.shape[0]
    w = jnp.asarray(_occ(nof_data, occ_index))
    seqs = jnp.stack([jnp.asarray(_f0_sequence(cfg, cfg.initial_cs,
                                               cfg.start_symbol + 2 * m + 1))
                      for m in range(nof_data)])
    z = jnp.sum(rx_data * jnp.conj(seqs) * jnp.conj(w)[:, None], axis=(0, 1)) \
        / (nof_data * NSC)
    if nof_bits == 1:
        bits = jnp.asarray([jnp.real(z) + jnp.imag(z) < 0], jnp.int8)
    else:
        bits = jnp.stack([(jnp.real(z) < 0), (jnp.imag(z) < 0)]).astype(jnp.int8)
    return bits, jnp.abs(z)


# ------------------------------------------------------------------ format 2

@dataclasses.dataclass(frozen=True)
class Pucch2Config:
    rnti: int
    n_id: int          # scrambling id
    n_id0: int         # DM-RS scrambling id
    slot: int
    start_symbol: int
    nof_symbols: int   # 1-2
    start_prb: int
    nof_prb: int
    uci_bits: int

    @property
    def data_sc_per_prb(self) -> int:
        return 8  # 12 minus 4 DM-RS (subcarriers 3k+1)

    @property
    def e_total(self) -> int:
        return 2 * self.data_sc_per_prb * self.nof_prb * self.nof_symbols  # QPSK


def _f2_data_sc(nof_prb: int) -> np.ndarray:
    """Data subcarriers within the allocation (all except 3k+1)."""
    sc = np.arange(NSC * nof_prb)
    return sc[sc % 3 != 1]


def _f2_dmrs_sc(nof_prb: int) -> np.ndarray:
    sc = np.arange(NSC * nof_prb)
    return sc[sc % 3 == 1]


def _f2_dmrs_cinit(cfg: Pucch2Config, symbol: int) -> int:
    return ((1 << 17) * (14 * cfg.slot + symbol + 1) * (2 * cfg.n_id0 + 1)
            + 2 * cfg.n_id0) % (1 << 31)


def format2_uci_encode(bits: jnp.ndarray, cfg: Pucch2Config) -> jnp.ndarray:
    """(1, K) UCI bits -> (1, E) coded bits (ops.uci: short block K<=11;
    polar with CRC6+PC for 12<=K<=19, CRC11 for K>=20)."""
    from . import uci as uci_ops
    return uci_ops.encode(bits, cfg.e_total)


def format2_process(payload_bits: jnp.ndarray, cfg: Pucch2Config,
                    nsymb: int, nsubc: int) -> jnp.ndarray:
    """UCI bits -> (nsymb, nsubc) grid contribution (data + DM-RS)."""
    coded = format2_uci_encode(payload_bits, cfg)
    ci = jnp.asarray([(cfg.rnti << 15) + cfg.n_id], dtype=jnp.uint32)
    scr = scramble_bits(coded, ci)
    syms = modulate(scr, "qpsk").reshape(cfg.nof_symbols, -1)

    grid = jnp.zeros((nsymb, nsubc), jnp.complex64)
    sc0 = cfg.start_prb * NSC
    data_sc = jnp.asarray(_f2_data_sc(cfg.nof_prb) + sc0)
    dmrs_sc = jnp.asarray(_f2_dmrs_sc(cfg.nof_prb) + sc0)
    npil = len(_f2_dmrs_sc(cfg.nof_prb))
    for i in range(cfg.nof_symbols):
        l = cfg.start_symbol + i
        grid = grid.at[l, data_sc].set(syms[i])
        cinit = _f2_dmrs_cinit(cfg, l)
        c = np_gold_sequence(cinit, 2 * (npil + 4 * cfg.start_prb))
        c = c[8 * cfg.start_prb:]
        pil = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
        grid = grid.at[l, dmrs_sc].set(jnp.asarray(pil[:npil].astype(np.complex64)))
    return grid


def format2_decode(rx_grid: jnp.ndarray, cfg: Pucch2Config
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(nsymb, nsubc) rx grid -> ((1, K) UCI bits, (1,) crc/detection ok)."""
    sc0 = cfg.start_prb * NSC
    data_sc = jnp.asarray(_f2_data_sc(cfg.nof_prb) + sc0)
    dmrs_sc = jnp.asarray(_f2_dmrs_sc(cfg.nof_prb) + sc0)
    npil = len(_f2_dmrs_sc(cfg.nof_prb))

    # Per-symbol LS estimate at the F2 DM-RS, averaged, nearest-pilot interp
    # (pilot spacing 3 -> piecewise-constant is adequate at PUCCH bandwidths).
    h_syms, resid = [], []
    for i in range(cfg.nof_symbols):
        l = cfg.start_symbol + i
        cinit = _f2_dmrs_cinit(cfg, l)
        c = np_gold_sequence(cinit, 2 * (npil + 4 * cfg.start_prb))
        c = c[8 * cfg.start_prb:]
        pil = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
        pil = jnp.asarray(pil[:npil].astype(np.complex64))
        h_syms.append(rx_grid[l, dmrs_sc] * jnp.conj(pil))
    h_p = jnp.mean(jnp.stack(h_syms), axis=0)          # (npil,)
    if cfg.nof_symbols >= 2:
        r = jnp.stack(h_syms) - h_p[None]
        noise_var = jnp.mean(jnp.abs(r) ** 2) * (cfg.nof_symbols /
                                                 (cfg.nof_symbols - 1))
    else:
        d = h_p[1:] - h_p[:-1]
        noise_var = jnp.mean(jnp.abs(d) ** 2) / 2.0

    # Nearest-pilot mapping data sc -> pilot index (static).
    pilots_pos = _f2_dmrs_sc(cfg.nof_prb)
    data_pos = _f2_data_sc(cfg.nof_prb)
    nearest = np.abs(data_pos[:, None] - pilots_pos[None, :]).argmin(axis=1)
    h_data = h_p[jnp.asarray(nearest)]                  # (ndata,)

    y = jnp.stack([rx_grid[cfg.start_symbol + i, data_sc]
                   for i in range(cfg.nof_symbols)])    # (nsym, ndata)
    hh = jnp.broadcast_to(h_data, y.shape)
    nv = jnp.broadcast_to(noise_var, y.shape)
    xh, nvo = equalize_mmse_1xn(y[None], hh[None], nv[None])
    llr = demodulate_soft(xh.reshape(1, -1), nvo.reshape(1, -1), "qpsk",
                          quantize=False)
    ci = jnp.asarray([(cfg.rnti << 15) + cfg.n_id], dtype=jnp.uint32)
    llr = scramble_llrs(llr, ci)

    from . import uci as uci_ops
    return uci_ops.decode(llr, cfg.uci_bits, cfg.e_total)
