"""PDCCH processor: DCI bits -> CORESET grid contribution (+ RX search).

Counterpart of the reference's pdcch_encoder_impl.cpp (CRC24C attach with
all-ones prefix, RNTI-scrambled CRC, polar K->E), pdcch_modulator_impl.cpp
(scramble + QPSK + REG mapping) and pdcch_processor_impl.cpp (DM-RS).

CORESETs of duration 1-3 symbols (TS 38.211 §7.3.2.2: REGs numbered
time-first within the CORESET, REG bundles of size L ∈ {2,3,6} with
L % duration == 0, interleaved or non-interleaved CCE-to-REG mapping; the
reference's cce_to_prb_mapping.cpp).  `process` maps one
DCI; `process_multi` batches several DCIs of one search-space shape (same
aggregation level / payload size, distinct RNTIs and CCEs) through a single
vmapped polar encode into one CORESET grid — the counterpart of the
reference's pdcch_processor handling several PDCCH PDUs per slot.  The
receive side implements the UE-style blind decode for parity testing:
demap -> descramble -> polar SC decode -> CRC check against the RNTI mask.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops import modulation, sequences
from ..ops.crc import crc, crc_check
from ..ops.polar import code as pcode, decoder as pdec, encoder as penc
from ..ops.polar import rate_match as prm
from ..ran.numerology import N_SC_PER_PRB

RE_PER_CCE_DATA = 54   # 6 REGs x 12 RE minus 18 DM-RS
DMRS_PER_CCE = 18


@dataclasses.dataclass(frozen=True)
class PdcchConfig:
    rnti: int
    n_id: int                 # pdcch-DMRS-ScramblingID (and data scrambling)
    aggregation_level: int    # 1/2/4/8/16 CCEs
    cce_index: int            # first CCE in the CORESET
    start_symbol: int = 0
    coreset_start_prb: int = 0
    slot: int = 0
    payload_bits: int = 40    # DCI size A
    # CORESET CCE-to-REG mapping (TS 38.211 §7.3.2.2): non-interleaved by
    # default; interleaved uses REG bundles of size L, row count R and
    # shift n_shift.  duration = CORESET symbols {1,2,3}; REGs are numbered
    # time-first (REG j = PRB j//duration, symbol j%duration), so with
    # L % duration == 0 every allocated PRB spans all CORESET symbols.
    coreset_nof_prb: int = 48  # CORESET width in PRBs
    duration: int = 1
    interleaved: bool = False
    interleaver_rows: int = 2
    shift_index: int = 0
    reg_bundle_size: int = 6   # L (interleaved only; 6 covers one CCE)

    @property
    def e(self) -> int:
        return 2 * RE_PER_CCE_DATA * self.aggregation_level  # QPSK bits

    @property
    def k(self) -> int:
        return self.payload_bits + 24


def _polar(cfg: PdcchConfig) -> pcode.PolarCode:
    return pcode.construct(cfg.k, cfg.e, nmax=pcode.NMAX_DL, i_il=True)


def encode_dci(payload: jnp.ndarray, cfg: PdcchConfig) -> jnp.ndarray:
    """(1, A) DCI bits -> (1, E) coded bits (TS 38.212 §7.3).

    CRC24C over (24 ones ++ payload); the last 16 CRC bits are XOR-masked
    with the RNTI.
    """
    ones = jnp.ones((1, 24), jnp.int8)
    crc_bits = crc(jnp.concatenate([ones, payload.astype(jnp.int8)], axis=1),
                   "crc24c")
    rnti_bits = jnp.asarray(
        [(cfg.rnti >> (15 - i)) & 1 for i in range(16)], jnp.int8)
    crc_bits = crc_bits.at[:, 8:].set(
        jnp.bitwise_xor(crc_bits[:, 8:], rnti_bits[None]))
    k_bits = jnp.concatenate([payload.astype(jnp.int8), crc_bits], axis=1)
    cw = penc.encode(k_bits, _polar(cfg))
    return prm.rate_match(cw, _polar(cfg))


def _scrambling_cinit(cfg: PdcchConfig) -> int:
    """TS 38.211 §7.3.2.3: c_init = (n_rnti*2^16 + n_id) mod 2^31."""
    return ((cfg.rnti << 16) + cfg.n_id) % (1 << 31)


def cce_to_bundle(cfg: PdcchConfig, x: int) -> int:
    """Source REG-bundle index x -> destination bundle (TS 38.211 §7.3.2.2).

    Non-interleaved: identity.  Interleaved: f(x) = (r*C + c + n_shift) mod
    n_bundles with x = c*R + r, C = n_bundles / R, n_bundles =
    nof_prb * duration / L (the reference's cce_to_reg_mapping_interleaved,
    cce_to_prb_mapping.cpp:44-98).
    """
    if not cfg.interleaved:
        return x
    n_bundles = cfg.coreset_nof_prb * cfg.duration // cfg.reg_bundle_size
    r_rows = cfg.interleaver_rows
    assert n_bundles % r_rows == 0, (n_bundles, r_rows)
    c_cols = n_bundles // r_rows
    c, r = divmod(x, r_rows)
    return (r * c_cols + c + cfg.shift_index) % n_bundles


def _alloc_prbs(cfg: PdcchConfig) -> np.ndarray:
    """Sorted PRB indices of the PDCCH allocation.

    A CCE is 6 REGs; REGs are numbered time-first so, with the bundle size a
    multiple of the duration, each destination bundle covers L/duration
    whole PRBs across all CORESET symbols.
    """
    assert cfg.duration in (1, 2, 3), cfg.duration
    lb = cfg.reg_bundle_size if cfg.interleaved else 6
    assert lb % cfg.duration == 0, (lb, cfg.duration)
    bundles_per_cce = max(6 // lb, 1)
    prbs_per_bundle = lb // cfg.duration
    prbs: set[int] = set()
    for c in range(cfg.aggregation_level):
        for i in range(bundles_per_cce):
            x = (cfg.cce_index + c) * bundles_per_cce + i
            dst = cce_to_bundle(cfg, x)
            first = cfg.coreset_start_prb + prbs_per_bundle * dst
            prbs.update(range(first, first + prbs_per_bundle))
    return np.asarray(sorted(prbs), np.int64)


def _re_positions(cfg: PdcchConfig) -> tuple[np.ndarray, np.ndarray]:
    """(data_sc, dmrs_sc) absolute subcarrier indices of one CORESET symbol.

    The PRB set is identical on every CORESET symbol (time-first REG
    numbering); DM-RS on subcarriers 4k+1.  Data symbols map k-first within
    each symbol, symbols in increasing l (the reference's pdcch_modulator
    per-symbol rb_mask walk).
    """
    prbs = _alloc_prbs(cfg)
    sc = np.concatenate([np.arange(p * N_SC_PER_PRB, (p + 1) * N_SC_PER_PRB)
                         for p in prbs])
    dmrs = sc[sc % 4 == 1]
    data = sc[sc % 4 != 1]
    return data, dmrs


def _dmrs_values(cfg: PdcchConfig, dmrs_sc: np.ndarray,
                 symbol: int) -> np.ndarray:
    """PDCCH DM-RS (§7.4.1.3) values at absolute pilot subcarriers for one
    CORESET symbol.

    Gold QPSK, c_init from slot/symbol/n_id; the sequence index of a pilot is
    its position ⌊sc/4⌋ counted from subcarrier 0 of the CORESET reference
    point, so non-contiguous (interleaved) bundles index into the sequence
    rather than consuming it consecutively.
    """
    cinit = ((1 << 17) * (14 * cfg.slot + symbol + 1) * (2 * cfg.n_id + 1)
             + 2 * cfg.n_id) % (1 << 31)
    idx = np.asarray(dmrs_sc) // 4
    c = sequences.np_gold_sequence(cinit, 2 * (int(idx.max()) + 1))
    pil = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
    return pil[idx].astype(np.complex64)


def process(payload: jnp.ndarray, cfg: PdcchConfig, nsymb: int,
            nsubc: int) -> jnp.ndarray:
    """DCI payload -> (nsymb, nsubc) grid contribution (QPSK data + DM-RS)."""
    bits = encode_dci(payload, cfg)
    ci = jnp.asarray([_scrambling_cinit(cfg)], dtype=jnp.uint32)
    scr = sequences.scramble_bits(bits, ci)
    syms = modulation.modulate(scr, "qpsk")[0]

    data_sc, dmrs_sc = _re_positions(cfg)
    grid = jnp.zeros((nsymb, nsubc), jnp.complex64)
    per_sym = syms.reshape(cfg.duration, -1)
    for off in range(cfg.duration):
        l = cfg.start_symbol + off
        grid = grid.at[l, jnp.asarray(data_sc)].set(per_sym[off])
        grid = grid.at[l, jnp.asarray(dmrs_sc)].set(
            jnp.asarray(_dmrs_values(cfg, dmrs_sc, l)))
    return grid


def process_multi(payloads: jnp.ndarray, cfgs: list[PdcchConfig], nsymb: int,
                  nsubc: int) -> jnp.ndarray:
    """(N, A) DCI payloads -> one (nsymb, nsubc) CORESET grid.

    All cfgs must share one search-space shape (payload size, aggregation
    level, start symbol) so the whole set encodes through ONE batched polar
    chain; RNTIs, CCE indices and scrambling differ per DCI.  Counterpart of
    the reference's per-slot loop over PDCCH PDUs
    (pdcch_processor_impl.cpp / downlink_processor process_pdcch), batched.
    """
    cfg0 = cfgs[0]
    assert payloads.shape[0] == len(cfgs)
    assert all(c.payload_bits == cfg0.payload_bits and c.e == cfg0.e
               and c.start_symbol == cfg0.start_symbol
               and c.duration == cfg0.duration for c in cfgs), \
        "process_multi batches one search-space shape; mixed sizes -> compose"
    assert all(c.n_id == cfg0.n_id and c.slot == cfg0.slot for c in cfgs), \
        "one CORESET: pdcch-DMRS-ScramblingID and slot must match"
    n = len(cfgs)
    pay = payloads.astype(jnp.int8)
    ones = jnp.ones((n, 24), jnp.int8)
    crc_bits = crc(jnp.concatenate([ones, pay], axis=1), "crc24c")
    rnti_mat = np.asarray([[(c.rnti >> (15 - i)) & 1 for i in range(16)]
                           for c in cfgs], np.int8)
    crc_bits = crc_bits.at[:, 8:].set(
        jnp.bitwise_xor(crc_bits[:, 8:], jnp.asarray(rnti_mat)))
    code = _polar(cfg0)
    cw = penc.encode(jnp.concatenate([pay, crc_bits], axis=1), code)
    bits = prm.rate_match(cw, code)                         # (N, E)
    ci = jnp.asarray([_scrambling_cinit(c) for c in cfgs], jnp.uint32)
    scr = sequences.scramble_bits(bits, ci)
    syms = modulation.modulate(scr, "qpsk")                 # (N, E/2)

    grid = jnp.zeros((nsymb, nsubc), jnp.complex64)
    pos = [_re_positions(c) for c in cfgs]
    data_sc = np.concatenate([p[0] for p in pos])
    assert len(np.unique(data_sc)) == len(data_sc), "overlapping CCEs"
    dmrs_sc = np.unique(np.concatenate([p[1] for p in pos]))
    dur = cfg0.duration
    per_sym = syms.reshape(n, dur, -1)                      # (N, dur, d/sym)
    for off in range(dur):
        l = cfg0.start_symbol + off
        row = jnp.concatenate([per_sym[i, off] for i in range(n)])
        grid = grid.at[l, jnp.asarray(data_sc)].set(row)
        grid = grid.at[l, jnp.asarray(dmrs_sc)].set(
            jnp.asarray(_dmrs_values(cfg0, dmrs_sc, l)))
    return grid


def blind_decode(rx_grid: jnp.ndarray, cfg: PdcchConfig
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """UE-style receive for loopback tests: returns ((1, A) payload, ok).

    Assumes the channel is already equalized (or clean); uses the DM-RS only
    implicitly via CRC success.
    """
    data_sc, _ = _re_positions(cfg)
    syms = jnp.concatenate(
        [rx_grid[cfg.start_symbol + off, jnp.asarray(data_sc)]
         for off in range(cfg.duration)])
    llr = modulation.demodulate_soft(syms[None], jnp.float32(0.1), "qpsk",
                                     quantize=False)
    ci = jnp.asarray([_scrambling_cinit(cfg)], dtype=jnp.uint32)
    llr = sequences.scramble_llrs(llr, ci)
    c = _polar(cfg)
    decoded = pdec.decode(prm.rate_dematch(llr, c), c)  # (1, K)
    payload, crc_rx = decoded[:, :cfg.payload_bits], decoded[:, cfg.payload_bits:]
    # Re-mask the RNTI and check CRC24C over (ones ++ payload).
    rnti_bits = jnp.asarray([(cfg.rnti >> (15 - i)) & 1 for i in range(16)],
                            jnp.int8)
    crc_rx = crc_rx.at[:, 8:].set(jnp.bitwise_xor(crc_rx[:, 8:], rnti_bits[None]))
    ones = jnp.ones((1, 24), jnp.int8)
    want = crc(jnp.concatenate([ones, payload], axis=1), "crc24c")
    ok = jnp.all(want == crc_rx, axis=1)
    return payload, ok
