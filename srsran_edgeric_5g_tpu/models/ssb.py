"""SSB assembly: PSS + SSS + PBCH (polar) + PBCH DM-RS (TS 38.211 §7.4.3).

Counterpart of the reference's ssb_processor_impl.cpp + pbch_encoder_impl.cpp
+ pbch_modulator_impl.cpp + dmrs_pbch_processor: the 240-subcarrier x
4-symbol synchronization block.

PBCH: exact TS 38.212 §7.1.1 chain, cross-validated grid-exact against the
reference's pbch_encoder_impl + pbch_modulator_impl + dmrs_pbch_processor
(test_reference_parity.py::test_ssb_grid_parity): 24-bit higher-layer
payload -> payload interleaving (Table 7.1.1-1 pattern G with the SFN
LSBs / half-frame / SSB-index bits) -> 1st scrambling (Gold(N_id) advanced
by M*v, timing bits exempt) -> CRC24C -> polar(K=56, E=864, i_IL=1) ->
2nd scrambling (Gold(N_id) advanced by (ssb_idx & 7)*E) -> QPSK 432
symbols mapped around the DM-RS (subcarriers 4k+v, v = N_cell_ID mod 4).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops import modulation, sequences, sync_signals
from ..ops.crc import crc_attach, crc_check
from ..ops.polar import code as pcode, decoder as pdec, encoder as penc
from ..ops.polar import rate_match as prm

PBCH_PAYLOAD = 24  # higher-layer payload bits (A_hat)
PBCH_A = 32        # after timing-bit insertion
PBCH_K = 56        # A + CRC24C
PBCH_E = 864

# TS 38.212 Table 7.1.1-1: PBCH payload interleaver pattern G(j).
PBCH_G = np.array([16, 23, 18, 17, 8, 30, 10, 6, 24, 7, 0, 5, 3, 2, 1, 4,
                   9, 11, 12, 13, 14, 15, 19, 20, 21, 22, 25, 26, 27, 28,
                   29, 31])


@dataclasses.dataclass(frozen=True)
class SsbConfig:
    pci: int
    ssb_index: int = 0
    first_symbol: int = 0
    first_subcarrier: int = 0
    l_max: int = 8       # SSB candidates per burst (4, 8 or 64)
    hrf: bool = False    # odd half frame
    sfn: int = 0         # system frame number (timing bits in the payload)
    k_ssb: int = 0       # subcarrier offset (MSB carried in the payload)

    @property
    def dmrs_v(self) -> int:
        return self.pci % 4


def _polar():
    return pcode.construct(PBCH_K, PBCH_E, nmax=pcode.NMAX_DL, i_il=True)


def _pbch_positions(cfg: SsbConfig) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(symbols, subcarriers) pairs for PBCH data and DM-RS within the SSB.

    Symbol 1: sc 0..239; symbol 2: sc 0..47 and 192..239; symbol 3: 0..239
    (TS 38.211 Table 7.4.3.1-1); DM-RS on 4k + v within those ranges.
    """
    v = cfg.dmrs_v
    sym, sc = [], []
    for l, ranges in ((1, [(0, 240)]), (2, [(0, 48), (192, 240)]),
                      (3, [(0, 240)])):
        for a, b in ranges:
            for k in range(a, b):
                sym.append(l)
                sc.append(k)
    sym = np.asarray(sym)
    sc = np.asarray(sc)
    is_dmrs = (sc % 4) == v
    return np.stack([sym, sc], 1), np.stack([sym[~is_dmrs], sc[~is_dmrs]], 1), \
        np.stack([sym[is_dmrs], sc[is_dmrs]], 1)


def _dmrs_sequence(cfg: SsbConfig, npil: int) -> np.ndarray:
    """PBCH DM-RS r(m) (§7.4.1.4.1), i_bar_SSB-dependent c_init:
    L_max=4: i_bar = 2 LSBs of ssb_index + 4*hrf; else 3 LSBs."""
    if cfg.l_max == 4:
        ibar = (cfg.ssb_index & 0x3) + (4 if cfg.hrf else 0)
    else:
        ibar = cfg.ssb_index & 0x7
    cinit = ((1 << 11) * (ibar + 1) * (cfg.pci // 4 + 1)
             + (1 << 6) * (ibar + 1) + cfg.pci % 4) % (1 << 31)
    c = sequences.np_gold_sequence(cinit, 2 * npil)
    return (((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
            ).astype(np.complex64)


def _payload_maps(cfg: SsbConfig):
    """Static machinery for §7.1.1: (payload->a interleave positions,
    extra-bit positions+values, 1st-scrambling sequence over a (32,))."""
    g = PBCH_G
    pos = np.empty(PBCH_PAYLOAD, np.int64)
    j_sfn, j_other = 0, 14
    for i in range(PBCH_PAYLOAD):
        if 1 <= i < 7:          # the 6 SFN MSBs inside the payload
            pos[i] = g[j_sfn]
            j_sfn += 1
        else:
            pos[i] = g[j_other]
            j_other += 1
    extra_pos = []
    extra_val = []
    for k, bit in enumerate([(cfg.sfn >> 3) & 1, (cfg.sfn >> 2) & 1,
                             (cfg.sfn >> 1) & 1, cfg.sfn & 1]):
        extra_pos.append(g[6 + k])
        extra_val.append(bit)
    extra_pos.append(g[10])
    extra_val.append(1 if cfg.hrf else 0)
    if cfg.l_max == 64:
        for k, bit in enumerate([(cfg.ssb_index >> 5) & 1,
                                 (cfg.ssb_index >> 4) & 1,
                                 (cfg.ssb_index >> 3) & 1]):
            extra_pos.append(g[11 + k])
            extra_val.append(bit)
    else:
        extra_pos += [g[11], g[12], g[13]]
        extra_val += [(cfg.k_ssb >> 4) & 1, 0, 0]

    # 1st scrambling: Gold(N_id) advanced by M*v; the timing bits (HRF, SFN
    # 2nd/3rd LSBs, and the SSB-index bits when L_max=64) are NOT scrambled
    # and consume no sequence bits.
    m = PBCH_A - (6 if cfg.l_max == 64 else 3)
    v = 2 * ((cfg.sfn >> 2) & 1) + ((cfg.sfn >> 1) & 1)
    exempt = {int(g[10]), int(g[7]), int(g[8])}
    if cfg.l_max == 64:
        exempt |= {int(g[11]), int(g[12]), int(g[13])}
    c = sequences.np_gold_sequence(cfg.pci, m * v + PBCH_A)[m * v:]
    seq = np.zeros(PBCH_A, np.int8)
    j = 0
    for i in range(PBCH_A):
        if i not in exempt:
            seq[i] = c[j]
            j += 1
    return pos, np.asarray(extra_pos, np.int64), \
        np.asarray(extra_val, np.int8), seq


def pbch_encode(payload: jnp.ndarray, cfg: SsbConfig) -> jnp.ndarray:
    """(1, 24) higher-layer payload -> (1, E=864) encoder-stage bits
    (TS 38.212 §7.1.1-§7.1.5; the modulator's 2nd scrambling is applied by
    process(), mirroring the reference's pbch_encoder / pbch_modulator
    split)."""
    pos, epos, eval_, seq1 = _payload_maps(cfg)
    a = jnp.zeros((payload.shape[0], PBCH_A), jnp.int8)
    a = a.at[:, jnp.asarray(pos)].set(payload.astype(jnp.int8))
    a = a.at[:, jnp.asarray(epos)].set(jnp.asarray(eval_)[None])
    a = jnp.bitwise_xor(a, jnp.asarray(seq1)[None])
    with_crc = crc_attach(a, "crc24c")
    cw = penc.encode(with_crc, _polar())
    return prm.rate_match(cw, _polar())


def _seq2(cfg: SsbConfig) -> np.ndarray:
    """PBCH modulator scrambling (TS 38.211 §7.3.3.1): Gold(N_id) advanced
    by (ssb_idx & 7) * E — the pbch_modulator_impl stage."""
    adv = (cfg.ssb_index & 0x7) * PBCH_E
    return sequences.np_gold_sequence(cfg.pci, adv + PBCH_E)[adv:].astype(
        np.int8)


def process(payload: jnp.ndarray, cfg: SsbConfig, nsymb: int,
            nsubc: int, amplitude: float = 1.0) -> jnp.ndarray:
    """(1, 24) MIB payload -> (nsymb, nsubc) grid with the full SSB."""
    grid = jnp.zeros((nsymb, nsubc), jnp.complex64)
    grid = sync_signals.map_ssb_sync(grid, cfg.pci, cfg.first_symbol,
                                     cfg.first_subcarrier, amplitude)
    bits = pbch_encode(payload, cfg)
    bits = jnp.bitwise_xor(bits, jnp.asarray(_seq2(cfg))[None])
    syms = modulation.modulate(bits, "qpsk")[0] * jnp.float32(amplitude)

    _, data_pos, dmrs_pos = _pbch_positions(cfg)
    ls = jnp.asarray(data_pos[:, 0] + cfg.first_symbol)
    ks = jnp.asarray(data_pos[:, 1] + cfg.first_subcarrier)
    grid = grid.at[ls, ks].set(syms.astype(jnp.complex64))

    pil = _dmrs_sequence(cfg, len(dmrs_pos))
    grid = grid.at[jnp.asarray(dmrs_pos[:, 0] + cfg.first_symbol),
                   jnp.asarray(dmrs_pos[:, 1] + cfg.first_subcarrier)].set(
        jnp.asarray(pil) * jnp.float32(amplitude))
    return grid


def decode(rx_grid: jnp.ndarray, cfg: SsbConfig
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Clean-channel PBCH receive: returns ((1, 24) payload, (1,) crc ok).

    The timing hypothesis (ssb_index LSBs for the 2nd descrambling, sfn
    parity v for the 1st) comes from ``cfg`` — the UE-side blind search
    over hypotheses is out of scope (the reference gNB does not decode
    PBCH either)."""
    _, data_pos, _ = _pbch_positions(cfg)
    syms = rx_grid[jnp.asarray(data_pos[:, 0] + cfg.first_symbol),
                   jnp.asarray(data_pos[:, 1] + cfg.first_subcarrier)]
    llr = modulation.demodulate_soft(syms[None], jnp.float32(0.1), "qpsk",
                                     quantize=False)
    llr = llr * jnp.asarray(1.0 - 2.0 * _seq2(cfg), jnp.float32)[None]
    decoded = pdec.decode(prm.rate_dematch(llr, _polar()), _polar())
    ok = crc_check(decoded, "crc24c")
    a = decoded[:, :PBCH_A]
    pos, _, _, seq1 = _payload_maps(cfg)
    a = jnp.bitwise_xor(a.astype(jnp.int8), jnp.asarray(seq1)[None])
    payload = a[:, jnp.asarray(pos)]
    return payload, ok
