"""SSB assembly: PSS + SSS + PBCH (polar) + PBCH DM-RS (TS 38.211 §7.4.3).

Counterpart of the reference's ssb_processor_impl.cpp + pbch_encoder_impl.cpp
+ pbch_modulator_impl.cpp + dmrs_pbch_processor: the 240-subcarrier x
4-symbol synchronization block.

PBCH: 32-bit payload (MIB + timing) -> scrambling (1st level, ssb/frame
dependent — simplified to the v=0 phase here) -> CRC24C -> polar(K=56,
E=864) -> QPSK 432 symbols -> mapped around the DM-RS (subcarriers 4k+v,
v = N_cell_ID mod 4).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops import modulation, sequences, sync_signals
from ..ops.crc import crc_attach, crc_check
from ..ops.polar import code as pcode, decoder as pdec, encoder as penc
from ..ops.polar import rate_match as prm

PBCH_PAYLOAD = 32
PBCH_K = 56      # payload + CRC24C
PBCH_E = 864


@dataclasses.dataclass(frozen=True)
class SsbConfig:
    pci: int
    ssb_index: int = 0
    first_symbol: int = 0
    first_subcarrier: int = 0

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
    """PBCH DM-RS r(m) (§7.4.1.4.1), i_SSB-dependent c_init."""
    ibar = cfg.ssb_index % 8  # L_max=8 shorthand (no half-frame bit here)
    cinit = ((1 << 11) * (ibar + 1) * (cfg.pci // 4 + 1)
             + (1 << 6) * (ibar + 1) + cfg.pci % 4) % (1 << 31)
    c = sequences.np_gold_sequence(cinit, 2 * npil)
    return (((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
            ).astype(np.complex64)


def pbch_encode(payload: jnp.ndarray, cfg: SsbConfig) -> jnp.ndarray:
    """(1, 32) -> (1, E=864) coded+scrambled PBCH bits."""
    with_crc = crc_attach(payload.astype(jnp.int8), "crc24c")
    cw = penc.encode(with_crc, _polar())
    bits = prm.rate_match(cw, _polar())
    ci = jnp.asarray([cfg.pci], dtype=jnp.uint32)
    return sequences.scramble_bits(bits, ci)


def process(payload: jnp.ndarray, cfg: SsbConfig, nsymb: int,
            nsubc: int, amplitude: float = 1.0) -> jnp.ndarray:
    """(1, 32) MIB payload -> (nsymb, nsubc) grid with the full SSB."""
    grid = jnp.zeros((nsymb, nsubc), jnp.complex64)
    grid = sync_signals.map_ssb_sync(grid, cfg.pci, cfg.first_symbol,
                                     cfg.first_subcarrier, amplitude)
    bits = pbch_encode(payload, cfg)
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
    """Clean-channel PBCH receive: returns ((1, 32) payload, (1,) crc ok)."""
    _, data_pos, _ = _pbch_positions(cfg)
    syms = rx_grid[jnp.asarray(data_pos[:, 0] + cfg.first_symbol),
                   jnp.asarray(data_pos[:, 1] + cfg.first_subcarrier)]
    llr = modulation.demodulate_soft(syms[None], jnp.float32(0.1), "qpsk",
                                     quantize=False)
    ci = jnp.asarray([cfg.pci], dtype=jnp.uint32)
    llr = sequences.scramble_llrs(llr, ci)
    decoded = pdec.decode(prm.rate_dematch(llr, _polar()), _polar())
    ok = crc_check(decoded, "crc24c")
    return decoded[:, :PBCH_PAYLOAD], ok
