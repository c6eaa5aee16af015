"""NZP-CSI-RS and SRS sequence generation + mapping.

Counterparts of the reference's nzp_csi_rs_generator_impl.cpp (TS 38.211
§7.4.1.5) and signal_processors/srs (TS 38.211 §6.4.1.4):

  * CSI-RS: Gold-sequence QPSK pilots, row-1/row-2-style mappings (single
    port, density 1 or 3, freq-domain comb) — the subset the zmq-mode cell
    uses for CSI acquisition.
  * SRS: low-PAPR ZC sequences on a comb (KTC 2/4), one port, with cyclic
    shift; plus the receive-side LS channel snapshot over the sounded band.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .low_papr import base_sequence
from .sequences import np_gold_sequence

SQRT1_2 = np.float32(1.0 / np.sqrt(2.0))


# ----------------------------------------------------------------- CSI-RS

def csi_rs_c_init(slot: int, symbol: int, scrambling_id: int) -> int:
    """TS 38.211 §7.4.1.5.2."""
    return ((1 << 10) * (14 * slot + symbol + 1) * (2 * scrambling_id + 1)
            + scrambling_id) % (1 << 31)


@dataclasses.dataclass(frozen=True)
class CsiRsConfig:
    scrambling_id: int
    slot: int
    symbol: int
    start_prb: int
    nof_prb: int
    density: int = 1        # REs per PRB (1 or 3)
    comb_offset: int = 0    # k0 within the PRB


def csi_rs_pilots(cfg: CsiRsConfig) -> np.ndarray:
    """(npilots,) QPSK pilots for the configured symbol (host precompute)."""
    npil = cfg.density * (cfg.start_prb + cfg.nof_prb)
    ci = csi_rs_c_init(cfg.slot, cfg.symbol, cfg.scrambling_id)
    c = np_gold_sequence(ci, 2 * npil)
    r = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) * SQRT1_2
    return r[cfg.density * cfg.start_prb:].astype(np.complex64)


def csi_rs_subcarriers(cfg: CsiRsConfig) -> np.ndarray:
    """Absolute subcarrier indices of the CSI-RS REs."""
    if cfg.density == 1:
        k = 12 * (cfg.start_prb + np.arange(cfg.nof_prb)) + cfg.comb_offset
    elif cfg.density == 3:
        base = 12 * (cfg.start_prb + np.arange(cfg.nof_prb))[:, None]
        k = (base + cfg.comb_offset + 4 * np.arange(3)[None, :]).reshape(-1)
    else:
        raise ValueError(f"density {cfg.density}")
    return k.astype(np.int32)


def map_csi_rs(grid: jnp.ndarray, cfg: CsiRsConfig,
               amplitude: float = 1.0) -> jnp.ndarray:
    pil = jnp.asarray(csi_rs_pilots(cfg)) * jnp.float32(amplitude)
    return grid.at[..., cfg.symbol, jnp.asarray(csi_rs_subcarriers(cfg))].set(pil)


def csi_rs_estimate(rx_grid: jnp.ndarray, cfg: CsiRsConfig) -> jnp.ndarray:
    """LS channel snapshot at the CSI-RS REs: (..., npilots)."""
    rx = rx_grid[..., cfg.symbol, jnp.asarray(csi_rs_subcarriers(cfg))]
    return rx * jnp.conj(jnp.asarray(csi_rs_pilots(cfg)))


# --------------------------------------------------------------------- SRS

@dataclasses.dataclass(frozen=True)
class SrsConfig:
    sequence_id: int
    slot: int
    symbol: int
    start_prb: int
    nof_prb: int            # sounded bandwidth (multiple of 4 typical)
    comb: int = 2           # KTC: 2 or 4
    comb_offset: int = 0
    cyclic_shift: int = 0   # n_cs in [0, 8/12)

    @property
    def m_sc(self) -> int:
        return self.nof_prb * 12 // self.comb


def srs_sequence(cfg: SrsConfig) -> np.ndarray:
    """r(n): low-PAPR base sequence with SRS cyclic shift (§6.4.1.4.2)."""
    n_cs_max = 8 if cfg.comb == 2 else 12
    alpha = 2.0 * np.pi * cfg.cyclic_shift / n_cs_max
    u = cfg.sequence_id % 30
    base = base_sequence(u, 0, cfg.m_sc)
    n = np.arange(cfg.m_sc)
    return (np.exp(1j * alpha * n) * base).astype(np.complex64)


def srs_subcarriers(cfg: SrsConfig) -> np.ndarray:
    k0 = 12 * cfg.start_prb + cfg.comb_offset
    return (k0 + cfg.comb * np.arange(cfg.m_sc)).astype(np.int32)


def map_srs(grid: jnp.ndarray, cfg: SrsConfig,
            amplitude: float = 1.0) -> jnp.ndarray:
    seq = jnp.asarray(srs_sequence(cfg)) * jnp.float32(amplitude)
    return grid.at[..., cfg.symbol, jnp.asarray(srs_subcarriers(cfg))].set(seq)


def srs_estimate(rx_grid: jnp.ndarray, cfg: SrsConfig
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LS estimate at the sounded comb + wideband SNR metric."""
    rx = rx_grid[..., cfg.symbol, jnp.asarray(srs_subcarriers(cfg))]
    h = rx * jnp.conj(jnp.asarray(srs_sequence(cfg)))
    # Noise from half-difference of adjacent comb estimates.
    d = h[..., 1::2] - h[..., 0::2]
    noise = jnp.mean(jnp.abs(d) ** 2, axis=-1) / 2.0
    sig = jnp.mean(jnp.abs(h) ** 2, axis=-1)
    snr_db = 10.0 * jnp.log10(jnp.maximum(sig, 1e-30)
                              / jnp.maximum(noise, 1e-30))
    return h, snr_db
