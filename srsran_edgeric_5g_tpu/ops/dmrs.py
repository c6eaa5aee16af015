"""DM-RS generation and mapping for PDSCH/PUSCH (TS 38.211 §6.4.1.1 / §7.4.1.1).

Counterpart of the reference's dmrs_pdsch_processor_impl.cpp /
dmrs_pusch_estimator_impl.cpp pilot generation front-ends: Gold-sequence QPSK
pilots with configuration-type-1/2 subcarrier mapping, batched over UEs via
the c_init row (the sequence generator is one MXU matmul — ops.sequences).

Only the pieces the PHY hot loop needs are implemented: config type 1/2,
single-symbol DM-RS without OCC across time (w_t = +1), ports 0-3 with
frequency OCC w_f in {(+,+), (+,-)}.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from .sequences import gold_sequence

SQRT1_2 = np.float32(1.0 / np.sqrt(2.0))


def dmrs_c_init(slot: int, symbol: int, n_id: int, n_scid: int = 0) -> int:
    """TS 38.211 §7.4.1.1.1 (same formula §6.4.1.1.1 for PUSCH)."""
    nsymb = 14
    return ((2 ** 17 * (nsymb * slot + symbol + 1) * (2 * n_id + 1)
             + 2 * n_id + n_scid) % (2 ** 31))


@dataclasses.dataclass(frozen=True)
class DmrsPattern:
    """Static DM-RS layout for one (config_type, port-group) combination."""

    config_type: int          # 1 or 2
    nof_prb: int
    delta: int                # CDM group frequency offset
    subcarriers: np.ndarray   # (npilots,) absolute subcarrier indices
    wf: np.ndarray            # (npilots,) frequency OCC for the port


@functools.lru_cache(maxsize=None)
def dmrs_pattern(config_type: int, nof_prb: int, port: int = 0) -> DmrsPattern:
    """Pilot subcarrier positions and frequency OCC for one antenna port.

    Type 1: pilots on subcarriers 4n + 2k' + delta, 6 per PRB, CDM group
    delta = (port // 2) % 2; w_f = (+1)^k' for even ports, (-1)^k' for odd.
    Type 2: pilots on 6n + k' + delta (k' in {0,1}), 4 per PRB.
    """
    if config_type == 1:
        delta = (port // 2) % 2
        kprime = np.arange(2)
        # k = 4n + 2k' + delta, n = 0..3*nof_prb-1, k' in {0,1}
        sc = (4 * np.repeat(np.arange(3 * nof_prb), 2)
              + 2 * np.tile(kprime, 3 * nof_prb) + delta)
        wf = np.where(np.tile(kprime, 3 * nof_prb) == 1, -1.0, 1.0) \
            if port % 2 == 1 else np.ones(6 * nof_prb)
    elif config_type == 2:
        delta = 2 * ((port // 2) % 3)
        kprime = np.arange(2)
        sc = (6 * np.repeat(np.arange(2 * nof_prb), 2)
              + np.tile(kprime, 2 * nof_prb) + delta)
        wf = np.where(np.tile(kprime, 2 * nof_prb) == 1, -1.0, 1.0) \
            if port % 2 == 1 else np.ones(4 * nof_prb)
    else:
        raise ValueError(f"bad config type {config_type}")
    return DmrsPattern(config_type=config_type, nof_prb=nof_prb, delta=delta,
                       subcarriers=sc.astype(np.int32), wf=wf.astype(np.float32))


def dmrs_sequence(c_init: jnp.ndarray, npilots: int,
                  skip_pilots: int = 0) -> jnp.ndarray:
    """QPSK pilot symbols r(m) = ((1-2c(2m)) + j(1-2c(2m+1)))/sqrt(2).

    Batched over c_init rows -> (B, npilots) complex64.  ``skip_pilots``
    drops the first sequence elements for allocations that do not start at
    PRB 0 (type 1: 6 pilots per PRB, type 2: 4).
    """
    nbits = 2 * (npilots + skip_pilots)
    c = gold_sequence(c_init, nbits).astype(jnp.float32)
    c = c[..., 2 * skip_pilots:]
    re = (1.0 - 2.0 * c[..., 0::2]) * SQRT1_2
    im = (1.0 - 2.0 * c[..., 1::2]) * SQRT1_2
    return (re + 1j * im).astype(jnp.complex64)


def map_dmrs(grid: jnp.ndarray, pilots: jnp.ndarray, pattern: DmrsPattern,
             symbol: int, amplitude: float = 1.0) -> jnp.ndarray:
    """Write pilots into a (..., nsymb, nsubc) grid at the DM-RS symbol."""
    vals = pilots * jnp.asarray(pattern.wf) * jnp.float32(amplitude)
    return grid.at[..., symbol, jnp.asarray(pattern.subcarriers)].set(
        vals.astype(grid.dtype))


def extract_dmrs(grid: jnp.ndarray, pattern: DmrsPattern,
                 symbol: int) -> jnp.ndarray:
    """Read pilot REs from a (..., nsymb, nsubc) grid -> (..., npilots)."""
    return grid[..., symbol, jnp.asarray(pattern.subcarriers)]
