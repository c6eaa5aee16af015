"""UCI channel coding (TS 38.212 §6.3.1): any payload size K -> E bits.

Counterpart of the reference's uci_decoder_impl.cpp, which routes K <= 11 to
the short-block detector and K >= 12 through the polar chain (CRC6 + 3 PC
bits for 12 <= K <= 19, CRC11 for K >= 20, both with the UCI triangular
i_BIL coded-bit interleaver).  Shared by PUCCH Format 2 and UCI-on-PUSCH.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import short_block
from .crc import crc_attach
from .polar import code as polar_code, list_decoder as polar_list
from .polar import encoder as polar_encoder, rate_match as polar_rm


def uci_polar_code(k: int, e: int):
    """UCI polar construction (TS 38.212 §6.3.1.2/.3.1): 12 <= K <= 19 uses
    CRC6 + 3 PC bits; K >= 20 uses CRC11 (no PC)."""
    if k <= 19:
        return polar_code.construct(k + 6, e, nmax=polar_code.NMAX_UL,
                                    i_il=False, n_pc=3, i_bil=True), "crc6"
    return polar_code.construct(k + 11, e, nmax=polar_code.NMAX_UL,
                                i_il=False, i_bil=True), "crc11"


def encode(bits: jnp.ndarray, e: int) -> jnp.ndarray:
    """(1, K) UCI bits -> (1, E) coded bits (short block K <= 11; polar with
    CRC6+PC for 12 <= K <= 19, CRC11 for K >= 20)."""
    k = bits.shape[-1]
    if k <= 11:
        return short_block.encode(bits, e)
    c, crc_name = uci_polar_code(k, e)
    cw = polar_encoder.encode(crc_attach(bits, crc_name), c)
    return polar_rm.rate_match(cw, c)


def decode(llrs: jnp.ndarray, k: int, e: int, list_size: int = 8
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(1, E) LLRs -> ((1, K) UCI bits, (1,) valid).

    K <= 11: short-block ML detection (valid = positive metric).  K >= 12:
    CA-SCL polar (per-path PC register for the CRC6+PC codes; valid =
    CRC-selected path) — the reference's uci_decoder SCL path.
    """
    if k <= 11:
        bits, metric = short_block.detect(llrs, k)
        return bits, metric > 0
    c, crc_name = uci_polar_code(k, e)
    decoded, ok = polar_list.decode_scl(polar_rm.rate_dematch(llrs, c), c,
                                        list_size=list_size, crc=crc_name)
    return decoded[:, :k], ok
