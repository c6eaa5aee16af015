"""CRC calculators for TS 38.212 §5.1 (CRC24A/B/C, CRC16, CRC11, CRC6).

TPU-native design: a CRC over an N-bit message is a GF(2) linear map, so we
precompute, per (polynomial, N), the N x L remainder table
``T[i] = x^(N-1-i+L) mod g`` and evaluate ``crc = (m @ T) mod 2`` as a single
f32 matmul on the MXU, batched over codeblocks.  This replaces the reference's
byte-LUT and CLMUL implementations
(srsRAN-5G-ER/lib/phy/upper/channel_coding/crc_calculator_lut_impl.cpp,
crc_calculator_clmul_impl.cpp) with a formulation the MXU is built for — no
sequential state, O(B*N*L) flops that are free at MXU rates.

Tables are cached per (poly, N); N is static under jit.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..utils.bits import parity_dot

# Generator polynomials, TS 38.212 §5.1 (low L bits below x^L; x^L implicit).
CRC24A = ("crc24a", 24, 0x864CFB)
CRC24B = ("crc24b", 24, 0x800063)
CRC24C = ("crc24c", 24, 0xB2B117)
CRC16 = ("crc16", 16, 0x1021)
CRC11 = ("crc11", 11, 0x621)
CRC6 = ("crc6", 6, 0x21)

BY_NAME = {p[0]: p for p in (CRC24A, CRC24B, CRC24C, CRC16, CRC11, CRC6)}


def _poly_bits(poly: int, nbits: int) -> np.ndarray:
    return ((poly >> np.arange(nbits - 1, -1, -1)) & 1).astype(np.uint8)


@functools.lru_cache(maxsize=None)
def remainder_table(name: str, msg_len: int) -> np.ndarray:
    """(msg_len, L) uint8 table; row i = x^(msg_len-1-i+L) mod g as bits (MSB first)."""
    _, L, poly = BY_NAME[name]
    g = _poly_bits(poly, L)
    # r holds the remainder of x^(k+L) mod g; start at k=0: shift x^L once.
    # x^L mod g = g_low (since x^L = g + g_low over GF(2)).
    r = g.copy()
    table = np.empty((msg_len, L), dtype=np.uint8)
    table[msg_len - 1] = r
    for i in range(msg_len - 2, -1, -1):
        # multiply by x: shift left; if the bit leaving is 1, subtract g.
        carry = r[0]
        r = np.roll(r, -1)
        r[-1] = 0
        if carry:
            r ^= g
        table[i] = r
    return table


def crc(bits: jnp.ndarray, name: str) -> jnp.ndarray:
    """CRC bits (..., L), MSB first, of int8 {0,1} messages (..., N)."""
    table = jnp.asarray(remainder_table(name, bits.shape[-1]))
    return parity_dot(bits, table)


def crc_attach(bits: jnp.ndarray, name: str) -> jnp.ndarray:
    """Append the CRC to the message along the last axis."""
    return jnp.concatenate([bits, crc(bits, name)], axis=-1)


def crc_check(bits_with_crc: jnp.ndarray, name: str) -> jnp.ndarray:
    """Boolean (...,): True where the trailing CRC is consistent.

    A codeword with appended CRC has remainder 0, so checking is one matmul
    over the full (message + CRC) bit string.
    """
    rem = crc(bits_with_crc, name)
    return jnp.all(rem == 0, axis=-1)


def np_crc(bits: np.ndarray, name: str) -> np.ndarray:
    """Host-side bitwise long-division CRC — the independent oracle for tests."""
    _, L, poly = BY_NAME[name]
    g = int(poly) | (1 << L)
    reg = 0
    for b in bits.astype(int):
        reg = (reg << 1) | int(b)
        if reg >> L:
            reg ^= g
    # flush L zero bits
    for _ in range(L):
        reg <<= 1
        if reg >> L:
            reg ^= g
    return ((reg >> np.arange(L - 1, -1, -1)) & 1).astype(np.uint8)
