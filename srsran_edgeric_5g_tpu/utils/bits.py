"""Bit packing/unpacking helpers (device-side, static shapes).

The TPU build keeps coded bits as int8 {0,1} arrays on the hot path (VPU-lane
friendly, XOR == add mod 2) and packs to uint8/uint32 only at host boundaries.
Counterpart of the reference's `lib/srsvec/bit.cpp` pack/unpack, re-thought for
XLA: everything is a reshape + matmul/shift, no scalar loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def unpack_bits(packed: jnp.ndarray, bit_order: str = "msb") -> jnp.ndarray:
    """uint8 array (..., n) -> int8 bit array (..., n*8)."""
    shifts = np.arange(8, dtype=np.uint8)
    if bit_order == "msb":
        shifts = shifts[::-1].copy()
    bits = (packed[..., :, None] >> shifts) & 1
    return bits.reshape(*packed.shape[:-1], -1).astype(jnp.int8)


def pack_bits(bits: jnp.ndarray, bit_order: str = "msb") -> jnp.ndarray:
    """int8 {0,1} array (..., n*8) -> uint8 array (..., n)."""
    *lead, n = bits.shape
    assert n % 8 == 0, "bit count must be a multiple of 8"
    b = bits.reshape(*lead, n // 8, 8).astype(jnp.uint8)
    weights = (1 << np.arange(8, dtype=np.uint8))
    if bit_order == "msb":
        weights = weights[::-1].copy()
    return (b * weights).sum(axis=-1).astype(jnp.uint8)


def parity_dot(bits: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """GF(2) vector-matrix product: ``(bits @ mat) mod 2``.

    ``bits``: (..., K) {0,1}; ``mat``: (K, M) {0,1}.  Computed as a real
    matmul with an f32 accumulator (MXU path) followed by a mod-2 — exact for
    K < 2**24 ones per column.
    """
    acc = jnp.matmul(bits.astype(jnp.float32), mat.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return jnp.mod(acc, 2.0).astype(jnp.int8)


def np_parity_dot(bits: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Host-side GF(2) matmul for table precomputation."""
    return (bits.astype(np.int64) @ mat.astype(np.int64)) % 2


def to_device_complex(samples) -> "jnp.ndarray":
    """Upload a host complex array to the default device.

    The axon TPU backend cannot transfer complex64 in either direction, so
    the real/imag planes go up as float32 and are combined under jit.
    """
    import jax
    import numpy as np_

    arr = np_.ascontiguousarray(samples, dtype=np_.complex64)
    re = jnp.asarray(arr.real.astype(np_.float32))
    im = jnp.asarray(arr.imag.astype(np_.float32))
    return jax.jit(jax.lax.complex)(re, im)


def from_device_complex(x) -> "object":
    """Fetch a device complex array to host (real/imag plane transfers)."""
    import numpy as np_

    re = np_.asarray(jnp.real(x), dtype=np_.float32)
    im = np_.asarray(jnp.imag(x), dtype=np_.float32)
    return (re + 1j * im).astype(np_.complex64)
