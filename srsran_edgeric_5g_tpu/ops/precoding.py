"""Channel precoding and transform precoding.

Counterparts of the reference's
  * channel precoder (lib/phy/generic_functions/precoding/
    channel_precoder_{generic,avx2,avx512,neon}.cpp): per-RE layers->ports
    complex matrix multiply — on TPU a single einsum over the whole grid
    (MXU-batched) instead of per-RE SIMD kernels;
  * transform precoder (transform_precoding/transform_precoder_dft_impl.cpp):
    DFT-s-OFDM spreading for PUSCH, a batched unitary (i)DFT over each
    M_sc-sized block.

Valid DFT-s-OFDM sizes are M_sc = 12 * 2^a 3^b 5^c (TS 38.211 §6.3.1.4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def apply_precoding(layers: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """(..., nlayers, nre) x (nports, nlayers) -> (..., nports, nre).

    The weight matrix may also be per-RE: (..., nports, nlayers, nre).
    """
    if weights.ndim == 2:
        return jnp.einsum("pl,...lr->...pr", weights.astype(jnp.complex64),
                          layers.astype(jnp.complex64))
    return jnp.einsum("...plr,...lr->...pr", weights.astype(jnp.complex64),
                      layers.astype(jnp.complex64))


def identity_precoding(nports: int, nlayers: int,
                       scale: float | None = None) -> np.ndarray:
    """One-layer-per-port mapping with 1/sqrt(nlayers) power normalisation."""
    w = np.zeros((nports, nlayers), dtype=np.complex64)
    for l in range(nlayers):
        w[l % nports, l] += 1.0
    w *= np.float32(1.0 / np.sqrt(nlayers) if scale is None else scale)
    return w


def is_valid_dftsofdm_size(m_sc: int) -> bool:
    """M_sc must be 12 * 2^a 3^b 5^c."""
    if m_sc % 12:
        return False
    n = m_sc // 12
    for p in (2, 3, 5):
        while n % p == 0:
            n //= p
    return n == 1


def transform_precode(symbols: jnp.ndarray, m_sc: int) -> jnp.ndarray:
    """DFT-s-OFDM spread: (..., nblocks*m_sc) -> same shape, per-block DFT.

    y[k] = (1/sqrt(M)) sum_n x[n] e^{-j2 pi k n / M} (TS 38.211 §6.3.1.4).
    """
    assert is_valid_dftsofdm_size(m_sc), m_sc
    shp = symbols.shape
    x = symbols.reshape(*shp[:-1], -1, m_sc)
    y = jnp.fft.fft(x, axis=-1) * np.float32(1.0 / np.sqrt(m_sc))
    return y.reshape(shp).astype(jnp.complex64)


def transform_deprecode(symbols: jnp.ndarray, m_sc: int) -> jnp.ndarray:
    """Inverse DFT-s-OFDM: per-block scaled iDFT."""
    assert is_valid_dftsofdm_size(m_sc), m_sc
    shp = symbols.shape
    x = symbols.reshape(*shp[:-1], -1, m_sc)
    y = jnp.fft.ifft(x, axis=-1) * np.float32(np.sqrt(m_sc))
    return y.reshape(shp).astype(jnp.complex64)
