"""O-RAN fronthaul IQ compression: block floating point (BFP) and none.

TPU-native counterpart of the reference's OFH compression stage
(srsRAN-5G-ER/lib/ofh/compression/iq_compression_bfp_impl.cpp,
quantizer.h, compressed_prb_packer.cpp): the RU downlink path compresses
resource-grid IQ into per-PRB mantissas + exponent before eCPRI framing,
and decompresses on the uplink.

Device side (this module, jittable, batched over any leading dims):
  * quantize_iq      — bf16/f32 IQ in [-1,1] -> int16 (Q=16 quantizer: scale
                       by (2^15-1)*iq_scaling, round-to-nearest-even like the
                       reference's SIMD cvtps path, saturate).
  * bfp_compress     — per-PRB (12 complex = 24 int16) exponent derivation
                       (leading-zero rule of iq_compression_bfp_impl.h:63-77)
                       + arithmetic right shift to data_width-bit mantissas.
  * bfp_decompress   — mantissas * 2^exp / (2^15-1) -> complex64.

Host side (numpy, the eCPRI wire format):
  * pack_prbs/unpack_prbs — MSB-first big-endian bit packing of W-bit
                       mantissas per PRB (compressed_prb_packer.cpp), one
                       udCompParam exponent byte carried separately.

Cross-validated stage-by-stage (quantized int16s, exponents, mantissas,
packed bytes, decompressed floats) against the reference implementation in
tests/test_reference_parity.py::test_ofh_bfp_*.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAX_IQ_WIDTH = 16
NOF_SUBC_PER_PRB = 12
SAMPLES_PER_PRB = 2 * NOF_SUBC_PER_PRB
_GAIN = np.float32((1 << (MAX_IQ_WIDTH - 1)) - 1)  # 32767


def quantize_iq(iq: jnp.ndarray, iq_scaling: float = 1.0) -> jnp.ndarray:
    """Complex IQ (..., n) -> interleaved int16 (..., 2n).

    Matches quantizer::to_fixed_point over spans (quantizer.h:66-88):
    x * gain * iq_scaling, round to nearest even (the reference's SIMD
    cvtps), saturate to int16.
    """
    re = jnp.real(iq).astype(jnp.float32)
    im = jnp.imag(iq).astype(jnp.float32)
    x = jnp.stack([re, im], axis=-1).reshape(*iq.shape[:-1], -1)
    scaled = jnp.rint(x * (_GAIN * np.float32(iq_scaling)))
    return jnp.clip(scaled, -32768, 32767).astype(jnp.int16)


def _exponents(q: jnp.ndarray, data_width: int) -> jnp.ndarray:
    """Per-PRB BFP exponent, exactly the reference's leading-zero rule.

    q: int16 (..., nprb, 24).  Returns int32 (..., nprb).
    max_abs = max(|max|, |min| - 1); lz_without_sign = clz16(max_abs) - 1
    (via frexp, exact for values < 2^24); raw = min(16 - W, lz);
    exp = max(0, (16 - W) - raw).
    """
    max_shift = MAX_IQ_WIDTH - data_width
    maxv = jnp.max(q, axis=-1).astype(jnp.int32)
    minv = jnp.min(q, axis=-1).astype(jnp.int32)
    max_abs = jnp.maximum(jnp.abs(maxv), jnp.abs(minv) - 1)
    # floor(log2(x)) for x > 0: frexp exponent - 1 (f32 exact below 2^24).
    _, fe = jnp.frexp(jnp.maximum(max_abs, 1).astype(jnp.float32))
    lz_ws = jnp.where((max_abs > 0) & (max_shift > 0),
                      14 - (fe - 1), max_shift)
    raw = jnp.minimum(max_shift, lz_ws)
    return jnp.maximum(0, max_shift - raw).astype(jnp.int32)


def bfp_compress(iq: jnp.ndarray, data_width: int = 9,
                 iq_scaling: float = 1.0
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex IQ (..., nprb*12) -> (mantissas int16 (..., nprb, 24),
    exponents int32 (..., nprb)).

    Mantissas are the data_width-bit compressed samples (sign-extended in
    int16), exactly input_quantized >> exponent per PRB.
    """
    q = quantize_iq(iq, iq_scaling)
    q = q.reshape(*q.shape[:-1], -1, SAMPLES_PER_PRB)
    exp = _exponents(q, data_width)
    mant = jnp.right_shift(q.astype(jnp.int32), exp[..., None])
    return mant.astype(jnp.int16), exp


def bfp_decompress(mantissas: jnp.ndarray, exponents: jnp.ndarray
                   ) -> jnp.ndarray:
    """(..., nprb, 24) int16 + (..., nprb) exponents -> complex64
    (..., nprb*12), matching decompress_prb_generic (mant * 2^exp / gain)."""
    scale = jnp.exp2(exponents.astype(jnp.float32))[..., None] / _GAIN
    x = mantissas.astype(jnp.float32) * scale
    x = x.reshape(*x.shape[:-2], -1, 2)
    return (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)


def compress_none(iq: jnp.ndarray, data_width: int = 16,
                  iq_scaling: float = 1.0) -> jnp.ndarray:
    """'none' compression (iq_compression_none_impl): plain quantization to
    data_width-bit samples (stored sign-extended in int16)."""
    q = quantize_iq(iq, iq_scaling).astype(jnp.int32)
    shift = MAX_IQ_WIDTH - data_width
    return jnp.right_shift(q, shift).astype(jnp.int16)


def decompress_none(samples: jnp.ndarray, data_width: int = 16) -> jnp.ndarray:
    gain = np.float32((1 << (data_width - 1)) - 1)
    x = samples.astype(jnp.float32) / gain
    x = x.reshape(*x.shape[:-1], -1, 2)
    return (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)


# ---------------------------------------------------------------------------
# Host-side wire format (eCPRI U-plane PRB payload).
# ---------------------------------------------------------------------------

def pack_prbs(mantissas: np.ndarray, data_width: int) -> np.ndarray:
    """(nprb, 24) int16 W-bit mantissas -> (nprb, ceil(24W/8)) packed bytes.

    MSB-first concatenation of the W low bits of each sample, zero tail
    padding (compressed_prb_packer.cpp:28-61).
    """
    nprb = mantissas.shape[0]
    u = mantissas.astype(np.int64) & ((1 << data_width) - 1)
    shifts = np.arange(data_width - 1, -1, -1)
    bits = ((u[..., None] >> shifts) & 1).astype(np.uint8)
    bits = bits.reshape(nprb, -1)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1)


def unpack_prbs(packed: np.ndarray, data_width: int) -> np.ndarray:
    """(nprb, nbytes) packed bytes -> (nprb, 24) sign-extended int16."""
    nprb = packed.shape[0]
    bits = np.unpackbits(packed, axis=1)[:, :SAMPLES_PER_PRB * data_width]
    bits = bits.reshape(nprb, SAMPLES_PER_PRB, data_width).astype(np.int64)
    weights = 1 << np.arange(data_width - 1, -1, -1)
    u = (bits * weights).sum(axis=-1)
    sign = 1 << (data_width - 1)
    return (u - 2 * (u & sign)).astype(np.int16)
