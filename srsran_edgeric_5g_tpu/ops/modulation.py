"""Modulation mapping and max-log soft demapping, TS 38.211 §5.1.

Mapper: bits -> constellation symbols (BPSK, QPSK, 16/64/256-QAM) via per-axis
Gray PAM lookup tables (one gather per axis).  Counterpart of the reference's
modulation_mapper_lut_impl.cpp / modulation_mapper_avx512_impl.cpp.

Demapper: exact max-log LLRs computed per real axis by subset-distance
minimisation over the (at most 16-level) PAM alphabet — a fully vectorised
formulation that reproduces the reference's piecewise-linear interval functions
(demodulation_mapper_qam16.cpp:66-118 etc.) exactly, including:
  * LLR sign convention: positive <=> bit 0 (symbol amplitude (1-2b)),
  * scaling by the reciprocal noise variance,
  * int8 quantisation: clip to +-20, then round(value * 120 / 20)
    (demodulation_mapper_qam16.cpp:36, log_likelihood_ratio.cpp quantize,
    LLR_MAX = 120 in include/srsran/phy/upper/log_likelihood_ratio.h:243).
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

RANGE_LIMIT = 20.0       # QAM16/64/256 (demodulation_mapper_qam16.cpp:36)
RANGE_LIMIT_PSK = 24.0   # BPSK/pi2-BPSK/QPSK (demodulation_mapper_qpsk.cpp:35,
                         #  demodulation_mapper_impl.cpp:47)
LLR_MAX = 120

QM = {"bpsk": 1, "qpsk": 2, "qam16": 4, "qam64": 6, "qam256": 8}
NAME_BY_QM = {v: k for k, v in QM.items()}


@functools.lru_cache(maxsize=None)
def pam_levels(m: int) -> np.ndarray:
    """Amplitudes of the 2**m-level NR Gray PAM, indexed by bit pattern.

    Index i has bits (b0, b1, ..., b_{m-1}) MSB-first; the amplitude follows
    the TS 38.211 §5.1.3-5.1.6 nesting
    a = (1-2b0)*[2^{m-1+...} - (1-2b1)*[... - (1-2b_{m-1})]] / sqrt(norm).
    """
    if m == 0:
        return np.array([1.0])
    amps = np.zeros(1 << m)
    for i in range(1 << m):
        bits = [(i >> (m - 1 - k)) & 1 for k in range(m)]
        val = 0.0
        for k in range(m - 1, -1, -1):
            s = 1 - 2 * bits[k]
            if k == m - 1:
                val = s
            else:
                val = s * (2 ** (m - 1 - k) - val)
        amps[i] = val
    # Normalise to unit average symbol energy across the full QAM square
    # (norm = 2/3*(4^m - 1) per axis pair => sqrt(2*(4^m-1)/3) total).
    norm = np.sqrt(2.0 * (4 ** m - 1) / 3.0)
    return amps / norm


def _axis_tables(qm: int) -> tuple[np.ndarray, np.ndarray]:
    """(levels (2^m,), bitmask (m, 2^m)) for one real axis; m = qm // 2."""
    m = qm // 2
    levels = pam_levels(m)
    idx = np.arange(1 << m)
    masks = np.stack([((idx >> (m - 1 - k)) & 1) for k in range(m)]).astype(bool)
    return levels, masks


def modulate(bits: jnp.ndarray, modulation: str) -> jnp.ndarray:
    """int8 {0,1} bits (..., nsym*Qm) -> complex64 symbols (..., nsym)."""
    qm = QM[modulation]
    b = bits.reshape(*bits.shape[:-1], -1, qm).astype(jnp.int32)
    if qm == 1:  # BPSK: d = ((1-2b) + j(1-2b)) / sqrt(2)
        s = (1 - 2 * b[..., 0]).astype(jnp.float32) * np.float32(1 / np.sqrt(2))
        return (s + 1j * s).astype(jnp.complex64)
    m = qm // 2
    if os.environ.get("SRSRAN_TPU_MOD_LUT") == "1":
        # A/B switch: the pre-r3 LUT-gather mapper (perf bisection only).
        levels = jnp.asarray(pam_levels(m), dtype=jnp.float32)
        w = jnp.asarray(1 << np.arange(m - 1, -1, -1), dtype=jnp.int32)
        idx_i = jnp.sum(b[..., 0::2] * w, axis=-1)
        idx_q = jnp.sum(b[..., 1::2] * w, axis=-1)
        return (levels[idx_i] + 1j * levels[idx_q]).astype(jnp.complex64)
    # Closed-form Gray nesting (TS 38.211 §5.1.4-6 structure): per axis with
    # MSB-first bits, d/a = s_0*(2^{m-1} - s_1*(2^{m-2} - ... s_{m-1})) with
    # s_j = 1-2b_j — pure elementwise arithmetic.  The LUT-gather form
    # (levels[idx]) lowers to a sequential kCustom gather on TPU that was
    # ~10% of the MIMO full-slot step's device time.
    a = np.float32(1.0 / np.sqrt(2.0 * (4 ** m - 1) / 3.0))
    s = (1 - 2 * b).astype(jnp.float32)                    # (..., qm) signs

    def _axis(sg):                                          # (..., m)
        v = sg[..., m - 1]
        for j in range(m - 2, -1, -1):
            v = sg[..., j] * (np.float32(1 << (m - 1 - j)) - v)
        return v * a

    return (_axis(s[..., 0::2]) + 1j * _axis(s[..., 1::2])
            ).astype(jnp.complex64)


def _axis_maxlog(y: jnp.ndarray, noise_var_rcp: jnp.ndarray, qm: int) -> jnp.ndarray:
    """Exact max-log LLRs for one real axis, closed form.

    ``y`` (...,) real part; returns (..., m) float LLRs, bit order MSB-first.
    LLR = (min_{bit=1} d^2 - min_{bit=0} d^2) * rcp_noise  (positive <=> bit 0).

    Uses the Gray-fold recursion instead of materializing per-level distance
    tensors: in the NR nesting (pam_levels) bit j splits the current
    coordinate u_j by sign with 2^{m-1-j} levels at odd multiples of ``a``
    per side, and the next bit lives in the reflected coordinate
    u_{j+1} = 2^{m-1-j}·a - |u_j| (an isometry on each side, so subset
    distances are preserved).  The nearest level of each sign subset is a
    round+clamp, giving the exact subset minima in O(1) per bit — the
    per-level (..., 2^m) intermediates of the naive subset-min formulation
    (kept as the test oracle, `_axis_maxlog_subset`) were ~12% of the UL
    pipeline's device time at 64QAM.
    """
    m = qm // 2
    a = np.float32(1.0 / np.sqrt(2.0 * (4 ** m - 1) / 3.0))
    u = y
    out = []
    for j in range(m):
        k = 1 << (m - 1 - j)          # levels per side of u_j
        if k == 1:
            lj = (4.0 * a) * u        # (u+a)^2 - (u-a)^2
        else:
            kpos = jnp.clip(jnp.round((u - a) / (2.0 * a)), 0, k - 1)
            kneg = jnp.clip(jnp.round((-u - a) / (2.0 * a)), 0, k - 1)
            p = (2.0 * a) * kpos + a          # nearest bit-0 (positive) level
            n = -((2.0 * a) * kneg + a)       # nearest bit-1 (negative) level
            lj = (u - n) ** 2 - (u - p) ** 2
        out.append(lj)
        if j < m - 1:
            u = (k * a) - jnp.abs(u)
    return jnp.stack(out, axis=-1) * noise_var_rcp[..., None]


def _axis_maxlog_subset(y: jnp.ndarray, noise_var_rcp: jnp.ndarray,
                        qm: int) -> jnp.ndarray:
    """Subset-distance-minimisation oracle for `_axis_maxlog` (same result,
    materializes the (..., 2^m) distance tensor)."""
    levels, masks = _axis_tables(qm)
    d2 = (y[..., None] - jnp.asarray(levels, dtype=y.dtype)) ** 2  # (..., L)
    big = jnp.asarray(np.inf, dtype=y.dtype)
    mask1 = jnp.asarray(masks)  # (m, L) True where bit==1
    d2e = d2[..., None, :]  # (..., 1, L)
    min1 = jnp.min(jnp.where(mask1, d2e, big), axis=-1)
    min0 = jnp.min(jnp.where(mask1, big, d2e), axis=-1)
    return (min1 - min0) * noise_var_rcp[..., None]


def demodulate_soft(symbols: jnp.ndarray, noise_var: jnp.ndarray,
                    modulation: str, quantize: bool = True) -> jnp.ndarray:
    """Max-log soft demap: symbols (..., nsym) -> LLRs (..., nsym*Qm).

    ``noise_var`` broadcasts against ``symbols``.  With ``quantize`` the output
    is int8 in [-LLR_MAX, LLR_MAX]; otherwise float32.
    """
    qm = QM[modulation]
    nv = jnp.broadcast_to(noise_var, symbols.shape).astype(jnp.float32)
    rcp = jnp.where(nv > 0, 1.0 / jnp.maximum(nv, 1e-30), 0.0)
    re = jnp.real(symbols).astype(jnp.float32)
    im = jnp.imag(symbols).astype(jnp.float32)
    if qm == 1:
        # BPSK symbols +-(1+j)/sqrt(2): L = sqrt(2)*(re+im)*2*rcp
        llr = (2.0 * np.sqrt(2.0).astype(np.float32)) * (re + im) * rcp
        llrs = llr[..., None]
    else:
        li = _axis_maxlog(re, rcp, qm)  # (..., m) even bits b0,b2,...
        lq = _axis_maxlog(im, rcp, qm)  # (..., m) odd bits b1,b3,...
        llrs = jnp.stack([li, lq], axis=-1).reshape(*li.shape[:-1], -1)
    llrs = llrs.reshape(*symbols.shape[:-1], -1)
    if not quantize:
        return llrs
    return quantize_llrs(llrs, RANGE_LIMIT_PSK if qm <= 2 else RANGE_LIMIT)


def wire_quantize(llrs: jnp.ndarray, modulation: str) -> jnp.ndarray:
    """Reference int8 wire quantisation kept in FLOAT dtype: clip to the
    constellation's range limit, scale to ±120 integer steps.  The decoder's
    'wire' schedules expect this domain (integer values are exact in
    f32/bf16); float dtype keeps the descramble/demux/HARQ stream ops
    unchanged."""
    qm = QM[modulation]
    rl = RANGE_LIMIT_PSK if qm <= 2 else RANGE_LIMIT
    scale = np.float32(LLR_MAX / rl)
    return jnp.clip(jnp.round(llrs * scale), -LLR_MAX, LLR_MAX)


def quantize_llrs(llrs: jnp.ndarray,
                  range_limit: float = RANGE_LIMIT) -> jnp.ndarray:
    """Reference-compatible int8 quantisation: clip to +-range_limit, scale
    to +-120.  The reference uses range 20 for the QAM constellations and 24
    for BPSK/QPSK (cross-validated bit-exactly in test_reference_parity)."""
    clipped = jnp.clip(llrs, -range_limit, range_limit)
    return jnp.round(clipped * (LLR_MAX / range_limit)).astype(jnp.int8)


def hard_decision(llrs: jnp.ndarray) -> jnp.ndarray:
    """LLR (positive <=> bit 0) -> hard bits {0,1} int8 (ties -> 0)."""
    return (llrs < 0).astype(jnp.int8)
