"""OFDM slot modulation / demodulation (TS 38.211 §5.3-5.4).

Counterpart of the reference's per-symbol streaming modulator/demodulator
(srsRAN-5G-ER/lib/phy/lower/modulation/ofdm_modulator_impl.cpp:56-139,
ofdm_demodulator_impl.cpp:94-125, phase_compensation_lut.h:60-98) —
re-designed for TPU batch semantics: whole slots per dispatch, one batched
(i)FFT over all symbols, CP insertion/stripping as a single static gather.

Conventions (matching the reference for loopback parity):
  * Subcarrier k=0..nsubc-1 maps to FFT bin (k - nsubc/2) mod nfft — the
    negative-frequency half sits at the top of the DFT input, DC = bin 0 of
    the upper half (ofdm_modulator_impl.cpp:84-87).
  * iFFT/FFT are unnormalised (FFTW convention); the caller-supplied ``scale``
    multiplies the output (reference defaults: modulator sqrt-power scaling
    from config, demodulator 1/nfft to invert).
  * Phase compensation per TS 38.211 §5.4: symbol l is scaled by
    exp(-+j 2 pi f_c t_l) with t_l the start time of the *useful* part of the
    symbol within its subframe (TX: -, RX: +).
  * CP insertion copies the tail of the useful part ahead of it.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..ran.numerology import SlotTiming


# FFT implementation for the slot transforms.  "xla" = jnp.fft (XLA's
# mixed-radix lowering); "mmdft" = MXU matmul-DFT two-step (Cooley-Tukey
# N = 128 x N/128 as two complex matmuls + twiddle) measured 1.8x (bf16) /
# 1.15x (3-pass bf16 'high') faster than XLA's 1536-pt FFT on v5e at the
# pipeline shape (tools/tpu_fft_ab.py).  bf16 single-pass adds ~-47 dB
# transform noise — negligible against the >= 25 dB-SNR operating points,
# verified by the loopback tests and the bench's decode iteration counts.
# Read at TRACE time: set before building jitted programs.  "auto" routes
# to mmdft/bf16 on accelerator backends (end-to-end bench: 20.6x -> 22.3x
# real-time with payload-exact recovery through 25 dB AWGN; 'high' 3-pass
# loses end-to-end despite winning standalone) and to jnp.fft on CPU, where
# matmul-DFT is slower and tests want the exact transform.
_FFT_IMPL = "auto"
_MMDFT_PRECISION = "default"   # 'default' (bf16) | 'high' (3-pass bf16)


def set_fft_impl(impl: str, precision: str = "default") -> None:
    """Select the slot-transform FFT ('auto' | 'xla' | 'mmdft')."""
    global _FFT_IMPL, _MMDFT_PRECISION
    assert impl in ("auto", "xla", "mmdft"), impl
    assert precision in ("default", "high", "highest"), precision
    _FFT_IMPL = impl
    _MMDFT_PRECISION = precision


def _use_mmdft(nfft: int) -> bool:
    if _FFT_IMPL == "mmdft":
        return nfft % 128 == 0
    if _FFT_IMPL == "auto":
        import jax

        return nfft % 128 == 0 and jax.default_backend() != "cpu"
    return False


@functools.lru_cache(maxsize=None)
def _mmdft_tables(nfft: int, n1: int, sign: int):
    """Twiddles for the N1 x N2 two-step DFT (standard order in and out)."""
    n2 = nfft // n1
    i2, k2 = np.meshgrid(np.arange(n2), np.arange(n2), indexing="ij")
    w2 = np.exp(sign * 2j * np.pi * i2 * k2 / n2).astype(np.complex64)
    tw = np.exp(sign * 2j * np.pi
                * np.outer(np.arange(n2), np.arange(n1)) / nfft
                ).astype(np.complex64)
    i1, k1 = np.meshgrid(np.arange(n1), np.arange(n1), indexing="ij")
    w1 = np.exp(sign * 2j * np.pi * i1 * k1 / n1).astype(np.complex64)
    return w2, tw, w1


def _mmdft(x: jnp.ndarray, sign: int, structured: bool = False) -> jnp.ndarray:
    """Unnormalised DFT (sign=-1 fwd, +1 inv) via two MXU matmul stages.

    x[..., n1 + 128*n2] -> X[..., N2*k1 + k2] == standard order both sides.
    Bit-for-bit equivalence to jnp.fft at 'highest' and the precision ladder
    are covered by tests/test_ofdm.py::test_mmdft_*.

    With ``structured`` the result stays in the (..., k1, k2) matmul output
    layout (flat index = N2*k1 + k2): at the slot shapes every CP length and
    band-edge offset is a multiple of N2, so CP insertion / stripping and
    the subcarrier selection become pure k1-row slices and the flatten back
    to (..., N) is a free contiguous reshape — no transpose copy at all.
    """
    import jax

    nfft = x.shape[-1]
    n1 = 128
    n2 = nfft // n1
    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[_MMDFT_PRECISION]
    w2, tw, w1 = _mmdft_tables(nfft, n1, sign)
    a = x.reshape(*x.shape[:-1], n2, n1)
    b = jnp.einsum("...ni,nk->...ki", a, jnp.asarray(w2), precision=prec)
    c = b * jnp.asarray(tw)
    # Emit the (k1, k2) layout straight out of the matmul: XLA folds the
    # output permutation into the matmul, saving the explicit transpose
    # copies (0.35 -> 0.32 ms fwd, 0.41 -> 0.36 inv on v5e).
    d = jnp.einsum("...kn,nj->...jk", c, jnp.asarray(w1), precision=prec)
    if structured:
        return d
    return d.reshape(*x.shape)


def _structured_ok(timing: SlotTiming) -> bool:
    """All slice boundaries multiples of N2 -> the k1-row formulation works."""
    n2 = timing.nfft // 128
    half = timing.nof_subc // 2
    return (timing.nfft % 128 == 0 and half % n2 == 0
            and all(cp % n2 == 0 for cp in timing.cp.cp)
            and all(s % n2 == 0 for s in timing.cp.data_starts))


def _slot_fft(x: jnp.ndarray) -> jnp.ndarray:
    """Forward transform used by demodulate_slot (unnormalised)."""
    if _use_mmdft(x.shape[-1]):
        return _mmdft(x, -1)
    return jnp.fft.fft(x, axis=-1).astype(jnp.complex64)


def _slot_ifft(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse transform used by modulate_slot (unnormalised: N * ifft)."""
    if _use_mmdft(x.shape[-1]):
        return _mmdft(x, +1)
    nfft = x.shape[-1]
    return (jnp.fft.ifft(x, axis=-1) * np.float32(nfft)).astype(jnp.complex64)


@functools.lru_cache(maxsize=None)
def _subcarrier_bins(nsubc: int, nfft: int) -> np.ndarray:
    """FFT bin index per subcarrier (negative half at top)."""
    k = np.arange(nsubc)
    return ((k - nsubc // 2) % nfft).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _cp_gather_index(timing_key: tuple) -> np.ndarray:
    """(total,) gather index into the flat (nsymb*nfft,) symbol buffer that
    produces the CP-inserted time-domain slot."""
    nfft, cps = timing_key
    out = []
    for l, cp in enumerate(cps):
        base = l * nfft
        out.append(base + np.arange(nfft - cp, nfft))  # CP = tail copy
        out.append(base + np.arange(nfft))
    return np.concatenate(out).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _data_gather_index(timing_key: tuple) -> np.ndarray:
    """(nsymb, nfft) gather index into the (total,) slot samples selecting the
    useful (post-CP) part of each symbol."""
    nfft, cps = timing_key
    starts = []
    t = 0
    for cp in cps:
        starts.append(t + cp)
        t += cp + nfft
    return (np.asarray(starts)[:, None] + np.arange(nfft)[None, :]).astype(np.int32)


def phase_compensation(timing: SlotTiming, center_freq_hz: float,
                       is_tx: bool, slot_in_subframe: int = 0) -> np.ndarray:
    """(nsymb,) complex64 phase-compensation coefficients for one slot.

    exp(-+ j 2 pi f_c t_l), t_l = start of the useful symbol part measured
    from the start of the subframe (phase_compensation_lut.h:64-80).
    """
    # Symbols of earlier slots in the subframe shift the time origin.
    slot_samples = timing.cp.total
    t0 = slot_in_subframe * slot_samples
    t_useful = (np.asarray(timing.cp.data_starts) + t0) / timing.srate
    sign = -1.0 if is_tx else 1.0
    ph = sign * 2.0 * np.pi * center_freq_hz * t_useful
    # High dynamic range: reduce f_c * t modulo 1 cycle in float64 first.
    return np.exp(1j * ph).astype(np.complex64)


def _timing_key(timing: SlotTiming) -> tuple:
    return (timing.nfft, timing.cp.cp)


def modulate_slot(grid: jnp.ndarray, timing: SlotTiming,
                  center_freq_hz: float = 0.0, scale: float = 1.0,
                  slot_in_subframe: int = 0) -> jnp.ndarray:
    """Resource grid (..., nsymb, nsubc) -> baseband samples (..., total).

    Unnormalised iDFT x scale x per-symbol phase compensation, CP inserted.
    """
    nsymb, nsubc = grid.shape[-2:]
    assert nsymb == timing.nsymb and nsubc == timing.nof_subc, (grid.shape, timing)
    nfft = timing.nfft

    import jax

    cpu = jax.default_backend() == "cpu"
    g = grid.astype(jnp.complex64)
    half = nsubc // 2
    if cpu:
        # XLA:CPU's FFT thunk requires a major-to-minor input layout; the
        # slice/concat formulation can hand it a non-monotonic layout under
        # SPMD partitioning, so CPU keeps the scatter/gather formulation.
        bins = _subcarrier_bins(nsubc, nfft)
        x = jnp.zeros((*grid.shape[:-1], nfft), dtype=jnp.complex64)
        x = x.at[..., jnp.asarray(bins)].set(g)
    else:
        # Map subcarriers to DFT bins: upper half -> bins 0.., lower half ->
        # top bins (two static slices + zero middle; no scatter).
        zeros_mid = jnp.zeros((*grid.shape[:-1], nfft - nsubc), jnp.complex64)
        x = jnp.concatenate([g[..., half:], zeros_mid, g[..., :half]], axis=-1)

    coef = phase_compensation(timing, center_freq_hz, is_tx=True,
                              slot_in_subframe=slot_in_subframe)
    coefs = jnp.asarray(coef * np.complex64(scale))

    if _use_mmdft(nfft) and _structured_ok(timing):
        # Stay in the matmul's (k1, n2) output layout: time index
        # t = n2*k1 + k2, and every CP length is a multiple of n2, so the
        # CP copy is a k1-row slice and the final flatten is free.
        n2 = nfft // 128
        td3 = _mmdft(x, +1, structured=True)       # (..., nsymb, 128, n2)
        td3 = td3 * coefs[:, None, None]
        parts = []
        for l, cp in enumerate(timing.cp.cp):
            sym = td3[..., l, :, :]
            parts.append(sym[..., 128 - cp // n2:, :])
            parts.append(sym)
        out = jnp.concatenate(parts, axis=-2)
        return out.reshape(*out.shape[:-2], -1)

    # Unnormalised inverse DFT (FFTW backward): N * jnp.ifft.
    td = _slot_ifft(x)
    td = td * coefs[:, None]

    if cpu:
        flat = td.reshape(*td.shape[:-2], nsymb * nfft)
        gather = jnp.asarray(_cp_gather_index(_timing_key(timing)))
        return flat[..., gather]
    # CP insertion as static slices + one concat (gathers are slow on TPU).
    parts = []
    for l, cp in enumerate(timing.cp.cp):
        sym = td[..., l, :]
        parts.append(sym[..., nfft - cp:])
        parts.append(sym)
    return jnp.concatenate(parts, axis=-1)


def demodulate_slot(samples: jnp.ndarray, timing: SlotTiming,
                    center_freq_hz: float = 0.0, scale: float | None = None,
                    slot_in_subframe: int = 0,
                    window_offset: int = 0) -> jnp.ndarray:
    """Baseband samples (..., total) -> resource grid (..., nsymb, nsubc).

    ``scale`` defaults to 1/nfft (inverts the unnormalised modulator at
    scale=1).  ``window_offset`` advances the DFT window into the CP by that
    many samples, compensated by the per-bin phase ramp
    (ofdm_demodulator_impl.cpp:60-76).
    """
    nfft, nsubc, nsymb = timing.nfft, timing.nof_subc, timing.nsymb
    assert samples.shape[-1] == timing.cp.total
    scale = 1.0 / nfft if scale is None else scale

    # Per-symbol static slices (stacked) instead of one big gather — the fast
    # TPU path.  The CPU backend's FFT thunk rejects the resulting
    # non-major layout under sharding, so it keeps the gather formulation.
    import jax

    if jax.default_backend() == "cpu":
        idx = _data_gather_index(_timing_key(timing)) - window_offset
        seg = samples[..., jnp.asarray(idx)]        # (..., nsymb, nfft)
    else:
        segs = [samples[..., s - window_offset: s - window_offset + nfft]
                for s in timing.cp.data_starts]
        seg = jnp.stack(segs, axis=-2)              # (..., nsymb, nfft)

    coef = phase_compensation(timing, center_freq_hz, is_tx=False,
                              slot_in_subframe=slot_in_subframe)
    coefs = jnp.asarray(coef * np.complex64(scale))
    half = nsubc // 2

    if _use_mmdft(nfft) and _structured_ok(timing):
        # Keep the (k1, n2) matmul layout: bin b = n2*k1 + k2, and the band
        # edges are multiples of n2, so subcarrier selection is two k1-row
        # slices and the flatten to (..., nsubc) is free.
        n2 = nfft // 128
        fd3 = _mmdft(seg, -1, structured=True)      # (..., nsymb, 128, n2)
        fd3 = fd3 * coefs[:, None, None]
        if window_offset:
            omega = 2.0 * np.pi * window_offset / nfft
            ramp = np.exp(1j * omega * np.arange(nfft)).astype(np.complex64)
            fd3 = fd3 * jnp.asarray(ramp.reshape(128, n2))
        out = jnp.concatenate([fd3[..., 128 - half // n2:, :],
                               fd3[..., :half // n2, :]], axis=-2)
        return out.reshape(*out.shape[:-2], nsubc)

    fd = _slot_fft(seg)
    fd = fd * coefs[:, None]

    if window_offset:
        omega = 2.0 * np.pi * window_offset / nfft
        ramp = np.exp(1j * omega * np.arange(nfft)).astype(np.complex64)
        fd = fd * jnp.asarray(ramp)

    if jax.default_backend() == "cpu":
        bins = _subcarrier_bins(nsubc, nfft)
        return fd[..., jnp.asarray(bins)]
    return jnp.concatenate([fd[..., nfft - half:], fd[..., :nsubc - half]],
                           axis=-1)
