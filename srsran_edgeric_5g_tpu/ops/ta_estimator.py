"""Time-alignment estimation from channel frequency response.

Counterpart of the reference's DFT-based TA estimator
(lib/phy/support/time_alignment_estimator/, used by
port_channel_estimator_average_impl.cpp:41-45 with a 4096-point IDFT):
transform the per-subcarrier channel estimate to the delay domain, find the
correlation peak, and report it in seconds.  The TPU version zero-pads to a
power-of-two IDFT (batched over ports/UEs) and interpolates the peak
quadratically for sub-sample resolution.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

DFT_SIZE = 4096


@functools.lru_cache(maxsize=16)
def _window_idft(nsubc: int, dft_size: int, half: int) -> np.ndarray:
    """(nsubc, 2*half) IDFT operator evaluating ONLY the delay bins
    [-half, half) of the ``dft_size``-point IDFT — one MXU matmul instead
    of a zero-padded length-``dft_size`` FFT whose bins are then mostly
    discarded (nsubc is ~10-40x smaller than dft_size on PUSCH pilots)."""
    k = np.arange(nsubc)[:, None]
    m = np.arange(-half, half)[None, :]
    return (np.exp(2j * np.pi * k * m / dft_size) / dft_size
            ).astype(np.complex64)


def estimate_ta(h_freq: jnp.ndarray, scs_hz: float,
                dft_size: int = DFT_SIZE,
                max_ta_fraction: float = 0.25,
                max_ta_s: float | None = None) -> jnp.ndarray:
    """(..., nsubc) channel estimate -> (...,) time alignment in seconds.

    Positive = the signal arrives late (peak at positive delay).  The search
    window is limited to +-max_ta_fraction of the IDFT span (or to
    +-max_ta_s seconds when given — the MXU matmul path: same bins as the
    reference's 4096-point IDFT, computed only inside the window) to reject
    wrap-around images, matching the reference's windowed peak search.
    """
    nsubc = h_freq.shape[-1]
    assert nsubc <= dft_size
    if max_ta_s is not None:
        half = max(2, min(int(np.ceil(max_ta_s * dft_size * scs_hz)),
                          dft_size // 2))
        e = jnp.asarray(_window_idft(nsubc, dft_size, half))
        win_c = h_freq @ e                           # (..., 2*half)
        win = jnp.real(win_c) ** 2 + jnp.imag(win_c) ** 2
        idx = jnp.argmax(win, axis=-1)
        return _peak_interp(win, idx, half, dft_size, scs_hz)
    pad = dft_size - nsubc
    hp = jnp.concatenate(
        [h_freq, jnp.zeros((*h_freq.shape[:-1], pad), h_freq.dtype)], axis=-1)
    corr = jnp.fft.ifft(hp, axis=-1)
    power = jnp.abs(corr) ** 2                      # (..., dft)

    half = int(dft_size * max_ta_fraction)
    # Window: delays [-half, half) mapped from IDFT bins [0, half) and
    # [dft-half, dft).
    pos = power[..., :half]
    neg = power[..., dft_size - half:]
    win = jnp.concatenate([neg, pos], axis=-1)       # delay -half .. half-1
    idx = jnp.argmax(win, axis=-1)
    return _peak_interp(win, idx, half, dft_size, scs_hz)


def _peak_interp(win: jnp.ndarray, idx: jnp.ndarray, half: int,
                 dft_size: int, scs_hz: float) -> jnp.ndarray:

    """Quadratic (parabolic) peak interpolation for sub-sample resolution."""
    i0 = jnp.clip(idx, 1, 2 * half - 2)
    gather = jnp.take_along_axis
    ym = gather(win, (i0 - 1)[..., None], axis=-1)[..., 0]
    y0 = gather(win, i0[..., None], axis=-1)[..., 0]
    yp = gather(win, (i0 + 1)[..., None], axis=-1)[..., 0]
    denom = ym - 2 * y0 + yp
    frac = jnp.where(jnp.abs(denom) > 1e-20, 0.5 * (ym - yp) / denom, 0.0)
    delay_bins = i0.astype(jnp.float32) + frac - half

    # One IDFT bin spans 1 / (dft_size * scs) seconds.
    return (delay_bins / (dft_size * scs_hz)).astype(jnp.float32)
