"""Port channel estimation from DM-RS pilots (PUSCH/PDSCH receive side).

Counterpart of the reference's
srsRAN-5G-ER/lib/phy/upper/signal_processors/port_channel_estimator_average_impl.cpp
(pilot conjugate-match, CFO estimate/compensate :86-112, time averaging, LSE,
frequency interpolation) and lib/phy/support/interpolator/
interpolator_linear_impl.cpp — re-designed as fully vectorised batched ops:

  * LS at pilots: H_ls = Y * conj(P)  (unit-modulus QPSK pilots).
  * CFO from the phase of the cross-correlation between DM-RS symbols,
    compensated before time-averaging (enabled with >= 2 DM-RS symbols).
  * Noise variance from the time residual across DM-RS symbols (2+ symbols)
    or the adjacent-pilot difference (single symbol).
  * Linear frequency interpolation/extrapolation to all subcarriers via
    precomputed static gather + lerp weights.

The reference's 4096-point IDFT time-alignment estimation and RC-filter
frequency smoothing are tracked separately (ops.ta_estimator) and can be
inserted between averaging and interpolation.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_weights(pilot_pos: tuple, nsubc: int) -> tuple[np.ndarray, np.ndarray]:
    """Static linear interp: target k -> (left pilot index, frac)."""
    pos = np.asarray(pilot_pos, dtype=np.float64)
    npil = len(pos)
    k = np.arange(nsubc, dtype=np.float64)
    right = np.searchsorted(pos, k, side="left")
    left = np.clip(right - 1, 0, npil - 2)
    denom = pos[left + 1] - pos[left]
    frac = (k - pos[left]) / denom          # <0 or >1 extrapolates at edges
    return left.astype(np.int32), frac.astype(np.float32)


def ls_estimate(rx_pilots: jnp.ndarray, ref_pilots: jnp.ndarray) -> jnp.ndarray:
    """Least-squares estimate at pilot positions: Y * conj(P) (|P| = 1)."""
    return rx_pilots * jnp.conj(ref_pilots)


def cfo_correlation(h_ls: jnp.ndarray) -> jnp.ndarray:
    """Complex first-to-last DM-RS pilot correlation sum h[-1]*conj(h[0]).

    Its angle over the DM-RS time distance is the CFO; its magnitude is the
    stream energy — summing correlations across streams/antennas before
    taking the angle gives an energy-weighted CFO where dead streams (e.g. a
    zero cross-channel entry in MIMO OCC de-spreading) contribute nothing
    instead of injecting a random phase.
    """
    return jnp.sum(h_ls[..., -1, :] * jnp.conj(h_ls[..., 0, :]), axis=-1)


def cfo_estimate(h_ls: jnp.ndarray, symbol_distance_s: float) -> jnp.ndarray:
    """CFO (Hz) from phase drift between first and last DM-RS symbols.

    ``h_ls``: (..., ndmrs, npilots) with ndmrs >= 2.
    """
    corr = cfo_correlation(h_ls)
    return (jnp.angle(corr) / (2.0 * np.pi * symbol_distance_s)).astype(jnp.float32)


def estimate_port(rx_pilots: jnp.ndarray, ref_pilots: jnp.ndarray,
                  pilot_subcarriers: np.ndarray, nsubc: int,
                  dmrs_symbol_times_s: np.ndarray | None = None,
                  compensate_cfo: bool = True,
                  ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Estimate one port's channel over the whole band.

    Args:
      rx_pilots: (..., ndmrs, npilots) received DM-RS REs.
      ref_pilots: (..., ndmrs, npilots) or (..., npilots) transmitted pilots
        (with frequency OCC applied).
      pilot_subcarriers: static (npilots,) positions within [0, nsubc).
      nsubc: band width in subcarriers.
      dmrs_symbol_times_s: static (ndmrs,) symbol start times (CFO needs >= 2).

    Returns:
      h_freq: (..., nsubc) channel estimate over every subcarrier.
      noise_var: (...,) estimated noise variance.
      cfo_hz: (...,) estimated CFO (0 when not estimable).
    """
    if ref_pilots.ndim < rx_pilots.ndim:
        ref_pilots = ref_pilots[..., None, :]
    h_ls = ls_estimate(rx_pilots, ref_pilots)        # (..., ndmrs, npilots)
    ndmrs = h_ls.shape[-2]

    cfo = jnp.zeros(h_ls.shape[:-2], jnp.float32)
    if ndmrs >= 2 and dmrs_symbol_times_s is not None:
        dt = float(dmrs_symbol_times_s[-1] - dmrs_symbol_times_s[0])
        cfo = cfo_estimate(h_ls, dt)
        if compensate_cfo:
            t = jnp.asarray(np.asarray(dmrs_symbol_times_s, dtype=np.float32))
            rot = jnp.exp(-2j * np.pi * cfo[..., None] * t).astype(jnp.complex64)
            h_ls = h_ls * rot[..., None]

    h_p = jnp.mean(h_ls, axis=-2)                    # (..., npilots)

    if ndmrs >= 2:
        resid = h_ls - h_p[..., None, :]
        # E|resid|^2 = sigma^2 * (ndmrs-1)/ndmrs per element.
        noise_var = (jnp.mean(jnp.abs(resid) ** 2, axis=(-2, -1))
                     * (ndmrs / (ndmrs - 1)))
    else:
        # Adjacent-pilot half-difference (channel ~flat across one pilot gap).
        d = h_p[..., 1::2] - h_p[..., 0::2]
        noise_var = jnp.mean(jnp.abs(d) ** 2, axis=-1) / 2.0

    left, frac = _interp_weights(tuple(int(p) for p in pilot_subcarriers), nsubc)
    hl = h_p[..., jnp.asarray(left)]
    hr = h_p[..., jnp.asarray(left + 1)]
    fr = jnp.asarray(frac)
    h_freq = hl + (hr - hl) * fr
    return h_freq.astype(jnp.complex64), noise_var.astype(jnp.float32), cfo


@functools.lru_cache(maxsize=None)
def _smooth_matrix(npil: int, delay_spread_s: float, pilot_scs: float,
                   half_len: int = 24) -> np.ndarray:
    """(npil, npil + 2*half_len) valid-convolution smoothing operator.

    A windowed-sinc low-pass over the (edge-extended) pilot axis whose
    one-sided passband covers ``delay_spread_s``: channel energy at in-band
    delays passes ~unity, pilot noise (white over the whole delay range) is
    cut by ~2*fc.  One matmul — MXU-shaped, unlike a global IDFT truncation
    which Gibbs-rings on the finite aperture.
    """
    # One-sided passband edge in cycles/pilot-sample, plus half the
    # Hann-windowed-sinc transition width (~3.1/(2L+1)) so in-band delays
    # sit on the flat part of the response, not the rolloff.
    fc = delay_spread_s * pilot_scs + 1.6 / (2 * half_len + 1)
    m = np.arange(-half_len, half_len + 1, dtype=np.float64)
    k = 2 * fc * np.sinc(2 * fc * m)
    k *= np.hanning(2 * half_len + 1 + 2)[1:-1]
    k /= k.sum()
    s = np.zeros((npil, npil + 2 * half_len), dtype=np.float64)
    for i in range(npil):
        s[i, i:i + 2 * half_len + 1] = k
    return s.astype(np.float32)


def _freq_smooth(h_flat: jnp.ndarray, delay_spread_s: float,
                 pilot_scs: float, half_len: int = 24) -> jnp.ndarray:
    """Smooth a TA-derotated pilot-domain channel along frequency.

    Band edges are extended with the conjugate-ramp rule
    ``h[-m] = h0^2 conj(h[m]) / |h0|^2`` (exact continuation for any
    single-ray residual delay, first-order for multipath) so the low-pass
    sees a phase-continuous sequence and does not smear the edges.
    """
    L = half_len
    eps = jnp.float32(1e-20)

    def ext(anchor, seg):                    # anchor: (..., 1), seg: (..., L)
        scale = anchor * anchor / (jnp.abs(anchor) ** 2 + eps)
        return scale * jnp.conj(seg)

    left = ext(h_flat[..., 0:1], h_flat[..., 1:L + 1][..., ::-1])
    right = ext(h_flat[..., -1:], h_flat[..., -L - 1:-1][..., ::-1])
    hext = jnp.concatenate([left, h_flat, right], axis=-1)
    s = jnp.asarray(_smooth_matrix(h_flat.shape[-1], delay_spread_s,
                                   pilot_scs, half_len))
    return (hext.real @ s.T + 1j * (hext.imag @ s.T)).astype(jnp.complex64)


def estimate_port_ta(rx_pilots: jnp.ndarray, ref_pilots: jnp.ndarray,
                     pilot_subcarriers: np.ndarray, nsubc: int,
                     scs_hz: float,
                     dmrs_symbol_times_s: np.ndarray | None = None,
                     delay_spread_s: float | None = None,
                     ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """estimate_port + time-alignment-compensated interpolation.

    The reference's estimator runs a 4096-point IDFT time-alignment stage
    before frequency smoothing (port_channel_estimator_average_impl.h:41-45).
    Equivalent here: estimate the dominant delay from the pilot-domain
    channel, derotate the linear phase ramp (making the channel ~flat across
    the pilot gap so linear interpolation is accurate), interpolate, then
    restore the ramp on the full band.

    ``delay_spread_s`` enables the denoising counterpart of the reference's
    RC-filter frequency smoothing: the pilot-domain channel is taken to the
    delay domain, a raised-cosine window spanning [ta - guard, ta +
    delay_spread] keeps the physical impulse response and zeroes the
    noise-only taps, and the result returns to frequency.  Noise on the
    pilots is suppressed by ~(kept taps / total taps).

    Returns (h_freq, noise_var, cfo_hz, ta_seconds).
    """
    from .ta_estimator import estimate_ta

    if ref_pilots.ndim < rx_pilots.ndim:
        ref_pilots = ref_pilots[..., None, :]
    h_ls = ls_estimate(rx_pilots, ref_pilots)
    ndmrs = h_ls.shape[-2]

    cfo = jnp.zeros(h_ls.shape[:-2], jnp.float32)
    if ndmrs >= 2 and dmrs_symbol_times_s is not None:
        dt = float(dmrs_symbol_times_s[-1] - dmrs_symbol_times_s[0])
        cfo = cfo_estimate(h_ls, dt)
        t = jnp.asarray(np.asarray(dmrs_symbol_times_s, dtype=np.float32))
        rot = jnp.exp(-2j * np.pi * cfo[..., None] * t).astype(jnp.complex64)
        h_ls = h_ls * rot[..., None]
    h_p = jnp.mean(h_ls, axis=-2)

    if ndmrs >= 2:
        resid = h_ls - h_p[..., None, :]
        noise_var = (jnp.mean(jnp.abs(resid) ** 2, axis=(-2, -1))
                     * (ndmrs / (ndmrs - 1)))
    else:
        d = h_p[..., 1::2] - h_p[..., 0::2]
        noise_var = jnp.mean(jnp.abs(d) ** 2, axis=-1) / 2.0

    # TA from the pilot-spaced channel: pilot spacing = gap * scs.
    # An attached UE's PUSCH arrives within ~+-CP/2 of the slot boundary
    # (RACH TA command + closed-loop TA keep it there), so the delay-domain
    # peak search runs only the +-2.5 us window of the 4096-point IDFT —
    # as one (npil -> nbins) MXU matmul instead of a zero-padded FFT whose
    # other ~90% of bins are discarded.
    gap = int(pilot_subcarriers[1] - pilot_subcarriers[0])
    pilot_scs = gap * scs_hz
    ta = estimate_ta(h_p, pilot_scs, max_ta_s=2.5e-6)
    # When smoothing, derotate to the CENTER of the expected delay window
    # [ta, ta + spread] so residual delays span +-spread/2: the smoother's
    # cutoff (and so its noise bandwidth) halves, and edge distortion of
    # late taps shrinks with their residual phase slope.
    guard_s = 0.3e-6
    t_c = ta if delay_spread_s is None else ta + delay_spread_s / 2
    pil_k = jnp.asarray(np.asarray(pilot_subcarriers, dtype=np.float32))
    deramp = jnp.exp(2j * np.pi * scs_hz * t_c[..., None] * pil_k)
    h_flat = h_p * deramp.astype(jnp.complex64)

    if delay_spread_s is not None:
        h_flat = _freq_smooth(h_flat, delay_spread_s / 2 + guard_s, pilot_scs)

    left, frac = _interp_weights(tuple(int(p) for p in pilot_subcarriers), nsubc)
    hl = h_flat[..., jnp.asarray(left)]
    hr = h_flat[..., jnp.asarray(left + 1)]
    h_freq = hl + (hr - hl) * jnp.asarray(frac)
    all_k = jnp.asarray(np.arange(nsubc, dtype=np.float32))
    reramp = jnp.exp(-2j * np.pi * scs_hz * t_c[..., None] * all_k)
    h_freq = h_freq * reramp.astype(jnp.complex64)
    return h_freq.astype(jnp.complex64), noise_var.astype(jnp.float32), cfo, ta
