"""Channel emulator: AWGN, CFO, delay, and TDL Rayleigh fading.

Counterpart of the reference UE tree's channel emulator
(srs-4G-UE/lib/src/phy/channel/{ch_awgn,delay,fading,hst}.c) used to stress
the receive chain — re-built as batched jnp ops so BLER sweeps run on device:

  * awgn: complex Gaussian at a target SNR.
  * cfo/delay: frequency shift and (integer) sample delay.
  * TDL fading: tapped delay line with per-tap Rayleigh coefficients drawn
    from a Jakes-like sum-of-sinusoids process, applied as a (short) FIR
    convolution; presets for TDL-A/B/C-style power/delay profiles at a given
    sample rate.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Simplified power-delay profiles (delay ns, power dB) — 3GPP TR 38.901 TDL
# shapes truncated to the strongest taps (enough to stress an equalizer).
TDL_PROFILES = {
    "tdla": ((0.0, 0.0), (38.2, -11.2), (60.3, -19.0), (94.0, -22.8)),
    "tdlb": ((0.0, 0.0), (107.0, -2.2), (251.0, -4.0), (426.0, -8.0)),
    "tdlc": ((0.0, -4.4), (209.0, -1.2), (423.0, -3.5), (658.0, 0.0),
             (1029.0, -5.6)),
}


def awgn(key, samples: jnp.ndarray, snr_db: float) -> jnp.ndarray:
    """Add complex AWGN at the given SNR w.r.t. the measured signal power."""
    p = jnp.mean(jnp.abs(samples) ** 2)
    nv = p * 10.0 ** (-snr_db / 10.0)
    kr, ki = jax.random.split(key)
    noise = (jax.random.normal(kr, samples.shape)
             + 1j * jax.random.normal(ki, samples.shape))
    return samples + noise.astype(samples.dtype) * jnp.sqrt(nv / 2).astype(
        jnp.float32)


def apply_cfo(samples: jnp.ndarray, cfo_hz: float, srate: float) -> jnp.ndarray:
    n = samples.shape[-1]
    ph = 2.0 * np.pi * cfo_hz / srate
    rot = jnp.exp(1j * ph * jnp.arange(n)).astype(jnp.complex64)
    return samples * rot


def apply_delay(samples: jnp.ndarray, delay_samples: int) -> jnp.ndarray:
    """Integer-sample delay (zero-fill head)."""
    if delay_samples == 0:
        return samples
    pad = jnp.zeros((*samples.shape[:-1], delay_samples), samples.dtype)
    return jnp.concatenate([pad, samples[..., :-delay_samples]], axis=-1)


@dataclasses.dataclass(frozen=True)
class TdlChannel:
    """Static tap layout for a profile at a sample rate."""

    taps: np.ndarray       # (ntap,) integer sample delays
    powers: np.ndarray     # (ntap,) linear power, sum = 1

    @property
    def max_delay(self) -> int:
        return int(self.taps.max())


def make_tdl(profile: str, srate: float, delay_spread_scale: float = 1.0
             ) -> TdlChannel:
    prof = TDL_PROFILES[profile]
    delays = np.asarray([int(round(d * 1e-9 * delay_spread_scale * srate))
                         for d, _ in prof])
    powers = 10.0 ** (np.asarray([p for _, p in prof]) / 10.0)
    # merge taps landing on the same sample
    uniq = {}
    for d, p in zip(delays, powers):
        uniq[d] = uniq.get(d, 0.0) + p
    taps = np.asarray(sorted(uniq))
    pw = np.asarray([uniq[t] for t in taps])
    pw = pw / pw.sum()
    return TdlChannel(taps=taps, powers=pw)


def tdl_coefficients(key, ch: TdlChannel, dtype=jnp.complex64) -> jnp.ndarray:
    """Draw one Rayleigh realisation per tap: h_i ~ CN(0, p_i)."""
    kr, ki = jax.random.split(key)
    ntap = len(ch.taps)
    h = (jax.random.normal(kr, (ntap,)) + 1j * jax.random.normal(ki, (ntap,)))
    return (h * jnp.sqrt(jnp.asarray(ch.powers) / 2.0)).astype(dtype)


def apply_tdl(samples: jnp.ndarray, ch: TdlChannel,
              coeffs: jnp.ndarray) -> jnp.ndarray:
    """y[n] = sum_i h_i x[n - d_i] — a sparse FIR over the static tap set."""
    out = jnp.zeros_like(samples)
    for i, d in enumerate(ch.taps):
        out = out + coeffs[..., i, None] * apply_delay(samples, int(d))
    return out


def fade_awgn(key, samples: jnp.ndarray, profile: str, srate: float,
              snr_db: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience: TDL fade + AWGN; returns (rx, tap coefficients)."""
    ch = make_tdl(profile, srate)
    k1, k2 = jax.random.split(key)
    h = tdl_coefficients(k1, ch)
    faded = apply_tdl(samples, ch, h)
    return awgn(k2, faded, snr_db), h


# ------------------------------------------------- HST / RLF trajectories

def hst_doppler_hz(t_s: jnp.ndarray, fd_hz: float, period_s: float,
                   ds_m: float = 300.0, dmin_m: float = 2.0) -> jnp.ndarray:
    """Instantaneous Doppler of the TS 36.141 high-speed-train scenario.

    Counterpart of srs-4G-UE/lib/src/phy/channel/hst.c:70-81: the train
    passes the base station once per ``period_s``; cos(theta(t)) follows
    the two-branch trajectory geometry (ds_m = BS distance along track,
    dmin_m = BS distance from track), giving the characteristic +fd -> -fd
    Doppler sweep through the pass.  Vectorised over ``t_s``.
    """
    t = jnp.mod(jnp.asarray(t_s, jnp.float32), np.float32(period_s))
    num = jnp.where(t <= period_s / 2.0,
                    np.float32(period_s / 4.0) - t,
                    t - np.float32(0.75 * period_s))
    den = jnp.sqrt(np.float32((dmin_m * period_s / (ds_m * 2.0)) ** 2)
                   + num * num)
    return np.float32(fd_hz) * num / den


def apply_hst(samples: jnp.ndarray, fd_hz: float, period_s: float,
              srate: float, slot_s: float = 1e-3,
              init_time_s: float = 0.0) -> jnp.ndarray:
    """Apply the HST Doppler trajectory to a (S, total) slot batch.

    Like the reference, the Doppler is held constant within each slot
    (hst.c:84 "assume the doppler does not vary in a sub-frame") and the
    shift is applied as a phase ramp exp(-j 2 pi fs t).
    """
    s, total = samples.shape
    t_slots = init_time_s + np.arange(s, dtype=np.float32) * slot_s
    fs = hst_doppler_hz(jnp.asarray(t_slots), fd_hz, period_s)  # (S,)
    n = jnp.arange(total, dtype=jnp.float32) / np.float32(srate)
    ph = np.float32(-2.0 * np.pi) * fs[:, None] * n[None, :]
    return samples * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


def apply_rlf(samples: jnp.ndarray, t_on_ms: int, t_off_ms: int,
              slot_ms: float = 1.0, init_time_ms: float = 0.0
              ) -> jnp.ndarray:
    """Radio-link-failure emulation: periodic full-blank of the channel
    (srs-4G-UE/lib/src/phy/channel/rlf.c:36-55 — unity gain for t_on_ms,
    zero for t_off_ms).  Slot-granular over a (S, total) batch."""
    s = samples.shape[0]
    period = float(t_on_ms + t_off_ms)
    t = np.mod(init_time_ms + np.arange(s, dtype=np.float64) * slot_ms,
               period)
    gain = (t < t_on_ms).astype(np.float32)
    return samples * jnp.asarray(gain)[:, None]
