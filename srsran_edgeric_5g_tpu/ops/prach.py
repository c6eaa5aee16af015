"""PRACH preamble generation and detection (TS 38.211 §6.3.3).

Counterparts of the reference's prach_generator_impl.cpp (ZC preamble in the
frequency domain) and prach_detector_generic_impl.cpp (frequency-domain
correlation against the root replica via IDFT, peak search over cyclic-shift
windows with a noise-floor threshold).

TPU design: the detector correlates a received frequency-domain preamble
window against ALL 64 candidate preambles of the cell at once — the per-root
conj-multiply + IDFT is batched over roots, and the per-preamble peak search
is a windowed max over the delay axis.  Long (L=839) and short (L=139)
preambles, unrestricted + restricted set A cyclic-shift sets (the reference
gNB itself only generates unrestricted, prach_generator_impl.cpp:260).
"""

from __future__ import annotations

import dataclasses
import functools
import pathlib

import jax.numpy as jnp
import numpy as np

_DATA = pathlib.Path(__file__).resolve().parents[1] / "data" / "ldpc_graphs.npz"

L_LONG = 839
L_SHORT = 139


@functools.lru_cache(maxsize=None)
def _root_tables():
    d = np.load(_DATA)
    return {L_LONG: d["prach_root_long"], L_SHORT: d["prach_root_short"]}


def sequence_number(logical_index: int, l_ra: int = L_LONG) -> int:
    """Logical root sequence index -> physical u (Tables 6.3.3.1-3/-4)."""
    return int(_root_tables()[l_ra][logical_index % (l_ra - 1)])


@functools.lru_cache(maxsize=None)
def root_sequence(u: int, l_ra: int = L_LONG) -> np.ndarray:
    """x_u(n) = exp(-j pi u n (n+1) / L), host-precomputed complex64."""
    n = np.arange(l_ra, dtype=np.float64)
    return np.exp(-1j * np.pi * u * n * (n + 1) / l_ra).astype(np.complex64)


# TS 38.211 Table 6.3.3.1-5 (1.25 kHz preamble SCS): zeroCorrelationZone
# config -> N_cs, per restricted-set column (None = reserved).
NCS_125K = {
    None: (0, 13, 15, 18, 22, 26, 32, 38, 46, 59, 76, 93, 119, 167, 279, 419),
    "a": (15, 18, 22, 26, 32, 38, 46, 55, 68, 82, 100, 128, 158, 202, 237, None),
    "b": (15, 18, 22, 26, 32, 38, 46, 55, 68, 82, 100, 118, 137, None, None, None),
}


# TS 38.211 Table 6.3.3.1-6 (5 kHz preamble SCS, long format 3).
NCS_5K = {
    None: (0, 13, 26, 33, 38, 41, 49, 55, 64, 76, 93, 119, 139, 209, 279, 419),
    "a": (36, 57, 72, 81, 89, 94, 103, 112, 121, 132, 137, 152, 173, 195, 216,
          237),
    "b": (36, 57, 60, 63, 65, 68, 71, 77, 81, 85, 97, 109, 122, 137, None,
          None),
}


# TS 38.211 Table 6.3.3.1-7: short preambles (15 kHz x 2^mu SCS),
# unrestricted sets only.
NCS_SHORT = (0, 2, 4, 6, 8, 10, 12, 13, 15, 17, 19, 23, 27, 34, 46, 69)


def ncs_from_zcz(zcz_config: int, restricted: str | None = None,
                 scs_hz: int = 1250) -> int:
    """zeroCorrelationZoneConfig -> N_cs for long preambles (1.25 or 5 kHz)."""
    table = NCS_125K if scs_hz == 1250 else NCS_5K
    v = table[restricted][zcz_config]
    if v is None:
        raise ValueError(f"zcz {zcz_config} reserved for set {restricted}")
    return v


def ncs_from_zcz_short(zcz_config: int) -> int:
    """zeroCorrelationZoneConfig -> N_cs for short (L=139) preambles."""
    return NCS_SHORT[zcz_config]


def _cyclic_shift_distance(u: int, l_ra: int) -> int:
    """d_u (TS 38.211 §6.3.3.1): p = u^-1 mod L folded into [0, L/2]."""
    p = pow(u, -1, l_ra)
    return p if p < l_ra / 2 else l_ra - p


def restricted_cyclic_shifts(u: int, n_cs: int, l_ra: int = L_LONG
                             ) -> list[int]:
    """Allowed C_v values for root u under restricted set type A."""
    d_u = _cyclic_shift_distance(u, l_ra)
    if n_cs <= d_u < l_ra / 3:
        n_shift = d_u // n_cs
        d_start = 2 * d_u + n_shift * n_cs
        n_group = l_ra // d_start
        n_bar = max((l_ra - 2 * d_u - n_group * d_start) // n_cs, 0)
    elif l_ra / 3 <= d_u <= (l_ra - n_cs) / 2:
        n_shift = (l_ra - 2 * d_u) // n_cs
        d_start = l_ra - 2 * d_u + n_shift * n_cs
        n_group = d_u // d_start
        n_bar = min(max((d_u - n_group * d_start) // n_cs, 0), n_shift)
    else:
        return []
    if n_shift == 0:
        return []
    w = n_shift * n_group + n_bar
    return [d_start * (v // n_shift) + (v % n_shift) * n_cs for v in range(w)]


@dataclasses.dataclass(frozen=True)
class PrachConfig:
    """One cell's preamble space: 64 preambles from consecutive logical roots.

    Unrestricted: N_cs-spaced shifts, L/N_cs per root.  Restricted set A:
    Doppler-robust shift groups per §6.3.3.1 (variable count per root, walks
    logical roots until 64 preambles exist).
    """

    root_sequence_index: int
    zero_correlation_zone: int   # N_cs directly (0 => single shift per root)
    l_ra: int = L_LONG
    restricted: str | None = None  # None | 'a'

    @property
    def n_cs(self) -> int:
        return self.zero_correlation_zone

    @property
    def shifts_per_root(self) -> int:
        if self.n_cs == 0:
            return 1
        return self.l_ra // self.n_cs

    @functools.cached_property
    def preamble_table(self) -> tuple[tuple[int, int, int], ...]:
        """64 x (root_offset, u, C_v)."""
        out = []
        offset = 0
        while len(out) < 64:
            u = sequence_number(self.root_sequence_index + offset, self.l_ra)
            if self.restricted is None:
                shifts = ([0] if self.n_cs == 0 else
                          [v * self.n_cs for v in range(self.shifts_per_root)])
            elif self.restricted == "a":
                shifts = restricted_cyclic_shifts(u, self.n_cs, self.l_ra)
            else:
                raise ValueError(self.restricted)
            for cv in shifts:
                if len(out) < 64:
                    out.append((offset, u, cv))
            offset += 1
            assert offset < 838, "cannot build 64 preambles"
        return tuple(out)

    def preamble(self, index: int) -> tuple[int, int]:
        """Preamble index (0..63) -> (u, cyclic shift C_v)."""
        _, u, cv = self.preamble_table[index]
        return u, cv


def generate(cfg: PrachConfig, preamble_index: int) -> jnp.ndarray:
    """Frequency-domain preamble y_{u,v} = DFT(x_u cyclically shifted by C_v).

    Returns (L_RA,) complex64 — the sequence mapped to the PRACH subcarriers
    (prach_generator_impl.cpp produces the same frequency-domain output).
    """
    u, cv = cfg.preamble(preamble_index)
    x = np.roll(root_sequence(u, cfg.l_ra), -cv)
    return jnp.asarray(np.fft.fft(x).astype(np.complex64))


@dataclasses.dataclass(frozen=True)
class PrachOfdmInfo:
    """Time-domain layout of one PRACH occasion at a given sample rate.

    Counterpart of the reference's OFDM PRACH demodulator parameters
    (ofdm_prach_demodulator_impl.cpp): long format 0 uses 1.25 kHz preamble
    SCS, so at sample rate fs the preamble body spans fs/1250 samples.
    """

    l_ra: int
    dft_size: int       # fs / preamble_scs
    cp_samples: int
    freq_offset_bins: int  # first preamble bin within the PRACH DFT
    n_reps: int = 1     # preamble symbol repetitions after the single CP


# TS 38.211 Tables 6.3.3.1-1/-2, via the reference's
# prach_preamble_information.cpp:30-118: format -> (L_RA, preamble SCS at
# mu=0, symbol repetitions, CP length in kappa units = samples @30.72 Msps;
# short-format CP kappa values are the mu=0 column and scale as >> mu).
PRACH_FORMATS = {
    "0": (839, 1250, 1, 3168),
    "1": (839, 1250, 2, 21024),
    "2": (839, 1250, 4, 4688),
    "3": (839, 5000, 4, 3168),
    "A1": (139, 15000, 2, 288),
    "A2": (139, 15000, 4, 576),
    "A3": (139, 15000, 6, 864),
    "B1": (139, 15000, 2, 216),
    "B4": (139, 15000, 12, 936),
    "C0": (139, 15000, 1, 1240),
    "C2": (139, 15000, 4, 2048),
}


def prach_format_info(fmt: str, srate: int, mu: int = 0,
                      freq_offset_hz: float = 0.0) -> PrachOfdmInfo:
    """Time-domain occasion layout of any TS 38.211 preamble format."""
    l_ra, scs, n_reps, cp_kappa = PRACH_FORMATS[fmt]
    if l_ra == L_SHORT:
        scs <<= mu
        cp_kappa >>= mu
    assert srate % scs == 0, (srate, scs)
    return PrachOfdmInfo(
        l_ra=l_ra,
        dft_size=srate // scs,
        cp_samples=int(round(cp_kappa * srate / 30.72e6)),
        freq_offset_bins=int(round(freq_offset_hz / scs)),
        n_reps=n_reps,
    )


def prach_ofdm_info(srate: int, l_ra: int = L_LONG, cp_us: float = 103.0,
                    freq_offset_hz: float = 0.0) -> PrachOfdmInfo:
    """Format-0-style layout: preamble SCS 1.25 kHz (long) / 15 kHz (short)."""
    scs = 1250 if l_ra == L_LONG else 15000
    assert srate % scs == 0, (srate, scs)
    return PrachOfdmInfo(
        l_ra=l_ra,
        dft_size=srate // scs,
        cp_samples=int(round(srate * cp_us * 1e-6)),
        freq_offset_bins=int(round(freq_offset_hz / scs)),
    )


def ofdm_demodulate_prach(samples: jnp.ndarray,
                          info: PrachOfdmInfo) -> jnp.ndarray:
    """(..., cp + n_reps*dft) time samples -> frequency-domain preamble.

    CP strip + one DFT per symbol repetition at the preamble numerology +
    bin extraction — the whole occasion in one batched op (the reference
    loops symbol repetitions, ofdm_prach_demodulator_impl.cpp).  Returns
    (..., L_RA) for single-repetition formats (0, C0) and
    (..., n_reps, L_RA) for repeated formats (1/2/3, A*/B*/C2) — the
    repetitions are phase-continuous copies of the same symbol, so detection
    coherently combines them (prach_detector_generic_impl.cpp:240-251).
    """
    body = samples[..., info.cp_samples:
                   info.cp_samples + info.n_reps * info.dft_size]
    if info.n_reps > 1:
        body = body.reshape(*body.shape[:-1], info.n_reps, info.dft_size)
    # Route through the slot-transform dispatcher: on accelerator backends
    # the occasion-sized DFT (e.g. 18432 = fs/1.25 kHz) runs as the MXU
    # matmul-DFT two-step instead of an XLA FFT (ops.ofdm._use_mmdft).
    from . import ofdm as _ofdm
    fd = _ofdm._slot_fft(body)
    k = (info.freq_offset_bins + np.arange(info.l_ra)) % info.dft_size
    # Unitary pair with ofdm_modulate_prach: 1/sqrt(dft) each way.
    return fd[..., jnp.asarray(k)].astype(jnp.complex64) \
        * np.float32(1.0 / np.sqrt(info.dft_size))


def ofdm_modulate_prach(preamble_freq: jnp.ndarray,
                        info: PrachOfdmInfo) -> jnp.ndarray:
    """(..., L_RA) frequency preamble -> (..., cp + n_reps*dft) samples.

    One CP (cyclic tail of the symbol) followed by n_reps contiguous
    repetitions of the same symbol (TS 38.211 Table 6.3.3.1-1/-2 layout —
    back-to-back repetitions of a periodic signal stay phase-continuous).
    """
    x = jnp.zeros((*preamble_freq.shape[:-1], info.dft_size), jnp.complex64)
    k = (info.freq_offset_bins + np.arange(info.l_ra)) % info.dft_size
    x = x.at[..., jnp.asarray(k)].set(preamble_freq.astype(jnp.complex64))
    td = jnp.fft.ifft(x, axis=-1).astype(jnp.complex64) \
        * np.float32(np.sqrt(info.dft_size))
    cp = td[..., info.dft_size - info.cp_samples:]
    return jnp.concatenate([cp] + [td] * info.n_reps, axis=-1)


@dataclasses.dataclass
class PrachDetection:
    metrics: jnp.ndarray       # (64,) peak-to-noise metric per preamble
    delays: jnp.ndarray        # (64,) peak delay (samples in L_RA domain)
    detected: jnp.ndarray      # (64,) bool, metric above threshold


def detect(rx_freq: jnp.ndarray, cfg: PrachConfig,
           threshold: float = 20.0) -> PrachDetection:
    """Detect preambles from the (L_RA,) frequency-domain PRACH window.

    corr_u(t) = IDFT(rx * conj(DFT(x_u))): a peak at delay t for a preamble
    transmitted with shift C_v appears at t = C_v + propagation delay, so each
    preamble's metric is the windowed max over its own N_cs zone, normalised
    by the overall mean power (noise floor).

    A (n_reps, L_RA) input (multi-repetition formats from
    ofdm_demodulate_prach) is coherently averaged over the repetition axis
    first — the reference's combine_symbols accumulation
    (prach_detector_generic_impl.cpp:240-251).
    """
    if rx_freq.ndim == 2:
        rx_freq = jnp.mean(rx_freq, axis=0)
    l_ra = cfg.l_ra
    table = cfg.preamble_table
    offsets = sorted({off for off, _, _ in table})
    row_of = {off: i for i, off in enumerate(offsets)}
    roots = np.stack([root_sequence(sequence_number(cfg.root_sequence_index + off,
                                                    l_ra), l_ra)
                      for off in offsets])
    root_f = jnp.asarray(np.fft.fft(roots, axis=-1).astype(np.complex64))

    corr_f = rx_freq[None, :] * jnp.conj(root_f)          # (nroots, L)
    corr_t = jnp.fft.ifft(corr_f, axis=-1)
    power = jnp.abs(corr_t) ** 2                          # (nroots, L)
    floor = jnp.mean(power) + 1e-30

    ncs = cfg.n_cs if cfg.n_cs else l_ra
    win = min(ncs, l_ra)
    # x_{u,v}(n) = x_u((n + C_v) mod L) puts the zero-delay peak at
    # (L - C_v) mod L; each preamble's zone starts there and spans N_cs.
    power2 = jnp.concatenate([power, power], axis=-1)     # easy wrap-around
    metrics, delays = [], []
    for (off, _, cv) in table:
        start = (l_ra - cv) % l_ra
        zone = power2[row_of[off], start:start + win]
        metrics.append(jnp.max(zone) / floor)
        delays.append(jnp.argmax(zone))
    metrics = jnp.stack(metrics)
    delays = jnp.stack(delays)
    return PrachDetection(metrics=metrics, delays=delays,
                          detected=metrics > threshold)
