"""Time-block sharding of the IQ sample stream with overlap-save halos.

SURVEY.md §2.4/§5: the sample-stream time dimension is this framework's
sequence-parallel analogue.  A long stream (many slots) is sharded over the
mesh's 'time' axis; demodulating with a receive **timing shift** (the DFT
windows open ``shift`` samples before each symbol's nominal start — timing
advance / early-window reception, generalising the reference's
nof_samples_window_offset, ofdm_demodulator_impl.cpp:60-76) makes the first
windows of every shard reach into the PREVIOUS shard's samples.  The
``shift``-sample halo is exchanged with `jax.lax.ppermute` over ICI
(neighbor exchange, ring-attention style); each shard then demodulates all
its slots locally.

The matching sharded modulator is a pure map (slots are self-contained).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import ofdm
from ..ran.numerology import SlotTiming

TIME_AXIS = "time"


def make_time_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TIME_AXIS,))


def modulate_stream_sharded(grids: jnp.ndarray, timing: SlotTiming,
                            mesh: Mesh, scale: float = 1.0) -> jnp.ndarray:
    """(S, nsymb, nsubc) grids, S sharded over 'time' -> (S, total) samples."""
    spec = P(TIME_AXIS)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec)
    def body(local_grids):
        return ofdm.modulate_slot(local_grids, timing, scale=scale)

    return body(grids)


def _demod_shifted(padded_stream: jnp.ndarray, timing: SlotTiming,
                   s_local: int, shift: int,
                   scale: float | None) -> jnp.ndarray:
    """Demodulate ``s_local`` slots from (shift + s_local*total) samples.

    ``padded_stream[k]`` is stream sample ``k - shift`` of this shard, so the
    window of symbol l in slot s (opening ``shift`` early) reads
    ``padded_stream[s*total + data_start_l : ... + nfft]`` — always in range.
    The early window is corrected by the standard per-bin phase ramp.
    """
    nfft, nsubc = timing.nfft, timing.nof_subc
    total = timing.cp.total
    starts = np.asarray(timing.cp.data_starts)
    idx = (np.arange(s_local)[:, None, None] * total
           + starts[None, :, None] + np.arange(nfft)[None, None, :])
    seg = padded_stream[jnp.asarray(idx)]          # (S, nsymb, nfft)
    fd = jnp.fft.fft(seg, axis=-1).astype(jnp.complex64)
    sc = 1.0 / nfft if scale is None else scale
    coef = ofdm.phase_compensation(timing, 0.0, is_tx=False)
    fd = fd * jnp.asarray(coef * np.complex64(sc))[:, None]
    if shift:
        omega = 2.0 * np.pi * shift / nfft
        ramp = np.exp(1j * omega * np.arange(nfft)).astype(np.complex64)
        fd = fd * jnp.asarray(ramp)
    bins = ofdm._subcarrier_bins(nsubc, nfft)
    return fd[..., jnp.asarray(bins)]


def demodulate_stream_sharded(samples: jnp.ndarray, timing: SlotTiming,
                              mesh: Mesh, shift: int = 0,
                              scale: float | None = None) -> jnp.ndarray:
    """(S, total) slot samples sharded over 'time' -> (S, nsymb, nsubc).

    ``shift``: open every DFT window ``shift`` samples early (bounded by the
    shortest CP).  The first slot of each shard then needs the last ``shift``
    samples of the previous shard — exchanged via ppermute; shard 0 pads
    zeros (cold start).
    """
    assert 0 <= shift <= min(timing.cp.cp), (shift, timing.cp.cp)
    spec = P(TIME_AXIS)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec)
    def body(local):  # (S_local, total)
        s_local = local.shape[0]
        flat = local.reshape(-1)
        if shift:
            idx = jax.lax.axis_index(TIME_AXIS)
            n = jax.lax.axis_size(TIME_AXIS)
            tail = flat[-shift:]
            halo = jax.lax.ppermute(tail, TIME_AXIS,
                                    perm=[(i, (i + 1) % n) for i in range(n)])
            halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        else:
            halo = jnp.zeros((0,), flat.dtype)
        padded = jnp.concatenate([halo, flat])
        return _demod_shifted(padded, timing, s_local, shift, scale)

    return body(samples)
