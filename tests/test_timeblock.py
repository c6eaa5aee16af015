"""Time-block sharded stream processing with ppermute halo exchange."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import ofdm
from srsran_edgeric_5g_tpu.parallel import timeblock
from srsran_edgeric_5g_tpu.ran import numerology as num


def _grids(rng, t, s):
    shape = (s, t.nsymb, t.nof_subc)
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)


def test_sharded_modulate_matches_local():
    t = num.slot_timing(**num.CELL_10MHZ)
    mesh = timeblock.make_time_mesh(8)
    rng = np.random.default_rng(0)
    grids = jnp.asarray(_grids(rng, t, 16))
    td_sharded = jax.jit(lambda g: timeblock.modulate_stream_sharded(g, t, mesh))(grids)
    td_local = ofdm.modulate_slot(grids, t)
    np.testing.assert_allclose(np.asarray(td_sharded), np.asarray(td_local),
                               atol=1e-4)


def test_sharded_demodulate_no_shift_roundtrip():
    t = num.slot_timing(**num.CELL_10MHZ)
    mesh = timeblock.make_time_mesh(8)
    rng = np.random.default_rng(1)
    grids = jnp.asarray(_grids(rng, t, 8))
    td = ofdm.modulate_slot(grids, t)
    back = jax.jit(lambda x: timeblock.demodulate_stream_sharded(x, t, mesh))(td)
    np.testing.assert_allclose(np.asarray(back), np.asarray(grids), atol=2e-4)


def test_sharded_demodulate_with_halo_shift():
    """shift>0: windows reach into the previous shard's samples — the halo
    exchange must reproduce the unsharded result exactly (slots 1..S-1)."""
    t = num.slot_timing(**num.CELL_10MHZ)
    mesh = timeblock.make_time_mesh(8)
    rng = np.random.default_rng(2)
    s = 16  # 2 slots per device
    grids = jnp.asarray(_grids(rng, t, s))
    td = ofdm.modulate_slot(grids, t)
    shift = 16
    back = jax.jit(lambda x: timeblock.demodulate_stream_sharded(
        x, t, mesh, shift=shift))(td)
    # A 'shift' early window inside the CP is transparent after the phase
    # ramp for every slot whose halo samples exist (all but stream slot 0,
    # which gets a zero halo only for its FIRST symbol window).
    np.testing.assert_allclose(np.asarray(back)[1:], np.asarray(grids)[1:],
                               atol=3e-4)
    # Symbols 1.. of slot 0 are still clean.
    np.testing.assert_allclose(np.asarray(back)[0, 1:], np.asarray(grids)[0, 1:],
                               atol=3e-4)


def test_halo_actually_crosses_shards():
    """With the halo exchange disabled (shift=0 on pre-shifted data) results
    at shard boundaries would be wrong — verify the boundary slot differs
    between shift and no-shift paths, proving the halo matters."""
    t = num.slot_timing(**num.CELL_10MHZ)
    mesh = timeblock.make_time_mesh(8)
    rng = np.random.default_rng(3)
    s = 8  # 1 slot per device -> every slot boundary is a shard boundary
    grids = jnp.asarray(_grids(rng, t, s))
    td = ofdm.modulate_slot(grids, t)
    shift = 16
    with_halo = np.asarray(jax.jit(lambda x: timeblock.demodulate_stream_sharded(
        x, t, mesh, shift=shift))(td))
    np.testing.assert_allclose(with_halo[1:], np.asarray(grids)[1:], atol=3e-4)
