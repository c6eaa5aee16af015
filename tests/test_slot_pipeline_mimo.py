"""Multi-layer (2x2 / 4x4) MIMO in the fused slot pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

S = 3


def make_cell(n_layers, **kw):
    base = dict(nof_prb=52, nfft=768, nof_ue=2, prb_per_ue=12,
                modulation="qam16", target_rate=0.45, n_layers=n_layers)
    base.update(kw)
    return sp.CellConfig(**base)


def mixing_matrix(p, l, rng, selective=False):
    """Well-conditioned complex mixing (the spatial channel)."""
    a = (rng.normal(size=(p, l)) + 1j * rng.normal(size=(p, l))) / np.sqrt(2)
    # Push it toward well-conditioned: blend with a unitary DFT.
    f = np.exp(-2j * np.pi * np.outer(np.arange(p), np.arange(l)) / max(p, l))
    return (0.35 * a + f / np.sqrt(l)).astype(np.complex64)


def run_loopback(n_layers, snr_db, seed, delays=None):
    cell = make_cell(n_layers)
    t = cell.timing
    rng = np.random.default_rng(seed)
    tbs = cell.derived_tbs()
    rntis = jnp.asarray(0x4601 + np.arange(cell.nof_ue), dtype=np.uint32)
    payloads = jnp.asarray(rng.integers(0, 2, (S, cell.nof_ue, tbs),
                                        dtype=np.int8))

    td = jax.jit(lambda p: sp.dl_slot_batch_mimo(p, rntis, cell))(payloads)
    assert td.shape == (S, n_layers, t.cp.total)

    # Spatial channel: rx_p = sum_l A[p,l] * (optionally delayed) tx_l.
    a = mixing_matrix(n_layers, n_layers, rng)
    x = np.asarray(td)
    if delays is not None:   # per-layer integer delays -> freq-selective
        x = np.stack([np.roll(x[:, l], delays[l], axis=-1)
                      for l in range(n_layers)], axis=1)
    rx = np.einsum("pl,slt->spt", a, x)
    nv = float((np.abs(rx) ** 2).mean()) * 10 ** (-snr_db / 10)
    noise = rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape)
    rx = jnp.asarray((rx + noise * np.sqrt(nv / 2)).astype(np.complex64))

    out = jax.jit(lambda r: sp.ul_slot_batch_mimo(r, rntis, cell))(rx)
    return payloads, out


def test_mimo_2x2_loopback():
    payloads, (hat, ok, nv, cfo, soft) = run_loopback(2, snr_db=25.0, seed=3)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hat), np.asarray(payloads))
    # 2-layer TBS roughly doubles the SISO TBS.
    c1 = make_cell(1)
    c2 = make_cell(2)
    assert c2.derived_tbs() > 1.8 * c1.derived_tbs()


def test_mimo_4x4_loopback():
    payloads, (hat, ok, *_ ) = run_loopback(4, snr_db=30.0, seed=5)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hat), np.asarray(payloads))


def test_mimo_2x2_frequency_selective():
    """Per-layer delays make the spatial channel frequency-selective; the
    per-(antenna, port) OCC estimates track it within the CP."""
    payloads, (hat, ok, *_ ) = run_loopback(2, snr_db=25.0, seed=7,
                                            delays=[0, 5])
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hat), np.asarray(payloads))


def test_mimo_mesh_sharded():
    """The MIMO decode back-end shards over the (ue, cb) mesh."""
    from srsran_edgeric_5g_tpu.parallel import make_mesh
    devices = jax.devices()
    if len(devices) < 2:
        import pytest
        pytest.skip("needs multi-device mesh")
    n_cb = 2 if len(devices) >= 4 else 1
    mesh = make_mesh(n_ue=2, n_cb=n_cb, devices=devices[:2 * n_cb])
    cell = make_cell(2)
    t = cell.timing
    rng = np.random.default_rng(11)
    tbs = cell.derived_tbs()
    rntis = jnp.asarray(0x4601 + np.arange(cell.nof_ue), dtype=np.uint32)
    payloads = jnp.asarray(rng.integers(0, 2, (S, cell.nof_ue, tbs),
                                        dtype=np.int8))

    a = jnp.asarray(mixing_matrix(2, 2, rng))

    @jax.jit
    def step(p, key):
        td = sp.dl_slot_batch_mimo(p, rntis, cell, mesh=mesh)
        rx = jnp.einsum("pl,slt->spt", a, td)
        n = jax.random.normal(key, rx.shape + (2,), jnp.float32) * 0.002
        rx = rx + jax.lax.complex(n[..., 0], n[..., 1])
        return sp.ul_slot_batch_mimo(rx, rntis, cell, mesh=mesh)

    hat, ok, *_ = step(payloads, jax.random.key(0))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hat), np.asarray(payloads))
