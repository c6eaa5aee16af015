import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.models import pdcch, ssb


@pytest.mark.parametrize("al", [1, 2, 4, 8])
def test_pdcch_roundtrip(al):
    cfg = pdcch.PdcchConfig(rnti=0x4601, n_id=31, aggregation_level=al,
                            cce_index=0, payload_bits=40)
    rng = np.random.default_rng(al)
    payload = jnp.asarray(rng.integers(0, 2, (1, 40), dtype=np.int8))
    grid = pdcch.process(payload, cfg, nsymb=14, nsubc=624)
    out, ok = pdcch.blind_decode(grid, cfg)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))


def test_pdcch_wrong_rnti_fails_crc():
    cfg = pdcch.PdcchConfig(rnti=0x4601, n_id=31, aggregation_level=4,
                            cce_index=0)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, (1, 40), dtype=np.int8))
    grid = pdcch.process(payload, cfg, nsymb=14, nsubc=624)
    other = pdcch.PdcchConfig(rnti=0x1234, n_id=31, aggregation_level=4,
                              cce_index=0)
    _, ok = pdcch.blind_decode(grid, other)
    assert not np.asarray(ok).any()


def test_pdcch_awgn():
    cfg = pdcch.PdcchConfig(rnti=0x17, n_id=5, aggregation_level=8,
                            cce_index=0, payload_bits=39)
    rng = np.random.default_rng(3)
    payload = jnp.asarray(rng.integers(0, 2, (1, 39), dtype=np.int8))
    grid = np.asarray(pdcch.process(payload, cfg, nsymb=14, nsubc=624))
    mask = np.abs(grid) > 0
    noise = (rng.normal(size=grid.shape) + 1j * rng.normal(size=grid.shape)) * 0.15
    rx = jnp.asarray((grid + noise * mask).astype(np.complex64))
    out, ok = pdcch.blind_decode(rx, cfg)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))


def test_pdcch_multi_dci():
    """process_multi == sum of per-DCI grids; every DCI blind-decodes."""
    cfgs = [pdcch.PdcchConfig(rnti=0x4601 + i, n_id=7, aggregation_level=2,
                              cce_index=2 * i, payload_bits=40)
            for i in range(4)]
    rng = np.random.default_rng(9)
    payloads = jnp.asarray(rng.integers(0, 2, (4, 40), dtype=np.int8))
    grid = pdcch.process_multi(payloads, cfgs, nsymb=14, nsubc=624)
    composed = sum(pdcch.process(payloads[i:i + 1], cfgs[i], 14, 624)
                   for i in range(4))
    np.testing.assert_allclose(np.asarray(grid), np.asarray(composed),
                               atol=1e-6)
    for i, cfg in enumerate(cfgs):
        out, ok = pdcch.blind_decode(grid, cfg)
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(payloads[i:i + 1]))


def test_pdcch_multi_dci_interleaved():
    """Batched DCIs through an interleaved CORESET still round-trip."""
    cfgs = [pdcch.PdcchConfig(rnti=0x100 + i, n_id=3, aggregation_level=2,
                              cce_index=2 * i, coreset_nof_prb=48,
                              interleaved=True, interleaver_rows=2,
                              shift_index=5)
            for i in range(3)]
    rng = np.random.default_rng(10)
    payloads = jnp.asarray(rng.integers(0, 2, (3, 40), dtype=np.int8))
    grid = pdcch.process_multi(payloads, cfgs, nsymb=14, nsubc=624)
    for i, cfg in enumerate(cfgs):
        out, ok = pdcch.blind_decode(grid, cfg)
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(payloads[i:i + 1]))


def test_ssb_structure():
    cfg = ssb.SsbConfig(pci=123)
    rng = np.random.default_rng(1)
    mib = jnp.asarray(rng.integers(0, 2, (1, 24), dtype=np.int8))
    grid = np.asarray(ssb.process(mib, cfg, nsymb=14, nsubc=240))
    # PSS on symbol 0 subcarriers 56..182, SSS on symbol 2.
    assert (np.abs(grid[0, 56:183]) > 0.9).all()
    assert (np.abs(grid[0, :56]) == 0).all()
    assert (np.abs(grid[2, 56:183]) > 0.9).all()
    # PBCH fills symbols 1 and 3 fully.
    assert (np.abs(grid[1, :]) > 0.5).all()
    assert (np.abs(grid[3, :]) > 0.5).all()
    # 432 data + 144 DM-RS REs.
    _, data_pos, dmrs_pos = ssb._pbch_positions(cfg)
    assert len(data_pos) == 432 and len(dmrs_pos) == 144


def test_pbch_roundtrip():
    cfg = ssb.SsbConfig(pci=77, ssb_index=3)
    rng = np.random.default_rng(2)
    mib = jnp.asarray(rng.integers(0, 2, (1, 24), dtype=np.int8))
    grid = ssb.process(mib, cfg, nsymb=14, nsubc=240)
    out, ok = ssb.decode(grid, cfg)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mib))


def test_pbch_awgn():
    cfg = ssb.SsbConfig(pci=101)
    rng = np.random.default_rng(5)
    mib = jnp.asarray(rng.integers(0, 2, (1, 24), dtype=np.int8))
    grid = np.asarray(ssb.process(mib, cfg, nsymb=14, nsubc=240))
    noise = (rng.normal(size=grid.shape) + 1j * rng.normal(size=grid.shape)) * 0.25
    rx = jnp.asarray((grid + noise * (np.abs(grid) > 0)).astype(np.complex64))
    out, ok = ssb.decode(rx, cfg)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mib))


def test_interleaved_coreset_mapping():
    """Interleaved CCE->REG bundles: a permutation; roundtrip still decodes."""
    base = dict(rnti=0x4601, n_id=31, aggregation_level=4, cce_index=0,
                coreset_nof_prb=48, interleaved=True, interleaver_rows=2)
    cfg = pdcch.PdcchConfig(**base)
    n_bundles = 48 // 6
    mapped = [pdcch.cce_to_bundle(cfg, c) for c in range(n_bundles)]
    assert sorted(mapped) == list(range(n_bundles))  # permutation
    assert mapped != list(range(n_bundles))          # actually interleaved

    rng = np.random.default_rng(4)
    payload = jnp.asarray(rng.integers(0, 2, (1, 40), dtype=np.int8))
    grid = pdcch.process(payload, cfg, nsymb=14, nsubc=624)
    out, ok = pdcch.blind_decode(grid, cfg)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))

    # A different shift index lands on different subcarriers.
    cfg2 = pdcch.PdcchConfig(**{**base, "shift_index": 3})
    d1, _ = pdcch._re_positions(cfg)
    d2, _ = pdcch._re_positions(cfg2)
    assert not np.array_equal(d1, d2)
