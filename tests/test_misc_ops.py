import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import (
    amplitude, evm, low_papr, modulation, precoding, sync_signals,
)


# ---------- precoding ----------

def test_identity_precoding_power():
    w = precoding.identity_precoding(2, 2)
    rng = np.random.default_rng(0)
    layers = (rng.normal(size=(2, 100)) + 1j * rng.normal(size=(2, 100))
              ).astype(np.complex64)
    out = np.asarray(precoding.apply_precoding(jnp.asarray(layers), jnp.asarray(w)))
    np.testing.assert_allclose(out, layers / np.sqrt(2), atol=1e-6)


def test_transform_precode_roundtrip_and_unitary():
    rng = np.random.default_rng(1)
    m_sc = 48  # 12*4
    x = (rng.normal(size=(3, 2 * m_sc)) + 1j * rng.normal(size=(3, 2 * m_sc))
         ).astype(np.complex64)
    y = precoding.transform_precode(jnp.asarray(x), m_sc)
    # Unitary: power preserved.
    np.testing.assert_allclose(np.sum(np.abs(np.asarray(y))**2),
                               np.sum(np.abs(x)**2), rtol=1e-5)
    back = precoding.transform_deprecode(y, m_sc)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_dftsofdm_valid_sizes():
    assert precoding.is_valid_dftsofdm_size(12)
    assert precoding.is_valid_dftsofdm_size(1296)  # 12*108=12*4*27
    assert not precoding.is_valid_dftsofdm_size(84)  # 12*7
    assert not precoding.is_valid_dftsofdm_size(13)


# ---------- low-PAPR sequences ----------

@pytest.mark.parametrize("m_zc", [6, 12, 36, 48, 144])
def test_low_papr_unit_modulus(m_zc):
    r = np.asarray(low_papr.low_papr_sequence(u=7, v=0, alpha=0.0, m_zc=m_zc))
    assert r.shape == (m_zc,)
    np.testing.assert_allclose(np.abs(r), 1.0, atol=1e-6)


def test_low_papr_low_autocorrelation():
    """ZC sequences: cyclic autocorrelation is ~0 at nonzero lags."""
    r = np.asarray(low_papr.low_papr_sequence(u=0, v=0, alpha=0.0, m_zc=139 - 0))
    # use a 3-PRB sequence
    r = np.asarray(low_papr.low_papr_sequence(u=0, v=0, alpha=0.0, m_zc=36))
    ac = np.fft.ifft(np.abs(np.fft.fft(r)) ** 2)
    peak = np.abs(ac[0])
    sidelobes = np.abs(ac[1:])
    assert (sidelobes < 0.35 * peak).all()


def test_low_papr_cyclic_shift():
    base = np.asarray(low_papr.low_papr_sequence(0, 0, 0.0, 36))
    shifted = np.asarray(low_papr.low_papr_sequence(0, 0, np.pi / 6, 36))
    n = np.arange(36)
    np.testing.assert_allclose(shifted, base * np.exp(1j * np.pi / 6 * n), atol=1e-5)


def test_phi_tables_match_reference_spec_data():
    """Cross-check the packed phi tables against the values in the reference's
    copy of TS 38.211 Tables 5.2.2.2-1/-2 (spec constants)."""
    t6 = low_papr._phi_tables()[6]
    assert t6.shape == (30, 6)
    np.testing.assert_array_equal(t6[0], [-3, -1, 3, 3, -1, -3])
    t12 = low_papr._phi_tables()[12]
    np.testing.assert_array_equal(t12[11], [-3, -1, -3, -1, -1, -3, 3, 3, -1, -1, 1, -3])


# ---------- sync signals ----------

def test_pss_bpsk_and_distinct():
    seqs = [sync_signals.pss_sequence(i) for i in range(3)]
    for s in seqs:
        assert set(np.unique(s)) <= {-1.0, 1.0}
    # Cross-correlation between different N_ID2 is low; auto is 127.
    for i in range(3):
        for j in range(3):
            c = abs(np.dot(seqs[i], seqs[j]))
            if i == j:
                assert c == 127
            else:
                assert c < 30


def test_sss_distinguishes_cells():
    a = sync_signals.sss_sequence(0, 0)
    b = sync_signals.sss_sequence(5, 1)
    assert set(np.unique(a)) <= {-1.0, 1.0}
    assert abs(np.dot(a, b)) < 40


def test_pss_correlate_finds_nid2():
    grid = jnp.zeros((4, 240), jnp.complex64)
    grid = sync_signals.map_ssb_sync(grid, pci=7)  # N_ID2 = 1
    rx = grid[0, 56:183]
    mags = np.asarray(sync_signals.pss_correlate(rx))
    assert mags.argmax() == 1
    assert mags[1] == pytest.approx(127.0, rel=1e-5)


# ---------- amplitude / evm ----------

def test_amplitude_clip():
    x = jnp.asarray(np.array([0.1 + 0j, 1.0 + 0j, 0.0 + 2.0j], np.complex64))
    y, m = amplitude.clip(x, gain=1.0, ceiling=1.0)
    np.testing.assert_allclose(np.abs(np.asarray(y)), [0.1, 1.0, 1.0], atol=1e-6)
    assert float(m.clipped_ratio) == pytest.approx(1 / 3)
    # Phase preserved on the clipped sample.
    assert np.angle(np.asarray(y)[2]) == pytest.approx(np.pi / 2)


def test_evm_zero_for_clean_symbols():
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, 600, dtype=np.int8))
    syms = modulation.modulate(bits, "qam64")
    llrs = modulation.demodulate_soft(syms, jnp.float32(0.01), "qam64")
    e = evm.evm(syms, llrs, "qam64")
    assert float(e) < 1e-6
    assert float(evm.sinr_from_evm(jnp.float32(0.1))) == pytest.approx(20.0)


class TestOfhCompression:
    """O-RAN fronthaul BFP IQ compression (ops/ofh_compression; reference:
    lib/ofh/compression/iq_compression_bfp_impl.cpp).  Cross-validated
    bit-exactly against the reference in test_reference_parity; these are
    the standalone property tests."""

    def test_bfp_roundtrip_snr(self):
        import jax.numpy as jnp
        import numpy as np
        from srsran_edgeric_5g_tpu.ops import ofh_compression as ofh
        rng = np.random.default_rng(3)
        iq = (rng.uniform(-0.7, 0.7, (4, 48 * 12))
              + 1j * rng.uniform(-0.7, 0.7, (4, 48 * 12))).astype(np.complex64)
        mant, exp = ofh.bfp_compress(jnp.asarray(iq), data_width=9)
        out = np.asarray(ofh.bfp_decompress(mant, exp))
        err = np.mean(np.abs(out - iq) ** 2)
        sig = np.mean(np.abs(iq) ** 2)
        snr_db = 10 * np.log10(sig / err)
        # 9-bit BFP keeps > 45 dB on near-full-scale uniform IQ.
        assert snr_db > 45, snr_db
        # Mantissas fit the 9-bit signed range.
        m = np.asarray(mant)
        assert m.max() <= 255 and m.min() >= -256

    def test_bfp_exponent_zero_for_small(self):
        import jax.numpy as jnp
        import numpy as np
        from srsran_edgeric_5g_tpu.ops import ofh_compression as ofh
        iq = np.full((1, 12), 1e-4 + 1e-4j, np.complex64)
        _, exp = ofh.bfp_compress(jnp.asarray(iq), data_width=9)
        assert int(np.asarray(exp)[0, 0]) == 0

    def test_pack_unpack_inverse(self):
        import numpy as np
        from srsran_edgeric_5g_tpu.ops import ofh_compression as ofh
        rng = np.random.default_rng(11)
        for width in (7, 9, 12, 14, 16):
            lo, hi = -(1 << (width - 1)), (1 << (width - 1)) - 1
            mant = rng.integers(lo, hi + 1, (6, 24)).astype(np.int16)
            packed = ofh.pack_prbs(mant, width)
            assert packed.shape == (6, (24 * width + 7) // 8)
            np.testing.assert_array_equal(ofh.unpack_prbs(packed, width), mant)

    def test_none_compression_roundtrip(self):
        import jax.numpy as jnp
        import numpy as np
        from srsran_edgeric_5g_tpu.ops import ofh_compression as ofh
        rng = np.random.default_rng(7)
        iq = (rng.uniform(-0.9, 0.9, (2, 24)) * (1 + 0j)).astype(np.complex64)
        s = ofh.compress_none(jnp.asarray(iq), data_width=16)
        out = np.asarray(ofh.decompress_none(s, data_width=16))
        np.testing.assert_allclose(out, iq, atol=1e-4)


def test_ofh_uplane_slot_roundtrip():
    """frame_dl_slot -> wire frames -> deframe_dl_slot recovers the grid to
    BFP-9 accuracy (one eCPRI message per symbol)."""
    import numpy as np
    from srsran_edgeric_5g_tpu.runtime import ofh as ofh_rt
    rng = np.random.default_rng(4)
    grid = (rng.uniform(-0.7, 0.7, (14, 52 * 12))
            + 1j * rng.uniform(-0.7, 0.7, (14, 52 * 12))).astype(np.complex64)
    frames = ofh_rt.frame_dl_slot(grid, pc_id=3, sfn=17, subframe=4, slot=0)
    assert len(frames) == 14
    out = ofh_rt.deframe_dl_slot(frames)
    err = np.mean(np.abs(out - grid) ** 2) / np.mean(np.abs(grid) ** 2)
    assert 10 * np.log10(1 / err) > 45
