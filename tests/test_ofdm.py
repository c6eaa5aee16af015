import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import ofdm
from srsran_edgeric_5g_tpu.ran import numerology as num


def random_grid(rng, timing, lead=()):
    shape = (*lead, timing.nsymb, timing.nof_subc)
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)


@pytest.mark.parametrize("cell", [num.CELL_10MHZ, num.CELL_20MHZ])
def test_roundtrip(cell):
    t = num.slot_timing(**cell)
    rng = np.random.default_rng(1)
    grid = random_grid(rng, t, lead=(2,))
    td = ofdm.modulate_slot(jnp.asarray(grid), t)
    assert td.shape == (2, t.cp.total)
    back = ofdm.demodulate_slot(td, t)
    np.testing.assert_allclose(np.asarray(back), grid, atol=2e-4)


def test_cp_is_tail_copy():
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(2)
    td = np.asarray(ofdm.modulate_slot(jnp.asarray(random_grid(rng, t)), t))
    for l in range(t.nsymb):
        s, d = t.cp.starts[l], t.cp.data_starts[l]
        cp_len = t.cp.cp[l]
        sym = td[d:d + t.nfft]
        np.testing.assert_allclose(td[s:d], sym[-cp_len:], rtol=1e-6)


def test_against_numpy_oracle():
    """Single-symbol check vs direct per-subcarrier DFT sum."""
    t = num.slot_timing(nof_prb=8, nfft=128, mu=0)
    rng = np.random.default_rng(3)
    grid = random_grid(rng, t)
    td = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), t))
    # Symbol 1 useful part: x[n] = sum_k X_k exp(j2pi (k-K/2) n / N)
    l = 1
    n = np.arange(t.nfft)
    k = np.arange(t.nof_subc)
    expo = np.exp(2j * np.pi * np.outer(n, (k - t.nof_subc // 2)) / t.nfft)
    want = expo @ grid[l]
    got = td[t.cp.data_starts[l]: t.cp.data_starts[l] + t.nfft]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_phase_compensation_applied():
    t = num.slot_timing(**num.CELL_10MHZ)
    fc = 1.8425e9  # band-3 style carrier
    rng = np.random.default_rng(4)
    grid = random_grid(rng, t)
    td0 = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), t, center_freq_hz=0.0))
    td1 = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), t, center_freq_hz=fc))
    coef = ofdm.phase_compensation(t, fc, is_tx=True)
    l = 5
    s, e = t.cp.starts[l], t.cp.starts[l] + t.cp.cp[l] + t.nfft
    np.testing.assert_allclose(td1[s:e], td0[s:e] * coef[l], rtol=1e-4)
    # And the demodulator undoes it.
    back = np.asarray(ofdm.demodulate_slot(jnp.asarray(td1), t, center_freq_hz=fc))
    np.testing.assert_allclose(back, grid, atol=2e-4)


def test_window_offset_roundtrip():
    t = num.slot_timing(**num.CELL_10MHZ)
    rng = np.random.default_rng(5)
    grid = random_grid(rng, t)
    td = ofdm.modulate_slot(jnp.asarray(grid), t)
    back = np.asarray(ofdm.demodulate_slot(td, t, window_offset=8))
    # A pure delay inside the CP is transparent after the phase-ramp fix.
    np.testing.assert_allclose(back, grid, atol=3e-4)


def test_scale():
    t = num.slot_timing(nof_prb=8, nfft=128, mu=0)
    rng = np.random.default_rng(6)
    grid = random_grid(rng, t)
    a = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), t, scale=0.25))
    b = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), t, scale=1.0))
    np.testing.assert_allclose(a, 0.25 * b, rtol=1e-6)


def test_mmdft_matches_fft():
    """The matmul-DFT two-step equals jnp.fft exactly at 'highest' precision
    and to bf16 accuracy at 'default', both directions, 1536 and 1024."""
    import numpy as np
    import jax.numpy as jnp
    from srsran_edgeric_5g_tpu.ops import ofdm

    rng = np.random.default_rng(5)
    for nfft in (1536, 1024):
        x = (rng.normal(size=(6, nfft)) + 1j * rng.normal(size=(6, nfft))
             ).astype(np.complex64)
        ref_f = np.fft.fft(x, axis=-1)
        ref_i = np.fft.ifft(x, axis=-1) * nfft
        try:
            ofdm.set_fft_impl("mmdft", "highest")
            f = np.asarray(ofdm._mmdft(jnp.asarray(x), -1))
            i = np.asarray(ofdm._mmdft(jnp.asarray(x), +1))
            scale = np.abs(ref_f).max()
            np.testing.assert_allclose(f, ref_f, atol=2e-4 * scale)
            np.testing.assert_allclose(i, ref_i, atol=2e-4 * scale)
        finally:
            ofdm.set_fft_impl("xla")


def test_mmdft_slot_loopback():
    """Full modulate/demodulate slot roundtrip under the mmdft transform
    (bf16 'default' precision): grid recovered to ~-40 dB — far below any
    operating SNR."""
    import numpy as np
    import jax.numpy as jnp
    from srsran_edgeric_5g_tpu.ops import ofdm
    from srsran_edgeric_5g_tpu.ran import numerology as num

    timing = num.slot_timing(106, 1536, mu=0)
    rng = np.random.default_rng(9)
    grid = (rng.normal(size=(14, 1272)) + 1j * rng.normal(size=(14, 1272))
            ).astype(np.complex64)
    try:
        ofdm.set_fft_impl("mmdft", "default")
        td = ofdm.modulate_slot(jnp.asarray(grid), timing,
                                center_freq_hz=3.5e9)
        rx = np.asarray(ofdm.demodulate_slot(td, timing,
                                             center_freq_hz=3.5e9))
    finally:
        ofdm.set_fft_impl("xla")
    err = np.mean(np.abs(rx - grid) ** 2)
    sig = np.mean(np.abs(grid) ** 2)
    assert 10 * np.log10(sig / err) > 38, 10 * np.log10(sig / err)


def test_mmdft_structured_matches_xla_path():
    """The structured (k1,n2)-layout mmdft slot path produces the same
    samples/grid as the jnp.fft path (within bf16 transform noise), incl.
    window offset and both nfft=1536 (n2=12) and nfft=1024 (n2=8)."""
    import numpy as np
    import jax.numpy as jnp
    from srsran_edgeric_5g_tpu.ops import ofdm
    from srsran_edgeric_5g_tpu.ran import numerology as num

    rng = np.random.default_rng(2)
    for nof_prb, nfft, wofs in ((106, 1536, 0), (52, 1024, 8)):
        timing = num.slot_timing(nof_prb, nfft, mu=0)
        assert ofdm._structured_ok(timing)
        grid = (rng.normal(size=(2, 14, nof_prb * 12))
                + 1j * rng.normal(size=(2, 14, nof_prb * 12))
                ).astype(np.complex64)
        td_ref = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), timing,
                                               center_freq_hz=3.5e9))
        try:
            ofdm.set_fft_impl("mmdft", "default")
            td = np.asarray(ofdm.modulate_slot(jnp.asarray(grid), timing,
                                               center_freq_hz=3.5e9))
            rx = np.asarray(ofdm.demodulate_slot(
                jnp.asarray(td_ref), timing, center_freq_hz=3.5e9,
                window_offset=wofs))
        finally:
            ofdm.set_fft_impl("auto")
        rms = np.sqrt(np.mean(np.abs(td_ref) ** 2))
        np.testing.assert_allclose(td, td_ref, atol=2e-2 * rms)
        rx_ref = np.asarray(ofdm.demodulate_slot(
            jnp.asarray(td_ref), timing, center_freq_hz=3.5e9,
            window_offset=wofs))
        np.testing.assert_allclose(rx, rx_ref, atol=2e-2)
