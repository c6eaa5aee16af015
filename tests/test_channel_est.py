import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import channel_est, dmrs, sequences


def test_dmrs_pattern_type1():
    p = dmrs.dmrs_pattern(1, nof_prb=2, port=0)
    np.testing.assert_array_equal(p.subcarriers[:6], [0, 2, 4, 6, 8, 10])
    assert len(p.subcarriers) == 12  # 6 per PRB
    assert (p.wf == 1).all()
    p1 = dmrs.dmrs_pattern(1, nof_prb=2, port=1)
    np.testing.assert_array_equal(p1.wf[:4], [1, -1, 1, -1])
    p2 = dmrs.dmrs_pattern(1, nof_prb=2, port=2)
    assert p2.subcarriers[0] == 1  # CDM group delta=1


def test_dmrs_pattern_type2():
    p = dmrs.dmrs_pattern(2, nof_prb=3, port=0)
    np.testing.assert_array_equal(p.subcarriers[:4], [0, 1, 6, 7])
    assert len(p.subcarriers) == 12  # 4 per PRB


def test_dmrs_sequence_matches_gold():
    ci = dmrs.dmrs_c_init(slot=3, symbol=2, n_id=41, n_scid=0)
    r = np.asarray(dmrs.dmrs_sequence(jnp.asarray([ci], dtype=jnp.uint32), 24))[0]
    c = sequences.np_gold_sequence(ci, 48).astype(np.float64)
    want = ((1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])) / np.sqrt(2)
    np.testing.assert_allclose(r, want, atol=1e-6)
    np.testing.assert_allclose(np.abs(r), 1.0, atol=1e-6)


def test_map_extract_roundtrip():
    pat = dmrs.dmrs_pattern(1, nof_prb=4, port=0)
    ci = jnp.asarray([dmrs.dmrs_c_init(0, 2, 7)], dtype=jnp.uint32)
    pil = dmrs.dmrs_sequence(ci, len(pat.subcarriers))
    grid = jnp.zeros((1, 14, 48), jnp.complex64)
    grid = dmrs.map_dmrs(grid, pil, pat, symbol=2)
    got = dmrs.extract_dmrs(grid, pat, symbol=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(pil), atol=1e-6)


def _flat_channel_pilots(rng, nprb, ndmrs, h_fn, nv, cfo_hz=0.0, times=None):
    pat = dmrs.dmrs_pattern(1, nof_prb=nprb, port=0)
    npil = len(pat.subcarriers)
    ci = jnp.asarray([dmrs.dmrs_c_init(0, 2, 1)], dtype=jnp.uint32)
    ref = np.asarray(dmrs.dmrs_sequence(ci, npil))[0]
    h = h_fn(pat.subcarriers)
    rx = np.zeros((1, ndmrs, npil), np.complex64)
    for s in range(ndmrs):
        rot = np.exp(2j * np.pi * cfo_hz * (times[s] if times is not None else 0))
        noise = (rng.normal(size=npil) + 1j * rng.normal(size=npil)) * np.sqrt(nv / 2)
        rx[0, s] = h * ref * rot + noise
    return pat, jnp.asarray(rx), jnp.asarray(ref[None]), h


def test_estimate_flat_channel():
    rng = np.random.default_rng(3)
    h_true = 0.8 * np.exp(1j * 0.3)
    pat, rx, ref, _ = _flat_channel_pilots(
        rng, nprb=8, ndmrs=2, h_fn=lambda sc: np.full(len(sc), h_true), nv=1e-6)
    h, nv, cfo = channel_est.estimate_port(rx, ref, pat.subcarriers, 96,
                                           dmrs_symbol_times_s=np.array([0.0, 5e-4]))
    np.testing.assert_allclose(np.asarray(h)[0], np.full(96, h_true), atol=5e-3)
    assert np.asarray(nv)[0] == pytest.approx(1e-6, rel=0.6)
    assert abs(np.asarray(cfo)[0]) < 20


def test_estimate_linear_channel_interpolation():
    """Linear-in-frequency channel is reproduced exactly by linear interp."""
    rng = np.random.default_rng(4)
    slope = lambda sc: (0.5 + 0.01 * sc) * np.exp(1j * 0.001 * sc)
    pat, rx, ref, _ = _flat_channel_pilots(rng, nprb=4, ndmrs=1, h_fn=slope, nv=0)
    h, nv, _ = channel_est.estimate_port(rx, ref, pat.subcarriers, 48)
    got = np.asarray(h)[0]
    want = slope(np.arange(48))
    # Exact at pilots, close in between (phase curvature is tiny).
    np.testing.assert_allclose(got[pat.subcarriers], want[pat.subcarriers], atol=1e-5)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_cfo_estimation():
    rng = np.random.default_rng(5)
    times = np.array([0.0, 5e-4])  # symbols 0 and 7 at mu=0 spacing
    cfo_true = 200.0  # Hz
    pat, rx, ref, _ = _flat_channel_pilots(
        rng, nprb=8, ndmrs=2, h_fn=lambda sc: np.ones(len(sc)), nv=1e-6,
        cfo_hz=cfo_true, times=times)
    h, nv, cfo = channel_est.estimate_port(rx, ref, pat.subcarriers, 96,
                                           dmrs_symbol_times_s=times)
    assert np.asarray(cfo)[0] == pytest.approx(cfo_true, abs=2.0)
    # After compensation the averaged estimate has near-unit magnitude.
    np.testing.assert_allclose(np.abs(np.asarray(h)[0]), 1.0, atol=1e-2)


def test_estimate_port_ta_handles_large_delay():
    """A delay well beyond one pilot gap aliases plain linear interpolation
    but is recovered exactly by the TA-compensated estimator."""
    scs = 15e3
    nprb = 16
    pat = dmrs.dmrs_pattern(1, nof_prb=nprb, port=0)
    npil = len(pat.subcarriers)
    ci = jnp.asarray([dmrs.dmrs_c_init(0, 2, 1)], dtype=jnp.uint32)
    ref = np.asarray(dmrs.dmrs_sequence(ci, npil))[0]
    delay_s = 2.0e-6  # ~2 us: phase rotates ~0.1 rad/subcarrier
    h_true = np.exp(-2j * np.pi * np.arange(192) * scs * delay_s)
    rx = (h_true[pat.subcarriers] * ref)[None, None, :].astype(np.complex64)

    h_ta, nv, cfo, ta = channel_est.estimate_port_ta(
        jnp.asarray(rx), jnp.asarray(ref[None]), pat.subcarriers, 192, scs)
    assert float(ta[0]) == pytest.approx(delay_s, abs=3e-8)
    np.testing.assert_allclose(np.asarray(h_ta)[0], h_true, atol=5e-3)

    # Plain linear interpolation degrades at the mid-gap points.
    h_lin, _, _ = channel_est.estimate_port(
        jnp.asarray(rx), jnp.asarray(ref[None]), pat.subcarriers, 192)
    err_lin = np.abs(np.asarray(h_lin)[0] - h_true).max()
    err_ta = np.abs(np.asarray(h_ta)[0] - h_true).max()
    assert err_ta < err_lin / 3


def test_delay_window_denoising():
    """Delay-domain windowing (the RC-smoothing counterpart) must cut the
    estimation MSE on a noisy multipath channel and stay lossless when
    noise-free (taps inside the window)."""
    scs = 15e3
    nprb = 16
    nsubc = 12 * nprb
    pat = dmrs.dmrs_pattern(1, nof_prb=nprb, port=0)
    npil = len(pat.subcarriers)
    ci = jnp.asarray([dmrs.dmrs_c_init(0, 2, 1)], dtype=jnp.uint32)
    ref = np.asarray(dmrs.dmrs_sequence(ci, npil))[0]
    rng = np.random.default_rng(7)

    # Two-tap channel: 0.2us and 1.1us (inside a 2.3us TDL-ish spread).
    k = np.arange(nsubc)
    h_true = (0.8 * np.exp(-2j * np.pi * k * scs * 0.2e-6)
              + 0.5 * np.exp(-2j * np.pi * k * scs * 1.1e-6))
    clean = (h_true[pat.subcarriers] * ref)[None, None, :].astype(np.complex64)

    # Noise-free: smoothing must not distort the in-window response.  The
    # interior is near-exact; band edges keep a bounded residual (the
    # conjugate-ramp extension is exact only for single-ray channels).
    h_nf, _, _, _ = channel_est.estimate_port_ta(
        jnp.asarray(clean), jnp.asarray(ref[None]), pat.subcarriers, nsubc,
        scs, delay_spread_s=2.3e-6)
    err_nf = np.abs(np.asarray(h_nf)[0] - h_true)
    assert err_nf[24:-24].max() < 0.05, err_nf[24:-24].max()
    assert err_nf.max() < 0.2, err_nf.max()

    # Noisy: windowed estimate must beat the unwindowed one clearly.
    sigma = 0.3
    noise = (rng.normal(size=clean.shape) + 1j * rng.normal(size=clean.shape)
             ).astype(np.complex64) * sigma / np.sqrt(2)
    rx = clean + noise
    h_w, _, _, _ = channel_est.estimate_port_ta(
        jnp.asarray(rx), jnp.asarray(ref[None]), pat.subcarriers, nsubc,
        scs, delay_spread_s=2.3e-6)
    h_uw, _, _, _ = channel_est.estimate_port_ta(
        jnp.asarray(rx), jnp.asarray(ref[None]), pat.subcarriers, nsubc, scs)
    mse_w = np.mean(np.abs(np.asarray(h_w)[0] - h_true) ** 2)
    mse_uw = np.mean(np.abs(np.asarray(h_uw)[0] - h_true) ** 2)
    assert mse_w < mse_uw / 2, (mse_w, mse_uw)
