import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import prach, pucch


# ------------------------------------------------------------------- PRACH

def test_root_sequence_properties():
    x = prach.root_sequence(129, prach.L_LONG)
    np.testing.assert_allclose(np.abs(x), 1.0, atol=1e-6)
    # ZC: ideal periodic autocorrelation (delta).
    ac = np.fft.ifft(np.abs(np.fft.fft(x)) ** 2)
    assert np.abs(ac[0]) > 100 * np.abs(ac[1:]).max()


def test_logical_root_mapping():
    assert prach.sequence_number(0) == 129
    assert prach.sequence_number(1) == 710
    assert prach.sequence_number(0, prach.L_SHORT) == 1


def test_prach_detect_clean():
    cfg = prach.PrachConfig(root_sequence_index=1, zero_correlation_zone=13)
    pre = prach.generate(cfg, preamble_index=17)
    det = prach.detect(pre, cfg)
    d = np.asarray(det.detected)
    assert d[17], f"metrics around: {np.asarray(det.metrics)[15:20]}"
    assert d.sum() == 1, np.nonzero(d)


def test_prach_detect_with_noise_and_delay():
    cfg = prach.PrachConfig(root_sequence_index=1, zero_correlation_zone=13)
    rng = np.random.default_rng(0)
    pre = np.asarray(prach.generate(cfg, preamble_index=5))
    # Delay in time domain = linear phase in frequency domain.
    delay = 4
    phase = np.exp(-2j * np.pi * np.arange(prach.L_LONG) * delay / prach.L_LONG)
    noise = (rng.normal(size=pre.shape) + 1j * rng.normal(size=pre.shape)) * 1.0
    rx = jnp.asarray((pre * phase + noise).astype(np.complex64))
    det = prach.detect(rx, cfg)
    d = np.asarray(det.detected)
    assert d[5]
    assert int(np.asarray(det.delays)[5]) == delay


def test_prach_no_false_alarm_on_noise():
    cfg = prach.PrachConfig(root_sequence_index=1, zero_correlation_zone=13)
    rng = np.random.default_rng(1)
    noise = (rng.normal(size=prach.L_LONG) + 1j * rng.normal(size=prach.L_LONG))
    det = prach.detect(jnp.asarray(noise.astype(np.complex64)), cfg)
    assert not np.asarray(det.detected).any()


# ------------------------------------------------------------------- PUCCH

def f0cfg(**kw):
    base = dict(n_id=17, slot=2, start_symbol=12, nof_symbols=2, initial_cs=3)
    base.update(kw)
    return pucch.Pucch01Config(**base)


def test_format0_detects_correct_m0():
    cfg = f0cfg()
    tx = pucch.format0_generate(cfg, m0=6)
    metrics, best = pucch.format0_detect(tx, cfg, m0_candidates=(0, 3, 6, 9))
    assert int(best) == 2
    m = np.asarray(metrics)
    assert m[2] > 0.99 and (np.delete(m, 2) < 0.6).all()


def test_format0_noisy():
    cfg = f0cfg()
    rng = np.random.default_rng(2)
    tx = np.asarray(pucch.format0_generate(cfg, m0=0))
    rx = tx * 0.7 + (rng.normal(size=tx.shape) + 1j * rng.normal(size=tx.shape)) * 0.2
    metrics, best = pucch.format0_detect(jnp.asarray(rx.astype(np.complex64)),
                                         cfg, m0_candidates=(0, 6))
    assert int(best) == 0


@pytest.mark.parametrize("bits", [[0], [1], [0, 1], [1, 1]])
def test_format1_roundtrip(bits):
    cfg = f0cfg(start_symbol=0, nof_symbols=8)
    tx = pucch.format1_generate(cfg, np.asarray(bits), occ_index=1)
    out, metric = pucch.format1_detect(tx, cfg, nof_bits=len(bits), occ_index=1)
    np.testing.assert_array_equal(np.asarray(out).ravel(), bits)
    assert float(metric) > 0.5


def f2cfg(**kw):
    base = dict(rnti=0x4601, n_id=31, n_id0=7, slot=1, start_symbol=12,
                nof_symbols=2, start_prb=2, nof_prb=4, uci_bits=7)
    base.update(kw)
    return pucch.Pucch2Config(**base)


@pytest.mark.parametrize("k", [4, 11, 16])
def test_format2_roundtrip(k):
    cfg = f2cfg(uci_bits=k, nof_prb=6 if k > 11 else 4)
    rng = np.random.default_rng(k)
    bits = jnp.asarray(rng.integers(0, 2, (1, k), dtype=np.int8))
    grid = pucch.format2_process(bits, cfg, nsymb=14, nsubc=624)
    out, ok = pucch.format2_decode(grid, cfg)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


def test_format2_noisy_channel():
    cfg = f2cfg(uci_bits=6)
    rng = np.random.default_rng(9)
    bits = jnp.asarray(rng.integers(0, 2, (1, 6), dtype=np.int8))
    grid = np.asarray(pucch.format2_process(bits, cfg, nsymb=14, nsubc=624))
    h = 0.9 * np.exp(1j * 0.4)
    noise = (rng.normal(size=grid.shape) + 1j * rng.normal(size=grid.shape))
    rx = grid * h + noise * 0.05 * (np.abs(grid) > 0)  # noise in-allocation
    out, ok = pucch.format2_decode(jnp.asarray(rx.astype(np.complex64)), cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


def test_prach_ofdm_roundtrip_and_detect():
    """Time-domain PRACH: modulate preamble -> OFDM demod window -> detect."""
    cfg = prach.PrachConfig(root_sequence_index=1, zero_correlation_zone=13)
    info = prach.prach_ofdm_info(srate=11_520_000)  # 10 MHz cell, format-0 SCS
    assert info.dft_size == 9216
    pre = prach.generate(cfg, preamble_index=23)
    td = prach.ofdm_modulate_prach(pre, info)
    assert td.shape == (info.cp_samples + info.dft_size,)
    back = prach.ofdm_demodulate_prach(td, info)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pre), atol=1e-2)
    det = prach.detect(back, cfg)
    d = np.asarray(det.detected)
    assert d[23] and d.sum() == 1


def test_ncs_tables_and_restricted_shifts():
    assert prach.ncs_from_zcz(1) == 13
    assert prach.ncs_from_zcz(11, "a") == 128
    with pytest.raises(ValueError):
        prach.ncs_from_zcz(15, "a")
    # u=129 has d_u=13 < N_cs=15 -> unusable root, correctly skipped.
    assert prach.restricted_cyclic_shifts(129, n_cs=15) == []
    # find a usable root and check shift-set properties (early logical roots
    # all have d_u < N_cs by table construction, so search wide)
    for idx in range(500):
        u = prach.sequence_number(idx)
        shifts = prach.restricted_cyclic_shifts(u, n_cs=15)
        if shifts:
            break
    assert shifts and len(set(shifts)) == len(shifts)
    assert all(0 <= c < 839 for c in shifts)
    du = prach._cyclic_shift_distance(u, prach.L_LONG)
    assert du >= 15


def test_restricted_set_a_detection():
    cfg = prach.PrachConfig(root_sequence_index=1, zero_correlation_zone=15,
                            restricted="a")
    table = cfg.preamble_table
    assert len(table) == 64
    assert len({(u, cv) for _, u, cv in table}) == 64  # distinct preambles
    # multiple roots needed (restricted sets have few shifts per root)
    assert len({off for off, _, _ in table}) > 1
    pre = prach.generate(cfg, preamble_index=37)
    det = prach.detect(pre, cfg)
    d = np.asarray(det.detected)
    assert d[37], np.asarray(det.metrics)[35:40]
    # other roots stay silent; same-root neighbors may leak slightly but only
    # the true preamble exceeds the threshold
    assert d.sum() == 1, np.nonzero(d)


def test_prach_short_format_roundtrip():
    """Short (L=139, 15 kHz) preamble: generate -> OFDM occasion -> detect
    the right preamble index and delay through AWGN (format A/B family)."""
    cfg = prach.PrachConfig(root_sequence_index=1,
                            zero_correlation_zone=prach.ncs_from_zcz_short(11),
                            l_ra=prach.L_SHORT)
    assert len(cfg.preamble_table) == 64
    info = prach.prach_ofdm_info(11_520_000, prach.L_SHORT, cp_us=2.0)
    rng = np.random.default_rng(2)
    for idx in (0, 17, 63):
        fd = prach.generate(cfg, idx)
        td = prach.ofdm_modulate_prach(fd, info)
        noise = (rng.normal(size=td.shape) + 1j * rng.normal(size=td.shape))
        rx = jnp.asarray((np.asarray(td) + 0.05 * noise).astype(np.complex64))
        back = prach.ofdm_demodulate_prach(rx, info)
        det = prach.detect(back, cfg)
        found = np.nonzero(np.asarray(det.detected))[0]
        assert list(found) == [idx], (idx, found)


@pytest.mark.parametrize("fmt", list(prach.PRACH_FORMATS))
def test_prach_all_formats_roundtrip_delay(fmt):
    """Every TS 38.211 preamble format (long 0/1/2/3, short A1-C2): generate
    -> time-domain occasion (single CP + n_reps symbol repetitions, CP in
    kappa units per prach_preamble_information.cpp:30-118) -> delayed noisy
    channel -> OFDM demod (per-repetition DFT) -> coherently-combined
    detection recovers the preamble index and the delay."""
    l_ra, scs0, n_reps, cp_kappa = prach.PRACH_FORMATS[fmt]
    srate = 11_520_000
    info = prach.prach_format_info(fmt, srate)
    assert info.n_reps == n_reps
    assert info.cp_samples == round(cp_kappa * srate / 30.72e6)
    if l_ra == prach.L_LONG:
        ncs = prach.ncs_from_zcz(11, scs_hz=scs0)
    else:
        ncs = prach.ncs_from_zcz_short(11)
    cfg = prach.PrachConfig(root_sequence_index=3,
                            zero_correlation_zone=ncs, l_ra=l_ra)
    idx = 29
    fd = prach.generate(cfg, idx)
    td = np.asarray(prach.ofdm_modulate_prach(fd, info))
    assert td.shape == (info.cp_samples + n_reps * info.dft_size,)
    delay = 12  # samples; must stay below the CP so the window still works
    assert delay < info.cp_samples
    rng = np.random.default_rng(hash(fmt) % 2**31)
    noise = rng.normal(size=td.shape) + 1j * rng.normal(size=td.shape)
    rx = np.concatenate([np.zeros(delay, np.complex64), td])[:td.shape[0]]
    rx = jnp.asarray((rx + 0.03 * noise).astype(np.complex64))
    back = prach.ofdm_demodulate_prach(rx, info)
    assert back.shape == ((n_reps, l_ra) if n_reps > 1 else (l_ra,))
    det = prach.detect(back, cfg)
    found = np.nonzero(np.asarray(det.detected))[0]
    assert list(found) == [idx], (fmt, found)
    # Delay in L_RA-domain bins: d_samples * L / dft_size.
    want_bins = delay * l_ra / info.dft_size
    got = float(np.asarray(det.delays)[idx])
    assert abs(got - want_bins) <= 1.0, (fmt, got, want_bins)
