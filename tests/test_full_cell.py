"""Full gNB slot pipeline: PDSCH+PDCCH+SSB DL / PUSCH+PUCCH+SRS+PRACH UL
in the jitted slot-batch programs (parallel.full_cell)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.models import pdcch as pdcch_mod, pdsch, ssb as ssb_mod
from srsran_edgeric_5g_tpu.ops import ofdm
from srsran_edgeric_5g_tpu.parallel import full_cell as fcell

S = 20  # covers: SSB slots {0,10}, CSI {1,6,11,16}, SRS {3,13}, PRACH {5,15}


def small_fc() -> fcell.FullCellConfig:
    """10 MHz / 52 PRB / 2 UE variant (fast on the CPU test mesh)."""
    return fcell.FullCellConfig(
        nof_prb=52, nfft=1024, nof_ue=2,
        dl_first_prb=2, dl_prb_per_ue=20,
        ul_first_prb=2, ul_prb_per_ue=20,
        coreset_start_prb=2, coreset_nof_prb=48,
        ssb_first_subcarrier=192,
        prach_freq_prb=46)


def _mk_inputs(fc, rng):
    u = fc.nof_ue
    tbs_u = fc.ul_cell().derived_tbs()
    payloads = jnp.asarray(rng.integers(0, 2, (S, u, tbs_u), dtype=np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (S, u, 2), dtype=np.int8))
    n_csi = len(fc.csi_slots(S))
    csi = jnp.asarray(rng.integers(0, 2, (n_csi, u, fc.csi_bits),
                                   dtype=np.int8))
    return payloads, ack, csi


def _awgn(td, snr_db, rng):
    x = np.asarray(td)
    nv = float((np.abs(x) ** 2).mean()) * 10 ** (-snr_db / 10)
    noise = rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
    return jnp.asarray((x + noise * np.sqrt(nv / 2)).astype(np.complex64))


def test_ul_full_slot_batch():
    """UE UL generator -> AWGN -> gNB UL RX: PUSCH payload-exact, F1 ACKs
    exact, F2 CSI exact+valid, SRS SNR sane, PRACH preamble detected at the
    right delay with no false alarms."""
    fc = small_fc()
    rng = np.random.default_rng(3)
    payloads, ack, csi = _mk_inputs(fc, rng)

    tx = jax.jit(lambda p, a, c: fcell.ue_ul_slot_batch(
        p, a, c, fc, S, prach_preamble=7, prach_delay=24,
        prach_amplitude=0.02))
    td = tx(payloads, ack, csi)
    assert td.shape == (S, fc.timing.cp.total)
    rx = _awgn(td, 25.0, rng)

    res = jax.jit(lambda r: fcell.gnb_ul_slot_batch(r, fc, S))(rx)

    # PUSCH
    assert np.asarray(res["tb_ok"]).all()
    np.testing.assert_array_equal(np.asarray(res["payload"]),
                                  np.asarray(payloads))
    # PUCCH F1 HARQ-ACK, every slot, every UE
    np.testing.assert_array_equal(np.asarray(res["ack_bits"]),
                                  np.asarray(ack))
    # PUCCH F2 CSI occasions
    assert np.asarray(res["csi_ok"]).all()
    np.testing.assert_array_equal(np.asarray(res["csi_bits"]),
                                  np.asarray(csi))
    # SRS: wideband SNR near the operating point, |H| near 1
    snr = np.asarray(res["srs_snr_db"])
    assert snr.shape == (len(fc.srs_slots(S)), fc.nof_ue)
    assert (snr > 15.0).all(), snr
    h = np.asarray(res["srs_h"])
    np.testing.assert_allclose(np.abs(h).mean(), 1.0, atol=0.1)
    # PRACH: the transmitted preamble (7) detected on every occasion,
    # nothing else crosses the threshold.
    det = np.asarray(res["prach_detected"])
    assert det.shape == (len(fc.prach_slots(S)), 64)
    assert det[:, 7].all(), np.asarray(res["prach_metric"])[:, 7]
    assert not det[:, np.arange(64) != 7].any()
    # Delay: 24 time samples -> 24 * L_RA / dft in the preamble domain.
    info = fc.prach_info()
    want = 24 * 839 / info.dft_size
    got = np.asarray(res["prach_delay"])[:, 7]
    assert (np.abs(got - want) <= 1).all(), (got, want)


def test_ul_harq_soft_carry_new_data_mask():
    """HARQ state threads through the jitted program: a failed slot batch's
    soft buffers combine into the retransmission ONLY where new_data=0."""
    fc = small_fc()
    rng = np.random.default_rng(7)
    payloads, ack, csi = _mk_inputs(fc, rng)
    tx = jax.jit(lambda p, a, c: fcell.ue_ul_slot_batch(p, a, c, fc, S))
    td = tx(payloads, ack, csi)

    # 7.5 dB: ~3 dB below the 64QAM r0.5 single-shot waterfall — one copy
    # always fails; chase-combined copies mostly decode.  Not ALL: this
    # harness re-noises the SAME slot, so any overlay-biased RE (PRACH/
    # PUCCH occasion leakage) corrupts every copy identically and
    # combining AMPLIFIES it — a handful of TBs keep one stubborn bit.
    # Cross-checked: the reference ldpc_decoder_avx2 fails the identical
    # combined buffers with the same single-bit errors (the saturating
    # int8 arithmetic both implement caps per-bit correction), so the
    # expectation below is combined >> fresh, not combined == 100%.
    rx1 = _awgn(td, 7.5, rng)
    run = jax.jit(lambda r, sb, nd: fcell.gnb_ul_slot_batch(
        r, fc, S, soft_in=sb, new_data=nd))
    r1 = jax.jit(lambda r: fcell.gnb_ul_slot_batch(r, fc, S))(rx1)
    ok1 = np.asarray(r1["tb_ok"])
    assert not ok1.any(), "first transmission must fail at 7.5 dB"

    # Retransmission (chase): combining with new_data=0 decodes most TBs;
    # new_data=1 (buffer cleared in-graph) must behave like a fresh shot.
    rx2 = _awgn(td, 7.5, rng)
    nd0 = jnp.zeros((S, fc.nof_ue), jnp.float32)
    nd1 = jnp.ones((S, fc.nof_ue), jnp.float32)
    r2 = run(rx2, r1["soft"], nd0)
    r2_fresh = run(rx2, r1["soft"], nd1)
    ok2 = np.asarray(r2["tb_ok"]).reshape(-1)
    assert ok2.sum() >= 0.75 * ok2.size, f"combined decoded {ok2.sum()}"
    assert not np.asarray(r2_fresh["tb_ok"]).any()
    pay_flat = np.asarray(payloads).reshape(ok2.size, -1)
    hat_flat = np.asarray(r2["payload"]).reshape(ok2.size, -1)
    np.testing.assert_array_equal(hat_flat[ok2], pay_flat[ok2])


def test_dl_full_slot_batch():
    """gNB DL TX -> UE-side receive: PDSCH decodes on both slot shapes
    (normal + SSB), DCIs blind-decode, PBCH payloads recover."""
    fc = small_fc()
    rng = np.random.default_rng(11)
    u = fc.nof_ue
    cell_n, cell_s = fc.dl_cell(), fc.dl_cell_ssb()
    tbs_n, tbs_s = cell_n.derived_tbs(), cell_s.derived_tbs()
    assert tbs_s < tbs_n
    norm_idx, ssb_idx = fc.norm_slots(S), fc.ssb_slots(S)
    pay_n = jnp.asarray(rng.integers(0, 2, (len(norm_idx), u, tbs_n),
                                     dtype=np.int8))
    pay_s = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), u, tbs_s),
                                     dtype=np.int8))
    dci = jnp.asarray(rng.integers(0, 2, (S, 2 * u, fc.dci_bits),
                                   dtype=np.int8))
    pbch = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), 24), dtype=np.int8))

    tx = jax.jit(lambda a, b, c, d: fcell.gnb_dl_slot_batch(a, b, c, d,
                                                            fc, S))
    td = tx(pay_n, pay_s, dci, pbch)
    assert td.shape == (S, fc.timing.cp.total)
    rx = _awgn(td, 25.0, rng)

    t = fc.timing
    times = np.asarray(t.cp.data_starts) / t.srate
    grids = ofdm.demodulate_slot(rx, t, scale=1.0)

    # PDSCH via the UE-side receiver, one normal slot + one SSB slot.
    for slot, cell, pay in ((int(norm_idx[0]), cell_n, pay_n[0]),
                            (int(ssb_idx[0]), cell_s, pay_s[0])):
        for uu in range(u):
            cfg = pdsch.PdschConfig(
                rnti=0x4601 + uu, nof_prb=cell.prb_per_ue,
                start_prb=cell.first_prb + uu * cell.prb_per_ue,
                first_symbol=cell.first_symbol, nof_symbols=cell.nof_symbols,
                dmrs_symbols=cell.dmrs_symbols, modulation=cell.modulation,
                target_rate=cell.target_rate, n_id=fc.n_id)
            r = pdsch.receive(grids[slot], cfg, t.srate, times)
            assert np.asarray(r.tb_crc_ok).all(), (slot, uu)
            np.testing.assert_array_equal(np.asarray(r.payload)[0],
                                          np.asarray(pay[uu]))

    # PDCCH: blind-decode each DCI of slot 4 with its search-space config.
    slot = 4
    for i, cfg in enumerate(fc.pdcch_cfgs()):
        cfg = dataclasses.replace(cfg, slot=0)   # data scrambling slot-free
        got, ok = pdcch_mod.blind_decode(grids[slot], cfg)
        assert np.asarray(ok).all(), i
        np.testing.assert_array_equal(np.asarray(got)[0],
                                      np.asarray(dci[slot, i]))

    # PBCH: decode both occasions (sfn = slot // 10 in the SSB config).
    for i, sl in enumerate(ssb_idx):
        cfg = ssb_mod.SsbConfig(pci=fc.pci, ssb_index=0, l_max=4,
                                sfn=int(sl) // 10, first_symbol=2,
                                first_subcarrier=fc.ssb_first_subcarrier)
        payload, ok = ssb_mod.decode(grids[int(sl)], cfg)
        assert np.asarray(ok).all(), i
        np.testing.assert_array_equal(np.asarray(payload)[0],
                                      np.asarray(pbch[i]))


def test_default_20mhz_config_geometry():
    """The default 20 MHz 4-UE layout is internally consistent (disjoint
    REs, valid plans on all three slot shapes)."""
    fc = fcell.FullCellConfig()
    from srsran_edgeric_5g_tpu.parallel.slot_pipeline import _plans
    for cell in (fc.dl_cell(), fc.dl_cell_ssb(), fc.ul_cell()):
        seg, rm = _plans(cell)
        assert seg.c >= 1 and rm.e > 0
    # PUSCH band clear of PUCCH F1 (PRBs < U) and F2/PRACH (>= 100).
    ul = fc.ul_cell()
    assert ul.first_prb >= fc.nof_ue
    assert ul.first_prb + ul.nof_ue * ul.prb_per_ue <= fc.prach_freq_prb
    # SSB block inside the grid.
    assert fc.ssb_first_subcarrier + 240 <= fc.timing.nof_subc
    # PRACH preamble band fits between prach_freq_prb and the band edge.
    info = fc.prach_info()
    assert info.freq_offset_bins * 1250 + 839 * 1250 \
        <= (fc.timing.nof_subc - fc.timing.nof_subc // 2) * 15e3


def test_dl_csi_rs_occasions():
    """NZP-CSI-RS rides symbol 1 of every csi_rs occasion slot
    (csi_rs_scheduler.cpp counterpart): the UE-side LS snapshot at the
    CSI-RS REs recovers the identity channel; off-occasion symbol 1 is
    empty."""
    from srsran_edgeric_5g_tpu.ops import csi_rs as csi_mod

    fc = small_fc()
    rng = np.random.default_rng(9)
    u = fc.nof_ue
    norm_idx, ssb_idx = fc.norm_slots(S), fc.ssb_slots(S)
    pay_n = jnp.asarray(rng.integers(0, 2, (len(norm_idx), u,
                                            fc.dl_cell().derived_tbs()),
                                     np.int8))
    pay_s = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), u,
                                            fc.dl_cell_ssb().derived_tbs()),
                                     np.int8))
    dci = jnp.asarray(rng.integers(0, 2, (S, 2 * u, fc.dci_bits), np.int8))
    pbch = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), 24), np.int8))
    td = jax.jit(lambda a, b, d, p: fcell.gnb_dl_slot_batch(
        a, b, d, p, fc, S))(pay_n, pay_s, dci, pbch)

    t = fc.timing
    grids = jax.jit(lambda x: ofdm.demodulate_slot(x, t, scale=1.0))(td)
    occ = set(int(x) for x in fc.csi_rs_slots(S))
    assert occ, "no CSI-RS occasions in the window"
    for sl in range(S):
        row = np.asarray(grids[sl, fc.csi_rs_symbol])
        if sl in occ:
            est = np.asarray(csi_mod.csi_rs_estimate(
                grids[sl], fc.csi_rs_cfg(sl)))
            np.testing.assert_allclose(est, np.ones_like(est), atol=0.02)
        else:
            assert np.abs(row).max() < 1e-3, sl
