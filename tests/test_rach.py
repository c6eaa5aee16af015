"""RACH procedure: PRACH detect -> RAR -> Msg3 -> connected UE -> traffic.

Covers the behavioral gap the reference fills with
common_scheduling/ra_scheduler.cpp + prach_scheduler.cpp + the mac_ctrl UE
creation path: a detected preamble must lead to a RAR grant, a Msg3 PUSCH
and a scheduler-managed UE — not terminate in an assertion.
"""

import numpy as np
import pytest

from srsran_edgeric_5g_tpu.mac import rach
from srsran_edgeric_5g_tpu.mac import scheduler as mac
from srsran_edgeric_5g_tpu.ran.numerology import slot_timing


def test_rar_pdu_roundtrip():
    sub = rach.RarSubPdu(
        rapid=37, ta_cmd=123,
        ul_grant=rach.RarUlGrant(freq_hopping=0, riv=777, time_alloc=2,
                                 mcs=3, tpc=1, csi_request=0),
        tc_rnti=0x4601)
    sub2 = rach.RarSubPdu(
        rapid=5, ta_cmd=0,
        ul_grant=rach.RarUlGrant(0, 12, 0, 0, 0, 0), tc_rnti=0x4602)
    bits = rach.encode_rar_pdu([sub, sub2])
    assert len(bits) == 2 * (8 + 56)
    out = rach.decode_rar_pdu(bits)
    assert out == [sub, sub2]


def test_riv_roundtrip():
    for n in (52, 106):
        for start in (0, 3, n - 5):
            for length in (1, 3, n - start):
                riv = rach.riv_type1(start, length, n)
                assert riv < (1 << 14)
                assert rach.riv_type1_decode(riv, n) == (start, length)


def test_msg3_msg4_roundtrip():
    ue_id = 0xA5A5_DEAD_BE
    m3 = rach.encode_msg3_ccch(ue_id)
    assert rach.decode_msg3_ccch(m3) == ue_id
    m4 = rach.encode_msg4_conres(ue_id)
    assert rach.decode_msg4_conres(m4) == ue_id
    assert rach.decode_msg3_ccch(m4) is None   # LCID separates them


def test_ra_rnti_and_ta():
    # TS 38.321 §5.1.3 formula spot values.
    assert rach.ra_rnti(0, 0) == 1
    assert rach.ra_rnti(0, 7, 0) == 1 + 14 * 7
    assert rach.ta_command_from_delay(0.0) == 0
    # One TA unit at mu=0 is 16*64/(480e3*4096) s = 0.52 us.
    unit = 16 * 64 / (480e3 * 4096)
    assert rach.ta_command_from_delay(unit) == 1
    assert rach.ta_command_from_delay(10.5 * unit) in (10, 11)
    assert rach.ta_command_from_delay(1.0) == 3846  # clamped


def test_procedure_window_and_retx():
    cfg = rach.RachConfig(bwp_prbs=52, ra_window_slots=3, msg3_delay_slots=2,
                          max_msg3_harq_retx=1)
    proc = rach.RachProcedure(cfg)
    tc = proc.handle_prach_detection(slot=5, preamble=11)
    # Window [6, 9): nothing at 5, RAR at 6.
    rar, _ = proc.run_slot(5)
    assert rar is None
    rar, _ = proc.run_slot(6)
    assert rar is not None and rar.subpdus[0].tc_rnti == tc
    # Msg3 expected at 8.
    _, msg3 = proc.run_slot(7)
    assert msg3 == []
    _, msg3 = proc.run_slot(8)
    assert [m.tc_rnti for m in msg3] == [tc]
    # CRC failure -> one retx at 10, then drop.
    assert proc.handle_msg3_crc(tc, False, None) is None
    _, msg3 = proc.run_slot(10)
    assert [m.tc_rnti for m in msg3] == [tc]
    assert proc.handle_msg3_crc(tc, False, None) is None
    assert proc.pending_msg3s == {}

    # Window expiry: an unserved detection is dropped after the window.
    proc2 = rach.RachProcedure(cfg)
    proc2.handle_prach_detection(slot=0, preamble=1)
    rar, _ = proc2.run_slot(4)          # window [1, 4) already closed
    assert rar is None and proc2.pending_rars == []


def test_attach_e2e_full_phy():
    """Full attach through the real PHY: PRACH over the UL band -> detect ->
    RAR PDSCH (RA-RNTI) -> UE parses RAR -> Msg3 PUSCH on the granted
    allocation -> contention resolution -> UE scheduled with DL traffic."""
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.models.hetero_cell import HeteroCellProcessor
    from srsran_edgeric_5g_tpu.models.pdsch import PdschConfig
    from srsran_edgeric_5g_tpu.ops import prach as prach_mod
    from srsran_edgeric_5g_tpu.ran import tbs as tbs_mod

    rng = np.random.default_rng(7)
    t = slot_timing(nof_prb=52, nfft=768, mu=0)
    cfg = rach.RachConfig(bwp_prbs=52, msg3_nof_prb=3)
    proc = rach.RachProcedure(cfg)
    sched = mac.CellScheduler(mac.SchedulerConfig(nof_prb=52), rntis=[])
    assert sched.ues == {}              # no static UE list

    # --- slot 0: UE transmits a preamble; gNB detects it. ---
    pcfg = prach_mod.PrachConfig(root_sequence_index=1,
                                 zero_correlation_zone=13)
    preamble = 23
    info = prach_mod.prach_ofdm_info(int(t.srate))
    tx = prach_mod.ofdm_modulate_prach(
        prach_mod.generate(pcfg, preamble), info)
    freq = prach_mod.ofdm_demodulate_prach(tx, info)
    det = prach_mod.detect(freq, pcfg)
    det_np = np.asarray(det.detected)
    assert det_np[preamble] and det_np.sum() == 1
    tc = proc.handle_prach_detection(slot=0, preamble=preamble, delay_s=0.0)

    # --- slot 1: gNB emits the RAR PDSCH; the UE decodes + parses it. ---
    rar, _ = proc.run_slot(1)
    assert rar is not None
    rar_cfg = PdschConfig(rnti=rar.ra_rnti, nof_prb=4, start_prb=0,
                          modulation="qpsk", target_rate=0.12)
    rar_proc = HeteroCellProcessor(t, [rar_cfg])
    tbs = rar_proc.tbs[0]
    assert tbs >= len(rar.payload_bits)
    pdu = np.zeros((1, tbs), np.int8)
    pdu[0, :len(rar.payload_bits)] = rar.payload_bits
    td = rar_proc.process_dl_slot([jnp.asarray(pdu)])
    hat, ok, _, _ = rar_proc.process_dl_rx_slot(td)[0]
    assert bool(np.asarray(ok).all())
    subs = rach.decode_rar_pdu(np.asarray(hat).reshape(-1))
    assert len(subs) == 1 and subs[0].rapid == preamble
    assert subs[0].tc_rnti == tc
    start, length = rach.riv_type1_decode(subs[0].ul_grant.riv, cfg.bwp_prbs)
    assert (start, length) == (0, cfg.msg3_nof_prb)

    # --- slot 1 + msg3_delay: UE transmits Msg3 on the granted PUSCH. ---
    msg3_slot = 1 + cfg.msg3_delay_slots
    for s in range(2, msg3_slot):
        _, due = proc.run_slot(s)
        assert due == []
    _, due = proc.run_slot(msg3_slot)
    assert [m.tc_rnti for m in due] == [tc]

    mcs = tbs_mod.mcs_config(subs[0].ul_grant.mcs, "qam64")
    m3_cfg = PdschConfig(rnti=tc, nof_prb=length, start_prb=start,
                         modulation=mcs.modulation,
                         target_rate=mcs.target_rate)
    m3_proc = HeteroCellProcessor(t, [m3_cfg])
    ue_id = int(rng.integers(0, 1 << 48))
    m3_bits = rach.encode_msg3_ccch(ue_id)
    m3_tbs = m3_proc.tbs[0]
    assert m3_tbs >= len(m3_bits)
    m3 = np.zeros((1, m3_tbs), np.int8)
    m3[0, :len(m3_bits)] = m3_bits
    td_ul = m3_proc.process_ul_tx_slot([jnp.asarray(m3)])
    m3_hat, m3_ok, _, _ = m3_proc.process_ul_slot(td_ul)[0]
    assert bool(np.asarray(m3_ok).all())

    # --- contention resolution: UE enters the scheduler. ---
    ue = proc.handle_msg3_crc(tc, True, np.asarray(m3_hat))
    assert ue is not None and ue.c_rnti == tc and ue.ue_id48 == ue_id
    assert rach.decode_msg4_conres(ue.msg4_bits) == ue_id  # UE-side match
    sched.ues[ue.c_rnti] = mac.SchedUe(rnti=ue.c_rnti)

    # --- the attached UE carries scheduled DL traffic. ---
    sched.handle_csi(ue.c_rnti, cqi=15, snr_db=30.0)
    sched.update_buffer(ue.c_rnti, dl_bytes=5000)
    grants = sched.run_slot()
    assert len(grants) == 1 and grants[0].rnti == tc
    g = grants[0]
    dl_proc = HeteroCellProcessor(t, sched.to_pdsch_configs(grants))
    payload = jnp.asarray(rng.integers(0, 2, (1, dl_proc.tbs[0]), np.int8))
    td_dl = dl_proc.process_dl_slot([payload])
    dl_hat, dl_ok, _, _ = dl_proc.process_dl_rx_slot(td_dl)[0]
    assert bool(np.asarray(dl_ok).all())
    assert (np.asarray(dl_hat) == np.asarray(payload)).all()
    assert g.tbs // 8 > 0 and sched.ues[tc].tx_bytes > 0


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_loopback_app_rach_attach(tmp_path):
    """The loopback app attaches UEs via the RA procedure over the radio
    bridge (no static UE list) and then serves them scheduled traffic."""
    import os
    import pathlib
    import subprocess
    import sys as _sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(repo)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    out = subprocess.run(
        [_sys.executable, str(repo / "tools" / "run_loopback_app.py"),
         "--slots", "30", "--rach", "2", "--port", "47917"],
        capture_output=True, text=True, timeout=500, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PRACH preamble 7 detected" in out.stdout, out.stdout
    assert "Msg3 ok" in out.stdout
    assert "contention resolved" in out.stdout
    assert "rach: 2/2 UEs attached" in out.stdout


def test_bcch_unit():
    """SIB1 periodicity, SI staggering, paging occasion math + PDU codec."""
    from srsran_edgeric_5g_tpu.mac import bcch

    si = bcch.SiScheduler(bcch.SiConfig(si_messages=((b"\x01\x02", 40),)))
    kinds = {s: g.kind for s in range(41)
             if (g := si.run_slot(s)) is not None}
    assert kinds[0] == "sib1" and kinds[20] == "sib1" and kinds[40] == "sib1"
    assert kinds[1] == "si"                     # staggered SI window
    assert si.run_slot(2) is None

    pg = bcch.PagingScheduler(bcch.PagingConfig(drx_cycle_frames=2))
    pg.page_ue(7, b"abc")
    # UE 7: PF = 7 % 2 = 1, i_s = 0 -> sfn odd, slot 0 -> slot 10.
    assert pg.run_slot(0) is None
    g = pg.run_slot(10)
    assert g is not None and g.rnti == bcch.P_RNTI
    assert bcch.decode_paging(g.payload_bits) == [(7, b"abc")]
    assert pg.run_slot(30) is None              # queue drained


def test_loopback_app_bcch(tmp_path):
    """SIB1 + paging broadcast through the real PHY in the app loop."""
    import os
    import pathlib
    import subprocess
    import sys as _sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(repo)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    out = subprocess.run(
        [_sys.executable, str(repo / "tools" / "run_loopback_app.py"),
         "--slots", "25", "--bcch", "--port", "47923"],
        capture_output=True, text=True, timeout=500, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "bcch: 2 SIB1 decoded, 1 paging records" in out.stdout, out.stdout


def test_bcch_spec_windows_and_mu():
    """TS 38.331 SI windows (periodicity in frames, window = (n-1)*w) and
    TS 38.304 paging at mu=1 (period math in time, occasions spread over
    the PF) — the spec-true forms of the round-3 simplifications."""
    from srsran_edgeric_5g_tpu.mac import bcch

    # Two SI messages, rf8 / rf16, window 5 slots, mu=0: message 1's window
    # starts at slot 0 of SFN mod 8 == 0 (shifted off the SIB1 slot),
    # message 2's at slot 5.
    si = bcch.SiScheduler(bcch.SiConfig(
        si_messages=((b"\x01", 8), (b"\x02", 16)), si_window_slots=5))
    got = {s: g.kind for s in range(2 * 16 * 10)
           if (g := si.run_slot(s)) is not None}
    assert got[1] == "si" and got[81] == "si"      # rf8: SFN 0, 8
    assert got[5] == "si" and got[165] == "si"     # rf16: slot 5, SFN 0, 16
    assert 85 not in got                           # rf16 not due at SFN 8

    # mu=1: 20 slots/frame, SIB1 every 20 ms = 40 slots.
    si1 = bcch.SiScheduler(bcch.SiConfig(mu=1))
    sib1 = [s for s in range(81) if (g := si1.run_slot(s)) is not None
            and g.kind == "sib1"]
    assert sib1 == [0, 40, 80]

    # Paging at mu=1, Ns=2: UE with i_s=1 pages at the half-frame boundary
    # (slot 10 of its PF), not at slot 1.
    pg = bcch.PagingScheduler(bcch.PagingConfig(drx_cycle_frames=2, ns=2,
                                                nof_pf_per_drx=2, mu=1))
    # N = T/nof_pf = 1 -> every UE has PF 0; i_s = ue_id % 2.
    pg.page_ue(3, b"x")                            # i_s = 1
    assert pg.run_slot(1) is None
    g = pg.run_slot(10)
    assert g is not None and bcch.decode_paging(g.payload_bits) == [(3, b"x")]
