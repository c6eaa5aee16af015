#!/usr/bin/env python3
"""Standalone gNB-PHY loopback app: config -> cell processor -> IQ bridge.

The apps/gnb counterpart in miniature: loads a YAML/defaults PhyConfig,
builds a CellProcessor, and runs N slots of DL->radio->UL loopback through
the native ZMQ IQ bridge (gNB TX REP server looped back to the gNB RX REQ
client, standing in for the GNU Radio flowgraph + UEs), printing per-slot
metrics like the reference's stdout plotter.

Usage: python tools/run_loopback_app.py [config.yml] [--slots N] [--snr dB]
"""

import argparse
import sys
import time

import numpy as np


def _radio_roundtrip(tx, rx, samples, snr_db, rng, total):
    """Push DL samples through the ZMQ bridge with AWGN, pull them back.
    Returns the received block or None on underflow."""
    import time as _time

    nv = float((np.abs(samples) ** 2).mean()) * 10 ** (-snr_db / 10)
    noise = rng.normal(size=samples.shape) + 1j * rng.normal(size=samples.shape)
    tx.push(samples + (noise * np.sqrt(nv / 2)).astype(np.complex64))
    got = np.empty(0, np.complex64)
    deadline = _time.time() + 5.0
    while len(got) < total and _time.time() < deadline:
        chunk = rx.pull(total - len(got))
        got = np.concatenate([got, chunk]) if len(chunk) else got
        if len(got) < total:
            _time.sleep(0.0005)
    return got if len(got) >= total else None


class _AttachingUe:
    """UE-side RA state machine for the --rach overlay (the srsue role:
    idle -> preamble -> RAR monitored -> Msg3 -> contention resolved)."""

    def __init__(self, preamble: int, ue_id48: int):
        self.state = "idle"
        self.preamble = preamble
        self.ue_id48 = ue_id48
        self.tc_rnti = None
        self.msg3_slot = None
        self.msg3_grant = None          # (start_prb, nof_prb, mcs)


def _rach_overlay_setup(cfg, cell, rng, n_ues: int):
    """PRACH occasion geometry + UE FSMs + the gNB RA procedure."""
    from srsran_edgeric_5g_tpu.mac import rach as rach_mod
    from srsran_edgeric_5g_tpu.ops import prach as prach_mod

    t = cell.timing
    pcfg = prach_mod.PrachConfig(root_sequence_index=1,
                                 zero_correlation_zone=13)
    info = prach_mod.prach_ofdm_info(int(t.srate))
    rcfg = rach_mod.RachConfig(bwp_prbs=cfg.nof_prb)
    proc = rach_mod.RachProcedure(rcfg)
    ues = [_AttachingUe(preamble=7 + 11 * u,
                        ue_id48=int(rng.integers(0, 1 << 48)))
           for u in range(n_ues)]
    return pcfg, info, rcfg, proc, ues


def run_scheduled(args, cfg, cell, tx, rx, er_sink, notifier, slot_clock,
                  rng):
    """The scheduled cell: MAC grants (policy + EdgeRIC overrides) drive a
    cached heterogeneous-allocation PHY slot-by-slot — the cell_scheduler
    run_slot -> FAPI -> PDSCH sequence of the reference, with the jitted
    hetero program cached per RBG-quantized grant layout.

    With --rach N the cell starts EMPTY: N UEs attach through the full
    random-access procedure over the radio loop (PRACH occasion -> detect ->
    RAR PDSCH at RA-RNTI -> Msg3 PUSCH -> contention resolution -> the UE
    enters the scheduler), the reference's prach_sch/ra_sch slot sequence
    (cell_scheduler.cpp:117-138) + mac_ctrl UE creation."""
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.mac import scheduler as mac
    from srsran_edgeric_5g_tpu.models.hetero_cell import HeteroCellProcessor
    from srsran_edgeric_5g_tpu.models.pdsch import PdschConfig
    from srsran_edgeric_5g_tpu.utils.bits import from_device_complex, \
        to_device_complex

    def _hetero(key, cfgs):
        if key not in procs:
            procs[key] = HeteroCellProcessor(t, cfgs)
        return procs[key]

    t = cell.timing
    rach_n = getattr(args, "rach", 0)
    rntis = ([] if rach_n
             else [0x4601 + u for u in range(cell.nof_ue)])
    scfg = mac.SchedulerConfig(
        nof_prb=cfg.nof_prb,
        policy="time_rr" if args.sched == "rr" else "time_pf",
        rbg_size=mac.rbg_size_for_bwp(cfg.nof_prb))
    sched = mac.CellScheduler(scfg, rntis)
    from srsran_edgeric_5g_tpu.runtime.edgeric import cqi_from_sinr_db
    for r in rntis:
        sched.handle_csi(r, cqi_from_sinr_db(args.snr), args.snr)
    # Uneven traffic so policies visibly differ: UE u gets ~(u+1) shares.
    mean_arrival = {r: 2000 * (u + 1) for u, r in enumerate(rntis)}
    procs: dict[tuple, HeteroCellProcessor] = {}
    agent = er_sink.agent if er_sink is not None else None
    ok_count = tb_count = 0
    bytes_served = dict.fromkeys(rntis, 0)
    # DL HARQ stores: gNB keeps the in-flight TB (to re-encode at the next
    # rv), the UE keeps its soft buffer (dl_harq_process soft combining).
    # PUCCH-reported ACK/NACK feeds sched.handle_dl_ack.
    dl_harq_tb: dict = {}
    dl_ue_soft: dict = {}
    dl_retx = dl_retx_ok = dl_dropped = 0
    dl_faded = False
    sched.enable_harq()              # this loop plumbs DL ACK + UL CRC

    if rach_n:
        from srsran_edgeric_5g_tpu.mac import rach as rach_mod
        from srsran_edgeric_5g_tpu.ops import prach as prach_mod
        from srsran_edgeric_5g_tpu.ran import tbs as tbs_mod
        pcfg, pinfo, rcfg, ra_proc, att_ues = _rach_overlay_setup(
            cfg, cell, rng, rach_n)
        prach_cache: dict[int, np.ndarray] = {}
        msg4_queue: list = []
        attached = []

        def _msg3_cfg(start, length, mcs_idx, rnti):
            m = tbs_mod.mcs_config(mcs_idx, "qam64")
            return PdschConfig(rnti=rnti, nof_prb=length, start_prb=start,
                               modulation=m.modulation,
                               target_rate=m.target_rate)

    bcch_on = getattr(args, "bcch", False)
    if bcch_on:
        from srsran_edgeric_5g_tpu.mac import bcch as bcch_mod
        si_sched = bcch_mod.SiScheduler(bcch_mod.SiConfig())
        # Short DRX cycle so paging occasions land within the run.
        pg_sched = bcch_mod.PagingScheduler(
            bcch_mod.PagingConfig(drx_cycle_frames=2))
        sib1_rx = paging_rx = 0
        paged_ids: list[int] = []

    ul_mean = getattr(args, "ul_traffic", 0)
    if ul_mean:
        from srsran_edgeric_5g_tpu.mac import ul_procedures as ulp
        from srsran_edgeric_5g_tpu.ops import ofdm as ofdm_mod
        from srsran_edgeric_5g_tpu.ops import pucch as pucch_mod
        sr_cfg = ulp.SrConfig()
        ue_q: dict = {}                  # UE-side queues (bytes)
        ul_served: dict = {}
        sr_sent = sr_det = bsr_rx = ul_tb = ul_ok = 0
        # HARQ stores (keyed (rnti, pid)): the UE keeps the MAC PDU it must
        # retransmit; the gNB keeps the accumulated soft buffer
        # (rx_buffer_pool reservation).  CRC results feed
        # sched.handle_crc_indication -> retx grants at the next rv.
        harq_ue_tb: dict = {}            # UE side: in-flight payload
        harq_gnb_soft: dict = {}         # gNB side: (C, N_cb) soft state
        ul_retx = ul_retx_ok = ul_dropped = 0
        ul_faded = False
        sched.enable_harq()              # this loop plumbs CRC indications

    t0 = time.time()
    for slot in range(args.slots):
        if slot_clock.advance(slot) is None:
            continue

        if bcch_on and slot == 3:
            # A page arrives from the core (CU-CP Paging over NG): enqueue
            # it; the scheduler serves it at the UE's TS 38.304 occasion.
            pg_sched.page_ue(7, b"page7")
            paged_ids.append(7)

        if ul_mean:
            # ---- UL data leg: SR -> UL grant -> PUSCH w/ BSR MAC CE ----
            # (ue_scheduling ul_sched + mac_ul counterpart; see
            # mac/ul_procedures.py)
            ue_list = list(sched.ues)
            for r in ue_list:
                ue_q[r] = ue_q.get(r, 0) + int(rng.poisson(ul_mean))
                ul_served.setdefault(r, 0)
            ul_grants = sched.run_slot_ul()
            ul_td = np.zeros(t.cp.total, np.complex64)
            ul_active = False
            proc_u = None
            if ul_grants:
                ukey = ("ul",) + tuple(
                    (g.rnti, g.start_prb, g.nof_prb, g.qm, g.target_rate)
                    for g in ul_grants)
                proc_u = _hetero(ukey, sched.to_pdsch_configs(ul_grants))
                pls = []
                for g, cap in zip(ul_grants, proc_u.tbs):
                    if g.is_retx:
                        # The UE retransmits the stored MAC PDU at the
                        # granted rv (same TBS by construction).
                        pls.append(harq_ue_tb[(g.rnti, g.pid)])
                        ul_retx += 1
                        continue
                    take = min(ue_q[g.rnti], ulp.sdu_capacity(cap))
                    sdu = rng.integers(0, 256, take,
                                       dtype=np.uint8).tobytes()
                    ue_q[g.rnti] -= take
                    pl = jnp.asarray(ulp.build_ul_mac_pdu(
                        ue_q[g.rnti], sdu, cap)[None])
                    harq_ue_tb[(g.rnti, g.pid)] = pl
                    pls.append(pl)
                ul_td += from_device_complex(proc_u.process_ul_tx_rv_slot(
                    pls, tuple(g.rv for g in ul_grants)))
                ul_active = True
            sr_ues = []
            if sr_cfg.is_occasion(slot):
                granted = {g.rnti for g in ul_grants}
                for i, r in enumerate(ue_list):
                    if ue_q[r] > 0 and r not in granted:
                        f0c = pucch_mod.Pucch01Config(
                            n_id=cell.n_id, slot=slot % 10,
                            start_symbol=sr_cfg.start_symbol,
                            nof_symbols=sr_cfg.nof_symbols, initial_cs=0,
                            prb=sr_cfg.prb)
                        grid = np.zeros((t.nsymb, t.nof_subc), np.complex64)
                        grid[sr_cfg.start_symbol,
                             12 * sr_cfg.prb:12 * (sr_cfg.prb + 1)] += \
                            np.asarray(pucch_mod.format0_generate(
                                f0c, sr_cfg.m0_of_ue(i)))[0]
                        ul_td += from_device_complex(ofdm_mod.modulate_slot(
                            jnp.asarray(grid), t))
                        sr_ues.append(i)
                        sr_sent += 1
                ul_active = ul_active or bool(sr_ues)
            # --ul-fade: one deep-fade slot (low SNR) forcing CRC NACKs so
            # the HARQ retx loop is exercised over the radio bridge.  The
            # fade hits the first slot at/after the given index that
            # actually carries a new-tx PUSCH.
            fade_now = (args.ul_fade >= 0 and not ul_faded
                        and slot >= args.ul_fade
                        and any(not g.is_retx for g in ul_grants))
            if fade_now:
                ul_faded = True
            ul_snr = args.ul_fade_snr if fade_now else args.snr
            got_u = (_radio_roundtrip(tx, rx, ul_td, ul_snr, rng,
                                      t.cp.total) if ul_active else None)
            if got_u is not None:
                if sr_cfg.is_occasion(slot) and sr_ues:
                    rx_grid = np.asarray(ofdm_mod.demodulate_slot(
                        to_device_complex(got_u), t))
                    res = rx_grid[sr_cfg.start_symbol,
                                  12 * sr_cfg.prb:12 * (sr_cfg.prb + 1)]
                    f0c = pucch_mod.Pucch01Config(
                        n_id=cell.n_id, slot=slot % 10,
                        start_symbol=sr_cfg.start_symbol,
                        nof_symbols=sr_cfg.nof_symbols, initial_cs=0,
                        prb=sr_cfg.prb)
                    cands = tuple(sr_cfg.m0_of_ue(i)
                                  for i in range(len(ue_list)))
                    metrics, _ = pucch_mod.format0_detect(
                        to_device_complex(res[None]), f0c, cands)
                    for i, m in enumerate(np.asarray(metrics)):
                        if float(m) > 0.4:
                            r = ue_list[i]
                            sr_det += 1
                            sched.update_buffer(r, ul_bytes=max(
                                sched.ues[r].ul_buffer,
                                sr_cfg.sr_grant_bytes))
                if proc_u is not None:
                    softs = [harq_gnb_soft.get((g.rnti, g.pid)) if g.is_retx
                             else None for g in ul_grants]
                    softs = [s if s is not None
                             else jnp.zeros(proc_u.soft_buffer_shape(i),
                                            jnp.float32)
                             for i, s in enumerate(softs)]
                    outs = proc_u.process_ul_harq_slot(
                        to_device_complex(got_u), softs,
                        tuple(g.rv for g in ul_grants))
                    for g, (hat, okb, _, _, soft_new) in zip(ul_grants,
                                                             outs):
                        ul_tb += 1
                        good = bool(np.asarray(okb).all())
                        sched.handle_crc_indication(g.rnti, g.pid, good)
                        if not good:
                            # rx_buffer carry for the soft-combined retx.
                            harq_gnb_soft[(g.rnti, g.pid)] = soft_new
                            p = sched.ues[g.rnti].ul_harq.procs[g.pid]
                            if not p.busy:       # dropped at max retx
                                ul_dropped += 1
                                harq_ue_tb.pop((g.rnti, g.pid), None)
                                harq_gnb_soft.pop((g.rnti, g.pid), None)
                            continue
                        ul_ok += 1
                        if g.is_retx:
                            ul_retx_ok += 1
                            print(f"slot {slot}: HARQ retx rv={g.rv} "
                                  f"decoded (soft-combined) for "
                                  f"rnti={g.rnti:#x}", flush=True)
                        harq_ue_tb.pop((g.rnti, g.pid), None)
                        harq_gnb_soft.pop((g.rnti, g.pid), None)
                        reported, sdu = ulp.parse_ul_mac_pdu(
                            np.asarray(hat).reshape(-1))
                        bsr_rx += 1
                        ul_served[g.rnti] += len(sdu)
                        # The BSR overrides the scheduler's decayed view
                        # with the UE's true remaining queue.
                        sched.update_buffer(g.rnti, ul_bytes=reported)

        ctrl_dl = None                # (kind, payload) control-plane PDSCH
        if rach_n:
            # ---- UL leg: PRACH occasion + Msg3 PUSCH over the radio ----
            total = t.cp.total
            occasion = (slot % 10 == 5)
            ul_td = np.zeros(total, np.complex64)
            ul_active = False
            for ue in att_ues:
                if ue.state == "idle" and occasion:
                    if ue.preamble not in prach_cache:
                        w = prach_mod.ofdm_modulate_prach(
                            prach_mod.generate(pcfg, ue.preamble), pinfo)
                        prach_cache[ue.preamble] = np.asarray(w)
                    w = prach_cache[ue.preamble]
                    ul_td[:len(w)] += w
                    ue.state = "wait_rar"
                    ul_active = True
                elif ue.state == "wait_msg3" and slot == ue.msg3_slot:
                    m3p = _hetero(("msg3", ue.tc_rnti, ue.msg3_grant),
                                  [_msg3_cfg(*ue.msg3_grant, ue.tc_rnti)])
                    bits = rach_mod.encode_msg3_ccch(ue.ue_id48)
                    pl = np.zeros((1, m3p.tbs[0]), np.int8)
                    pl[0, :len(bits)] = bits
                    m3_td = m3p.process_ul_tx_slot([jnp.asarray(pl)])
                    ul_td = ul_td + from_device_complex(m3_td)
                    ue.state = "wait_conres"
                    ul_active = True
            got_ul = (_radio_roundtrip(tx, rx, ul_td, args.snr, rng, total)
                      if ul_active else None)
            # ---- gNB: PRACH detection (uplink_processor -> MAC rach
            # indication) ----
            if occasion and got_ul is not None:
                win = got_ul[:pinfo.cp_samples
                             + pinfo.n_reps * pinfo.dft_size]
                freq = prach_mod.ofdm_demodulate_prach(
                    to_device_complex(win), pinfo)
                det = prach_mod.detect(freq, pcfg)
                for p in np.nonzero(np.asarray(det.detected))[0]:
                    delay_s = (float(np.asarray(det.delays)[p])
                               / (pcfg.l_ra * 1250.0))
                    ra_proc.handle_prach_detection(slot, int(p), delay_s)
                    print(f"slot {slot}: PRACH preamble {int(p)} detected",
                          flush=True)
            # ---- gNB: ra_scheduler::run_slot (RAR + Msg3 grants) ----
            rar, msg3_due = ra_proc.run_slot(slot)
            for m in msg3_due:
                if got_ul is None:
                    ra_proc.handle_msg3_crc(m.tc_rnti, False, None)
                    continue
                grant = (m.start_prb, m.nof_prb, m.mcs)
                m3p = _hetero(("msg3", m.tc_rnti, grant),
                              [_msg3_cfg(*grant, m.tc_rnti)])
                hat, okb, _, _ = m3p.process_ul_slot(
                    to_device_complex(got_ul))[0]
                conn = ra_proc.handle_msg3_crc(
                    m.tc_rnti, bool(np.asarray(okb).all()), np.asarray(hat))
                if conn is not None:
                    # mac_ctrl UE creation: the UE joins the scheduler.
                    sched.ues[conn.c_rnti] = mac.SchedUe(rnti=conn.c_rnti)
                    sched.handle_csi(conn.c_rnti, cqi_from_sinr_db(args.snr),
                                     args.snr)
                    bytes_served[conn.c_rnti] = 0
                    mean_arrival[conn.c_rnti] = 2000 * len(bytes_served)
                    msg4_queue.append((conn.c_rnti, conn.msg4_bits))
                    attached.append(conn.c_rnti)
                    print(f"slot {slot}: Msg3 ok, UE rnti={conn.c_rnti:#x} "
                          f"connected", flush=True)
            if rar is not None:
                ctrl_dl = ("rar", rar)
            elif msg4_queue:
                ctrl_dl = ("msg4", msg4_queue.pop(0))

        if bcch_on and ctrl_dl is None:
            # SIB1/SI + paging occasions (cell_scheduler.cpp:123-126,:137).
            g = si_sched.run_slot(slot) or pg_sched.run_slot(slot)
            if g is not None:
                ctrl_dl = ("bcch", g)

        if ctrl_dl is not None:
            # Control-plane PDSCH (RAR at RA-RNTI / Msg4 conres at C-RNTI)
            # takes this slot's DL; UE side decodes and advances its FSM.
            kind, item = ctrl_dl
            if kind == "rar":
                rnti, bits = item.ra_rnti, item.payload_bits
            elif kind == "bcch":
                rnti, bits = item.rnti, item.payload_bits
            else:
                rnti, bits = item
            # ~30 payload bits/PRB at QPSK r0.12: size the control PDSCH to
            # the PDU (a multi-subPDU RAR grows with the occasion's load).
            n_prb = max(4, -(-len(bits) // 30) + 1)
            c_cfg = PdschConfig(rnti=rnti, nof_prb=n_prb, start_prb=0,
                                modulation="qpsk", target_rate=0.12)
            cp_ = _hetero(("ctrl", rnti, n_prb), [c_cfg])
            pl = np.zeros((1, cp_.tbs[0]), np.int8)
            pl[0, :len(bits)] = bits
            td = cp_.process_dl_slot([jnp.asarray(pl)])
            got = _radio_roundtrip(tx, rx, from_device_complex(td),
                                   args.snr, rng, t.cp.total)
            if got is None:
                notifier.on_underflow(slot)
                continue
            hat, okb, _, _ = cp_.process_dl_rx_slot(
                to_device_complex(got))[0]
            if not bool(np.asarray(okb).all()):
                continue
            hat = np.asarray(hat).reshape(-1)
            if kind == "bcch":
                # UE side: verify the broadcast payload round-trips.
                from srsran_edgeric_5g_tpu.mac import bcch as bcch_mod
                nb = len(item.payload_bits)
                assert (hat[:nb] == item.payload_bits).all(), item.kind
                if item.kind == "sib1":
                    sib1_rx += 1
                elif item.kind == "paging":
                    recs = bcch_mod.decode_paging(hat)
                    got_ids = [i for i, _ in recs]
                    print(f"slot {slot}: paging occasion, UE ids "
                          f"{got_ids}", flush=True)
                    paging_rx += len(recs)
                continue
            if kind == "rar":
                for sub in rach_mod.decode_rar_pdu(hat):
                    for ue in att_ues:
                        if ue.state == "wait_rar" and \
                                ue.preamble == sub.rapid:
                            ue.tc_rnti = sub.tc_rnti
                            start, length = rach_mod.riv_type1_decode(
                                sub.ul_grant.riv, rcfg.bwp_prbs)
                            ue.msg3_grant = (start, length, sub.ul_grant.mcs)
                            ue.msg3_slot = slot + rcfg.msg3_delay_slots
                            ue.state = "wait_msg3"
            else:
                ue_id = rach_mod.decode_msg4_conres(hat)
                for ue in att_ues:
                    if ue.state == "wait_conres" and ue.ue_id48 == ue_id:
                        ue.state = "connected"
                        print(f"slot {slot}: contention resolved for "
                              f"rnti={ue.tc_rnti:#x}", flush=True)
            continue

        active = list(sched.ues)
        for r in active:
            sched.update_buffer(
                r, dl_bytes=sched.ues[r].dl_buffer
                + int(rng.poisson(mean_arrival[r])))
        weights = agent.get_weights(active) if agent else None
        mcs_ovr = agent.get_mcs(active) if agent else None
        grants = sched.run_slot(weights=weights, mcs_overrides=mcs_ovr)
        if agent:
            agent.send_metrics(sched.ue_reports())
        if not grants:
            continue
        key = tuple((g.rnti, g.start_prb, g.nof_prb, g.qm, g.target_rate)
                    for g in grants)
        if key not in procs:
            procs[key] = HeteroCellProcessor(t, sched.to_pdsch_configs(grants))
        proc = procs[key]
        payloads = []
        for g, n in zip(grants, proc.tbs):
            if g.is_retx:
                # gNB re-encodes the stored TB at the granted rv.
                payloads.append(dl_harq_tb[(g.rnti, g.pid)])
                dl_retx += 1
            else:
                pl = jnp.asarray(rng.integers(0, 2, (1, n), dtype=np.int8))
                dl_harq_tb[(g.rnti, g.pid)] = pl
                payloads.append(pl)
        td = proc.process_dl_rv_slot(payloads, tuple(g.rv for g in grants))
        # --dl-fade: force a DL NACK -> PUCCH ACK feedback -> retx grant.
        fade_dl = (args.dl_fade >= 0 and not dl_faded
                   and slot >= args.dl_fade
                   and any(not g.is_retx for g in grants))
        if fade_dl:
            dl_faded = True
        got = _radio_roundtrip(tx, rx, from_device_complex(td),
                               args.dl_fade_snr if fade_dl else args.snr,
                               rng, t.cp.total)
        if got is None:
            notifier.on_underflow(slot)
            continue
        # UE-side PDSCH receivers decode the DL (srsue role) with HARQ
        # soft combining: DL BLER, ACK/NACK feedback and the CQI feedback
        # below are exercised as actual DL.
        softs = [dl_ue_soft.get((g.rnti, g.pid)) if g.is_retx else None
                 for g in grants]
        softs = [s if s is not None
                 else jnp.zeros(proc.soft_buffer_shape(i), jnp.float32)
                 for i, s in enumerate(softs)]
        outs = proc.process_dl_rx_harq_slot(
            to_device_complex(got), softs, tuple(g.rv for g in grants))
        for g, (payload, ok, nv_est, _, soft_new), want in zip(grants, outs,
                                                               payloads):
            tb_count += 1
            good = bool(np.asarray(ok).all())
            ok_count += int(good)
            # The UE's HARQ-ACK reaches the scheduler (PUCCH UCI path).
            sched.handle_dl_ack(g.rnti, g.pid, good)
            if good:
                bytes_served[g.rnti] += g.tbs // 8
                if g.is_retx:
                    dl_retx_ok += 1
                    assert (np.asarray(payload) == np.asarray(want)).all()
                    print(f"slot {slot}: DL HARQ retx rv={g.rv} decoded "
                          f"(soft-combined) for rnti={g.rnti:#x}",
                          flush=True)
                dl_harq_tb.pop((g.rnti, g.pid), None)
                dl_ue_soft.pop((g.rnti, g.pid), None)
            else:
                dl_ue_soft[(g.rnti, g.pid)] = soft_new
                p = sched.ues[g.rnti].dl_harq.procs[g.pid]
                if not p.busy:                   # dropped at max retx
                    dl_dropped += 1
                    dl_harq_tb.pop((g.rnti, g.pid), None)
                    dl_ue_soft.pop((g.rnti, g.pid), None)
            nv_u = float(np.asarray(nv_est).reshape(-1)[0])
            sinr = -10.0 * np.log10(max(nv_u, 1e-12))
            sched.handle_csi(g.rnti, cqi_from_sinr_db(sinr), sinr)
    dt = time.time() - t0
    print(f"sched[{args.sched}] done: {args.slots} slots in {dt:.2f}s, "
          f"TB success {ok_count}/{tb_count}, "
          f"{len(procs)} compiled grant layouts", flush=True)
    print("bytes served:",
          {hex(r): b for r, b in bytes_served.items()}, flush=True)
    if agent is not None:
        print(f"edgeric: {agent.tti} TTIs; last weights age "
              f"{agent.weights_age}", flush=True)
    # Delivery criterion: every DL TB either decoded first try or was
    # recovered by the HARQ retx loop (nothing dropped or stranded).
    ok = dl_dropped == 0 and not dl_harq_tb
    if dl_retx or dl_dropped:
        print(f"dl harq: retx {dl_retx_ok}/{dl_retx} recovered "
              f"({dl_dropped} dropped, {len(dl_harq_tb)} in flight)",
              flush=True)
    if args.dl_fade >= 0:
        ok = ok and dl_retx_ok >= 1
    if ul_mean:
        print(f"ul: {ul_ok}/{ul_tb} PUSCH ok, {bsr_rx} BSRs, SR "
              f"{sr_det}/{sr_sent} detected, HARQ retx "
              f"{ul_retx_ok}/{ul_retx} recovered ({ul_dropped} dropped, "
              f"{len(harq_ue_tb)} in flight), served "
              f"{ {hex(r): b for r, b in ul_served.items()} }, residual "
              f"queues { {hex(r): q for r, q in ue_q.items()} }", flush=True)
        # Every transmitted TB must be delivered — first try or via the
        # HARQ retx loop (nothing dropped, nothing stranded in flight).
        ok = ok and ul_dropped == 0 and not harq_ue_tb and bsr_rx > 0 \
            and sr_det == sr_sent and sum(ul_served.values()) > 0
        if args.ul_fade >= 0:
            ok = ok and ul_retx_ok >= 1     # the fade forced a real retx
    if bcch_on:
        print(f"bcch: {sib1_rx} SIB1 decoded, {paging_rx} paging records "
              f"received (paged {paged_ids})", flush=True)
        ok = ok and sib1_rx >= 1 + (args.slots - 1) // 20 \
            and paging_rx == len(paged_ids)
    if rach_n:
        states = {ue.state for ue in att_ues}
        print(f"rach: {len(attached)}/{rach_n} UEs attached "
              f"(rntis {[hex(r) for r in attached]}), UE states {states}",
              flush=True)
        ok = ok and len(attached) == rach_n and states == {"connected"} \
            and tb_count > 0
    return 0 if ok else 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--slots", type=int, default=20)
    ap.add_argument("--snr", type=float, default=25.0)
    ap.add_argument("--port", type=int, default=47655)
    ap.add_argument("--trace", default=None, help="write chrome trace JSON")
    ap.add_argument("--edgeric", action="store_true",
                    help="publish per-TTI metrics to an EdgeRIC muApp "
                         "(ipc:///tmp/metrics) and poll policy channels")
    ap.add_argument("--bcch", action="store_true",
                    help="schedule SIB1/SI broadcast + TS 38.304 paging "
                         "occasions in the slot loop (SI-RNTI/P-RNTI "
                         "PDSCH, UE-side decode); implies --sched")
    ap.add_argument("--ul-traffic", type=int, default=0,
                    help="mean UL bytes/slot/UE: drives the SR -> UL grant "
                         "-> PUSCH+BSR loop (PUCCH F0 SR occasions, TS "
                         "38.321 short-BSR MAC CE, scheduler run_slot_ul); "
                         "implies --sched")
    ap.add_argument("--ul-fade", type=int, default=-1, dest="ul_fade",
                    help="slot index hit by a deep fade (--ul-fade-snr): "
                         "forces UL CRC NACKs so the scheduler's HARQ "
                         "retx loop (CRC indication -> rv-sequence retx "
                         "grant -> soft-combined decode) runs over the "
                         "radio bridge; -1 = off")
    ap.add_argument("--ul-fade-snr", type=float, default=3.0,
                    dest="ul_fade_snr")
    ap.add_argument("--dl-fade", type=int, default=-1, dest="dl_fade",
                    help="like --ul-fade for the DL: forces a UE-side "
                         "PDSCH NACK so the DL HARQ loop (ACK feedback -> "
                         "retx grant -> UE soft-combined decode) runs")
    ap.add_argument("--dl-fade-snr", type=float, default=3.0,
                    dest="dl_fade_snr")
    ap.add_argument("--rach", type=int, default=0,
                    help="start the cell EMPTY and attach N UEs via the "
                         "full random-access procedure (PRACH occasion -> "
                         "RAR -> Msg3 -> contention resolution) before "
                         "they carry scheduled traffic; implies --sched")
    ap.add_argument("--sched", choices=("off", "rr", "pf"), default="off",
                    help="run the MAC scheduler per slot: grants (RBG-"
                         "quantized, EdgeRIC-weight steerable) drive a "
                         "cached hetero-allocation PHY instead of the "
                         "fixed equal split")
    ap.add_argument("--run-ahead", type=int, default=2, dest="run_ahead",
                    help="slots of DL run-ahead (the reference's "
                         "nof_slot_tti_in_advance, downlink_processor_"
                         "baseband_impl.cpp:47): DL compute for slot s+K is "
                         "dispatched before slot s finishes UL, and UL "
                         "results sync two slots late — JAX async dispatch "
                         "overlaps device compute with the radio IO.  0 = "
                         "fully serial slot loop")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu import config as cfg_mod
    from srsran_edgeric_5g_tpu.utils.bits import from_device_complex, to_device_complex
    from srsran_edgeric_5g_tpu.models.cell_processor import CellProcessor
    from srsran_edgeric_5g_tpu.runtime import (
        IqRxClient, IqTxServer, RadioEventNotifier, SlotClock, SlotDeadline,
        fail_open)
    from srsran_edgeric_5g_tpu.utils.metrics import StdoutSink
    from srsran_edgeric_5g_tpu.utils.tracing import l1_tracer

    cfg = cfg_mod.load(args.config) if args.config else cfg_mod.PhyConfig()
    cell = cfg.cell_config()
    proc = CellProcessor(cell, pci=cfg.pci)
    proc.metrics.add_sink(StdoutSink(every=max(1, args.slots // 10)))
    er_sink = None
    if args.edgeric:
        from srsran_edgeric_5g_tpu.runtime import edgeric
        er_sink = edgeric.EdgericMetricsSink(edgeric.EdgericAgent())
        proc.metrics.add_sink(er_sink)
    if args.trace:
        l1_tracer.enable()

    t = cell.timing
    addr = f"tcp://127.0.0.1:{args.port}"
    tx = IqTxServer(addr, chunk=t.cp.total)
    rx = IqRxClient(addr.replace("*", "localhost"), chunk=t.cp.total)

    # Failure detection (SURVEY §5): radio event counters, skipped-slot
    # tracking, and a real-time budget check over a generous host-IO
    # run-ahead (this app is a functional loopback, not the bench).
    notifier = RadioEventNotifier(log=lambda s: print(f"[radio] {s}",
                                                      flush=True))
    slot_clock = SlotClock(notifier)
    rt_deadline = SlotDeadline(t.cp.total / t.srate, run_ahead=5000,
                               notifier=notifier)

    rng = np.random.default_rng(0)
    tbs = proc.tbs
    print(f"cell: {cfg.bandwidth_mhz} MHz / {cfg.nof_prb} PRB, "
          f"{cell.nof_ue} UEs x {cell.prb_per_ue} PRB, TBS {tbs}, "
          f"srate {t.srate/1e6:.2f} Msps", flush=True)

    if (args.rach or args.bcch or args.ul_traffic) and args.sched == "off":
        args.sched = "pf"
    if args.sched != "off":
        code = run_scheduled(args, cfg, cell, tx, rx, er_sink, notifier,
                             slot_clock, rng)
        rx.stop()
        tx.stop()
        if er_sink is not None:
            er_sink.agent.close()
        return code

    # Pipelined slot loop (default): DL for up to `run_ahead` future slots
    # is dispatched (JAX async) before the current slot's radio roundtrip,
    # and UL results are synced `depth` slots late — the streaming operating
    # mode the reference gets from nof_slot_tti_in_advance + its 4-executor
    # lower PHY (lower_phy_baseband_processor.h:40-197).  --run-ahead=0
    # degenerates to the old fully-serial loop (same code path).
    from collections import deque

    run_ahead = max(0, args.run_ahead)
    depth = 2 if run_ahead else 0
    dl_q: deque = deque()   # (slot, deadline token, device samples)
    ul_q: deque = deque()   # (slot, token, submit time, device result)
    lat_ms: list[float] = []
    ok_count = 0
    next_dl = 0
    t0 = time.time()

    def dispatch_dl():
        nonlocal next_dl
        slot = next_dl
        next_dl += 1
        if slot_clock.advance(slot) is None:
            return  # stale request — counted LATE, dropped (puxch rule)
        payloads = jnp.asarray(
            rng.integers(0, 2, (cell.nof_ue, tbs), dtype=np.int8))
        dl_q.append((slot, rt_deadline.start(), proc.process_dl_slot(payloads)))

    def sync_ul(min_inflight):
        nonlocal ok_count
        while len(ul_q) > min_inflight:
            slot, tok, t_sub, res = ul_q.popleft()
            if res is None:
                continue  # UL processing error — counted, cell stays up
            _, tb_ok = res
            okv = np.asarray(tb_ok)
            ok_count += int(okv.sum())
            if not okv.all():
                print(f"slot {slot}: CRC failures {np.nonzero(~okv)[0]}",
                      flush=True)
            rt_deadline.finish(slot, tok)
            lat_ms.append((time.time() - t_sub) * 1e3)

    while next_dl < args.slots or dl_q:
        while next_dl < args.slots and len(dl_q) <= run_ahead:
            dispatch_dl()
        if not dl_q:
            break
        slot, tok, td = dl_q.popleft()
        # Radio out through the native bridge and back (the loopback "RF").
        got = _radio_roundtrip(tx, rx, from_device_complex(td), args.snr,
                               rng, t.cp.total)
        if got is None:
            # Radio underflow: count the event and skip the slot's UL
            # (the reference notifies and keeps the cell alive).
            notifier.on_underflow(slot)
            continue
        res = fail_open(notifier, slot,
                        lambda: proc.process_ul_slot(to_device_complex(got)))
        ul_q.append((slot, tok, time.time(), res))
        sync_ul(depth)
    sync_ul(0)

    dt = time.time() - t0
    rx.stop()
    tx.stop()
    n = args.slots * cell.nof_ue
    tp = proc.metrics.throughput_mbps()
    print(f"done: {args.slots} slots in {dt:.2f}s "
          f"({args.slots / dt:.1f} slot/s incl. host IO), "
          f"TB success {ok_count}/{n}", flush=True)
    if lat_ms:
        print(f"slot latency (radio-roundtrip submit -> UL decoded, "
              f"run-ahead {run_ahead}): p50 "
              f"{float(np.percentile(lat_ms, 50)):.2f} ms / p99 "
              f"{float(np.percentile(lat_ms, 99)):.2f} ms", flush=True)
    print(f"radio events: {notifier.events.as_dict()}", flush=True)
    print("throughput (Mbit/s @1k slots/s):",
          {hex(k): round(v, 2) for k, v in tp.items()}, flush=True)
    if er_sink is not None:
        print(f"edgeric: {er_sink.agent.tti} TTIs published; last policy: "
              f"weights={er_sink.weights} mcs={er_sink.mcs} "
              f"(None = fail-open)", flush=True)
        er_sink.agent.close()
    if args.trace:
        l1_tracer.write(args.trace)
        print(f"trace written to {args.trace}", flush=True)
    return 0 if ok_count == n else 1


if __name__ == "__main__":
    sys.exit(main())
