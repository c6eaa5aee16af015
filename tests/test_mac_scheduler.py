"""MAC scheduler: policies, EdgeRIC overrides, and the scheduled-PHY loop."""

import numpy as np
import pytest

from srsran_edgeric_5g_tpu.mac import scheduler as mac
from srsran_edgeric_5g_tpu.ran import tbs as tbs_mod


def make_sched(nof_prb=52, policy="time_pf", **kw):
    cfg = mac.SchedulerConfig(nof_prb=nof_prb, policy=policy, **kw)
    return mac.CellScheduler(cfg, [0x4601, 0x4602])


# ---------------------------------------------------------------- link adapt

def test_mcs_from_cqi_monotone_and_bounds():
    prev = 0
    for cqi in range(1, 16):
        m = mac.mcs_from_cqi(cqi)
        assert m is not None and m >= prev
        # the chosen MCS never exceeds the CQI's spectral efficiency —
        # except CQI 1, which sits below MCS 0 and falls back to it
        c = tbs_mod.mcs_config(m)
        if cqi > 1:
            assert c.qm * c.target_rate <= mac.CQI_EFFICIENCY[cqi] + 1e-9
        else:
            assert m == 0
        prev = m
    assert mac.mcs_from_cqi(0) is None
    assert mac.mcs_from_cqi(15) >= 25   # near top of the 64QAM table


def test_prbs_for_bytes_is_minimal():
    m = tbs_mod.mcs_config(15)
    n = mac.prbs_for_bytes(200, m, 12, 12, 52)
    assert tbs_mod.tbs_for_alloc(n, 12, 12, m) >= 1600
    if n > 1:
        assert tbs_mod.tbs_for_alloc(n - 1, 12, 12, m) < 1600


# ------------------------------------------------------------------ policies

def test_rr_equal_split_and_rotation():
    s = make_sched(policy="time_rr")
    for r in s.ues:
        s.update_buffer(r, dl_bytes=10**6)   # both saturated
    g0 = s.run_slot()
    assert [g.rnti for g in g0] == [0x4601, 0x4602]
    assert all(g.nof_prb == 26 for g in g0)          # 52 // 2
    g1 = s.run_slot()
    assert [g.rnti for g in g1] == [0x4602, 0x4601]  # rotated start


def test_rr_skips_empty_buffers():
    s = make_sched(policy="time_rr")
    s.update_buffer(0x4601, dl_bytes=500)
    g = s.run_slot()
    assert [x.rnti for x in g] == [0x4601]
    assert tbs_mod.tbs_for_alloc(g[0].nof_prb, 12, 12,
                                 tbs_mod.mcs_config(g[0].mcs)) >= 8 * 500


def test_pf_fairness_vs_max_rate():
    """prio = est_rate / avg^coeff: at coeff=0 the better-CQI UE always wins
    (pure max-rate); at coeff=1.5 both UEs get slots and the strong UE still
    moves more bytes (proportional fairness)."""
    def run(coeff):
        s = make_sched(policy="time_pf", fairness_coeff=coeff)
        s.handle_csi(0x4601, cqi=15)
        s.handle_csi(0x4602, cqi=5)
        first = {r: 0 for r in s.ues}
        for _ in range(50):
            for r in s.ues:
                s.update_buffer(r, dl_bytes=10**7)   # keep both saturated
            g = s.run_slot()
            first[g[0].rnti] += 1
        return first, {r: u.tx_bytes for r, u in s.ues.items()}

    first, _ = run(0.0)
    # max-rate: strong wins every slot except the avg=0 bootstrap (prio=inf
    # for a never-served UE, scheduler_time_pf.cpp:299)
    assert first[0x4601] >= 49
    first, bytes_ = run(1.5)
    assert first[0x4601] > 0 and first[0x4602] > 0   # both served
    assert bytes_[0x4601] > bytes_[0x4602]           # strong still ahead


def test_pf_zero_cqi_ue_not_scheduled():
    s = make_sched()
    s.handle_csi(0x4602, cqi=0)
    for r in s.ues:
        s.update_buffer(r, dl_bytes=10**6)
    g = s.run_slot()
    assert [x.rnti for x in g] == [0x4601]


# ------------------------------------------------------- EdgeRIC overrides

def test_weight_override_splits_prbs():
    """n_prbs = w * unused_crbs (ue_cell_grid_allocator.cpp:296-305)."""
    s = make_sched()
    for r in s.ues:
        s.update_buffer(r, dl_bytes=10**6)
    g = s.run_slot(weights={0x4601: 0.3, 0x4602: 0.7})
    by = {x.rnti: x.nof_prb for x in g}
    assert by[0x4601] == int(0.3 * 52)
    assert by[0x4602] == int(0.7 * 52)


def test_weight_override_clamped_by_data_need():
    """min(w*unused, calc_prbs): a tiny buffer caps the granted width."""
    s = make_sched()
    s.update_buffer(0x4601, dl_bytes=50)        # needs ~1 PRB at MCS28
    s.update_buffer(0x4602, dl_bytes=10**6)
    g = s.run_slot(weights={0x4601: 0.9, 0x4602: 0.1})
    by = {x.rnti: x.nof_prb for x in g}
    assert by[0x4601] <= 3                       # not 0.9*52
    assert by[0x4602] == int(0.1 * 52)


def test_mcs_override_and_fail_open():
    s = make_sched()
    s.update_buffer(0x4601, dl_bytes=10**6)
    g = s.run_slot(mcs_overrides={0x4601: 5})
    assert g[0].mcs == 5
    assert g[0].qm == tbs_mod.mcs_config(5).qm
    # fail-open: nothing passed -> link adaptation decides again
    s.update_buffer(0x4601, dl_bytes=10**6)
    g = s.run_slot()
    assert g[0].mcs == mac.mcs_from_cqi(15)


def test_pf_average_tracks_reference_recursion():
    """save_dl_alloc: plain average for the first 1/alpha samples
    (scheduler_time_pf.cpp:388-392)."""
    u = mac.SchedUe(rnti=1)
    for k, b in enumerate([100, 200, 300]):
        u.save_dl_alloc(b, alpha=0.01)
    assert u.dl_avg_rate == pytest.approx(200.0)
    assert u.dl_nof_samples == 3


# ------------------------------------------------- grants drive the PHY

def test_grants_through_hetero_phy_loopback():
    """Scheduler grants -> PdschConfig -> one DL+UL slot, payload-exact."""
    import jax.numpy as jnp
    from srsran_edgeric_5g_tpu.models import hetero_cell
    from srsran_edgeric_5g_tpu.ran import numerology as num

    s = make_sched(nof_prb=52, policy="time_rr", mcs_table="qam64")
    s.handle_csi(0x4601, cqi=9)
    s.handle_csi(0x4602, cqi=14)
    for r in s.ues:
        s.update_buffer(r, dl_bytes=10**6)
    grants = s.run_slot()
    assert len(grants) == 2 and grants[0].qm != grants[1].qm

    t = num.slot_timing(**num.CELL_10MHZ)
    cfgs = s.to_pdsch_configs(grants)
    proc = hetero_cell.HeteroCellProcessor(t, cfgs)
    assert proc.tbs == [g.tbs for g in grants]   # TBS math agrees end-to-end

    rng = np.random.default_rng(7)
    payloads = [jnp.asarray(rng.integers(0, 2, (1, n), dtype=np.int8))
                for n in proc.tbs]
    td = proc.process_dl_slot(payloads)
    x = np.asarray(td)
    # 30 dB: CQI 14 link-adapts to ~0.85-rate 64QAM, which needs headroom
    nv = float((np.abs(x) ** 2).mean()) * 10 ** (-30 / 10)
    noise = rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
    rx = jnp.asarray((x + noise * np.sqrt(nv / 2)).astype(np.complex64))
    # DL closes through the UE-side PDSCH receiver (srsue role).
    for (payload, ok, *_), want in zip(proc.process_dl_rx_slot(rx), payloads):
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(payload), np.asarray(want))


# ------------------------------------------- RIC algorithms (muApp1 parity)

def _ue_data(cqis, bls, tx=None):
    return {0x4601 + i: {"cqi": c, "snr": 0.0, "tx_bytes": (tx or [0] * len(cqis))[i],
                         "rx_bytes": 0, "dl_buffer": 0, "ul_buffer": b,
                         "dl_tbs": 0.0}
            for i, (c, b) in enumerate(zip(cqis, bls))}


def test_muapp_algorithms():
    from srsran_edgeric_5g_tpu.ric import muapp

    d = _ue_data([15, 7], [1000, 3000])
    assert muapp.fixed_weights(d) == {0x4601: 0.3, 0x4602: 0.7}
    w = muapp.max_cqi_weights(d)
    assert w[0x4601] == pytest.approx(0.9) and w[0x4602] == pytest.approx(0.1)
    w = muapp.max_weight_weights(d)
    # w_i ∝ (cqi/Σcqi)(bl/Σbl): [15/22 * 1/4, 7/22 * 3/4]
    assert w[0x4602] / w[0x4601] == pytest.approx((7 * 3) / (15 * 1))
    w, avg = muapp.prop_fair_weights(d, {})
    assert sum(w.values()) == pytest.approx(1.0, abs=0.02)
    w0, cnt = muapp.round_robin_weights(d, 0)
    w1, cnt = muapp.round_robin_weights(d, cnt)
    assert w0[0x4601] > w0[0x4602] and w1[0x4602] > w1[0x4601]
    # CQI 0 anywhere -> equal-split fallback in every algorithm
    d0 = _ue_data([0, 7], [1, 1])
    for fn in (muapp.max_cqi_weights, muapp.max_weight_weights):
        assert set(fn(d0).values()) == {0.5}


# ------------------------------------------------- closed RAN<->RIC loop

def test_scheduler_muapp_closed_loop(tmp_path):
    """CellScheduler + EdgericAgent <-> RicMessenger + MuAppScheduler over
    real ipc ZMQ: weights steer the PRB split; killing the RIC fails open."""
    zmq = pytest.importorskip("zmq")
    import time
    import uuid

    from srsran_edgeric_5g_tpu.ric import muapp
    from srsran_edgeric_5g_tpu.ric.messenger import RicMessenger
    from srsran_edgeric_5g_tpu.runtime import edgeric

    tag = uuid.uuid4().hex[:8]
    eps = tuple(f"ipc://{tmp_path}/{n}-{tag}"
                for n in ("metrics", "weights", "mcs"))
    ctx = zmq.Context()
    agent = edgeric.EdgericAgent(*eps, context=ctx)
    ric = muapp.MuAppScheduler(RicMessenger(*eps, context=ctx),
                               algorithm="max_cqi")
    time.sleep(0.3)   # PUB/SUB join

    s = make_sched(policy="time_rr")
    s.handle_csi(0x4601, cqi=14)
    s.handle_csi(0x4602, cqi=6)
    rntis = list(s.ues)
    last = None
    for _ in range(4):   # a few TTIs for the round trip to settle
        for r in rntis:
            s.update_buffer(r, dl_bytes=10**6)
        w = agent.get_weights(rntis)             # EdgeRIC recv
        grants = s.run_slot(weights=w)
        agent.send_metrics(s.ue_reports())       # EdgeRIC send
        assert ric.step(blocking=True, timeout_ms=2000)
        last = (w, grants)
    w, grants = last
    assert w is not None                          # policy arrived
    by = {g.rnti: g.nof_prb for g in grants}
    assert by[0x4601] == int(0.9 * 52)            # max_cqi high weight
    assert by[0x4602] == int(0.1 * 52)

    # RIC stops answering -> fail-open to the default equal-split RR.
    # (drain the last in-flight reply first; the NEXT poll must be empty)
    time.sleep(0.2)
    agent.get_weights(rntis)
    for r in rntis:
        s.update_buffer(r, dl_bytes=10**6)
    assert agent.get_weights(rntis) is None
    grants = s.run_slot(weights=None)
    assert all(g.nof_prb == 26 for g in grants)

    agent.close()
    ric.msgr.close()
    ctx.term()


def test_ul_scheduling_pass():
    """run_slot_ul: same policies over ul_buffer with independent UL PF
    state; DL state untouched."""
    s = make_sched(policy="time_pf")
    s.update_buffer(0x4601, ul_bytes=10**6)
    s.update_buffer(0x4602, ul_bytes=500)
    g = s.run_slot_ul()
    # both bootstrap at prio=inf; the tie-break UE takes its full need (the
    # whole BWP for the saturated buffer), the other waits for slot 2
    assert [x.rnti for x in g] == [0x4601]
    assert g[0].nof_prb == 52
    assert s.ues[0x4601].ul_avg_rate > 0
    assert s.ues[0x4601].dl_avg_rate == 0        # directions independent
    assert s.ues[0x4601].rx_bytes > 0
    g2 = s.run_slot_ul()                         # now UE2's inf prio wins
    assert g2[0].rnti == 0x4602
    # grant is MINIMAL for 500 bytes at the link-adapted MCS: its TBS covers
    # the buffer and one PRB fewer would not (prbs_for_bytes linear scan).
    mcs = tbs_mod.mcs_config(g2[0].mcs, s.cfg.mcs_table)
    assert tbs_mod.tbs_for_alloc(g2[0].nof_prb, s.cfg.nof_symbols,
                                 s.cfg.nof_dmrs_re_per_prb, mcs) >= 8 * 500
    assert tbs_mod.tbs_for_alloc(g2[0].nof_prb - 1, s.cfg.nof_symbols,
                                 s.cfg.nof_dmrs_re_per_prb, mcs) < 8 * 500
    assert s.ues[0x4602].ul_buffer == 0          # drained by the grant


def test_grant_layout_churn_bounded():
    """PF under Poisson traffic + CQI walk must produce a BOUNDED set of
    RBG-quantized grant layouts (each distinct layout = one jitted
    hetero-PHY compilation): the discovery curve converges instead of
    growing linearly (tools/sched_churn.py measured 76 layouts / 5000
    slots, 66 by slot 1000, top-5 covering 56%)."""
    from srsran_edgeric_5g_tpu.mac import scheduler as mac
    from srsran_edgeric_5g_tpu.runtime.edgeric import cqi_from_sinr_db

    rng = np.random.default_rng(0)
    rntis = [0x4601 + u for u in range(4)]
    scfg = mac.SchedulerConfig(nof_prb=106, policy="time_pf",
                               rbg_size=mac.rbg_size_for_bwp(106))
    s = mac.CellScheduler(scfg, rntis)
    sinr = {r: 25.0 for r in rntis}
    for r in rntis:
        s.handle_csi(r, cqi_from_sinr_db(25.0), 25.0)
    seen = set()
    first_half = None
    n_slots = 1000
    for slot in range(n_slots):
        for i, r in enumerate(rntis):
            s.update_buffer(r, dl_bytes=s.ues[r].dl_buffer
                            + int(rng.poisson(2000 * (i + 1))))
        grants = s.run_slot()
        if grants:
            seen.add(tuple((g.rnti, g.start_prb, g.nof_prb, g.qm,
                            g.target_rate) for g in grants))
        if slot == n_slots // 2:
            first_half = len(seen)
        for r in rntis:
            sinr[r] = float(np.clip(sinr[r] + rng.uniform(-0.5, 0.5),
                                    18.0, 30.0))
            s.handle_csi(r, cqi_from_sinr_db(sinr[r]), sinr[r])
    # Hard cap (regression guard: unbounded churn would blow past this)
    # and convergence (second half adds a small fraction).
    assert len(seen) <= 96, len(seen)
    assert len(seen) - first_half <= first_half // 2, (first_half, len(seen))


def test_mcs_hysteresis_damps_flapping():
    """mcs_hysteresis keeps the applied MCS until CQI moves far enough."""
    from srsran_edgeric_5g_tpu.mac import scheduler as mac
    scfg = mac.SchedulerConfig(nof_prb=52, mcs_hysteresis=4)
    s = mac.CellScheduler(scfg, [0x4601])
    s.update_buffer(0x4601, dl_bytes=10**6)
    s.handle_csi(0x4601, cqi=9)
    m0 = s.run_slot()[0].mcs
    s.update_buffer(0x4601, dl_bytes=10**6)
    s.handle_csi(0x4601, cqi=10)        # small move: held
    assert s.run_slot()[0].mcs == m0
    s.update_buffer(0x4601, dl_bytes=10**6)
    s.handle_csi(0x4601, cqi=14)        # big move: tracks
    assert s.run_slot()[0].mcs != m0
