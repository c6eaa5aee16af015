"""Scheduler-driven HARQ retransmissions (VERDICT r3 item 5).

The control loop of the reference's ue_cell_grid_allocator retx path +
cell_scheduler.cpp:60 handle_crc_indication: a CRC NACK marks the HARQ
process pending, the next scheduling pass emits a retransmission grant
FIRST (identical TBS, next rv of the 0,2,3,1 sequence), and the PHY decode
of the retransmission soft-combines with the stored rx_buffer state.

The e2e test proves the COMBINED decode path specifically: the operating
point (6.5 dB both transmissions, 64QAM r0.8) is chosen so the first
transmission fails alone, the retransmission fails alone from a fresh
buffer, and only the soft combination of both decodes the payload.
"""

import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.mac import scheduler as mac
from srsran_edgeric_5g_tpu.models import hetero_cell, pdsch
from srsran_edgeric_5g_tpu.ran import numerology as num


def _sched(nof_prb=52, **kw):
    cfg = mac.SchedulerConfig(nof_prb=nof_prb, **kw)
    return mac.CellScheduler(cfg, [0x4601, 0x4602])


# --------------------------------------------------- scheduler state machine

def test_retx_grant_same_tbs_rv_sequence():
    """NACK -> retx grants walk rv 0,2,3,1 with the original TBS/MCS; the
    TB is dropped after MAX_HARQ_RETX failed retransmissions."""
    s = _sched()
    s.handle_crc_indication(0x4601, 0, True)    # arm real HARQ tracking
    s.update_buffer(0x4601, ul_bytes=5000)
    g0 = s.run_slot_ul()[0]
    assert (g0.rv, g0.is_retx) == (0, False)

    seen_rvs = [g0.rv]
    g = g0
    for want_rv in (2, 3, 1, 1):                # rv_sequence then clamp
        s.handle_crc_indication(0x4601, g.pid, False)
        gs = [x for x in s.run_slot_ul() if x.rnti == 0x4601]
        assert len(gs) == 1
        g = gs[0]
        assert g.is_retx and g.pid == g0.pid
        assert (g.nof_prb, g.mcs, g.tbs) == (g0.nof_prb, g0.mcs, g0.tbs)
        assert g.rv == want_rv
        seen_rvs.append(g.rv)
    # 5 transmissions done (1 + MAX_HARQ_RETX): the next NACK drops the TB.
    s.handle_crc_indication(0x4601, g.pid, False)
    assert not any(x.is_retx for x in s.run_slot_ul())
    assert s.ues[0x4601].ul_harq.nof_dropped == 1
    assert seen_rvs == [0, 2, 3, 1, 1]


def test_ack_frees_process():
    s = _sched()
    s.handle_crc_indication(0x4601, 0, True)
    s.update_buffer(0x4601, ul_bytes=5000)
    g = s.run_slot_ul()[0]
    s.handle_crc_indication(0x4601, g.pid, True)
    p = s.ues[0x4601].ul_harq.procs[g.pid]
    assert not p.busy and not p.pending_retx


def test_retx_allocated_before_new_tx():
    """A pending retx preempts new transmissions in the PRB map and the
    NACKed UE gets no second (new-tx) grant that slot."""
    s = _sched()
    s.handle_crc_indication(0x4601, 0, True)
    s.update_buffer(0x4601, ul_bytes=3000)
    s.update_buffer(0x4602, ul_bytes=3000)
    gs = s.run_slot_ul()
    nacked = gs[0]
    s.handle_crc_indication(nacked.rnti, nacked.pid, False)
    for g in gs[1:]:
        s.handle_crc_indication(g.rnti, g.pid, True)
    s.update_buffer(0x4601, ul_bytes=3000)
    s.update_buffer(0x4602, ul_bytes=3000)
    gs2 = s.run_slot_ul()
    assert gs2[0].is_retx and gs2[0].rnti == nacked.rnti
    assert gs2[0].start_prb == 0                 # front of the PRB map
    assert [g for g in gs2 if g.rnti == nacked.rnti] == [gs2[0]]


def test_auto_ack_without_indications():
    """Callers that never report CRC (policy sims) must not starve: grants
    keep flowing every slot (mac_test_mode_adapter auto-ACK semantics)."""
    s = _sched()
    for _ in range(3 * mac.NOF_HARQ_PROCESSES):
        s.update_buffer(0x4601, ul_bytes=5000)
        assert any(g.rnti == 0x4601 for g in s.run_slot_ul())


# ----------------------------------------------------------- e2e soft combine

def _awgn(td, snr_db, rng):
    x = np.asarray(td)
    nv = float((np.abs(x) ** 2).mean()) * 10 ** (-snr_db / 10)
    noise = rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
    return jnp.asarray((x + noise * np.sqrt(nv / 2)).astype(np.complex64))


def test_scheduler_harq_combined_decode_e2e():
    """First tx fails (6.5 dB), scheduler NACK -> rv2 retx grant; the retx
    alone fails from a fresh buffer but the soft-COMBINED decode recovers
    the exact payload — proving the rx_buffer carry, not a fresh decode,
    is what decodes the TB.  (6.5/6.5 dB at 64QAM r0.8 is robust across
    seeds under the reference-exact wire decode: single shots fail 5/5,
    the combination decodes 5/5.)"""
    t = num.slot_timing(**num.CELL_10MHZ)
    cfg = pdsch.PdschConfig(rnti=0x4601, start_prb=0, nof_prb=12,
                            modulation="qam64", target_rate=0.8)
    proc = hetero_cell.HeteroCellProcessor(t, [cfg])
    rng = np.random.default_rng(0)      # seed-scanned: robust at 6.5/6.5
    pay = [jnp.asarray(rng.integers(0, 2, (1, n), dtype=np.int8))
           for n in proc.tbs]
    zeros = [jnp.zeros(proc.soft_buffer_shape(0), jnp.float32)]

    s = mac.CellScheduler(mac.SchedulerConfig(nof_prb=52), [0x4601])
    s.handle_crc_indication(0x4601, 0, True)     # arm HARQ tracking
    s.update_buffer(0x4601, ul_bytes=proc.tbs[0] // 8)

    # Slot n: new tx at rv0 through a bad channel -> CRC fails.
    g1 = s.run_slot_ul()[0]
    assert (g1.rv, g1.is_retx) == (0, False)
    rx1 = _awgn(proc.process_ul_tx_rv_slot(pay, (g1.rv,)), 6.5, rng)
    _, ok1, _, _, soft1 = proc.process_ul_harq_slot(rx1, zeros, (g1.rv,))[0]
    assert not np.asarray(ok1).any()
    s.handle_crc_indication(g1.rnti, g1.pid, bool(np.asarray(ok1).all()))

    # Slot n+1: the scheduler emits the retransmission grant.
    g2 = s.run_slot_ul()[0]
    assert g2.is_retx and g2.rv == 2 and g2.tbs == g1.tbs \
        and g2.pid == g1.pid
    rx2 = _awgn(proc.process_ul_tx_rv_slot(pay, (g2.rv,)), 6.5, rng)

    # The retransmission ALONE (fresh buffer) does not decode...
    _, ok_fresh, *_ = proc.process_ul_harq_slot(rx2, zeros, (g2.rv,))[0]
    assert not np.asarray(ok_fresh).any()
    # ...the soft-combined decode does, exactly.
    hat, ok_comb, _, _, _ = proc.process_ul_harq_slot(
        rx2, [soft1], (g2.rv,))[0]
    assert np.asarray(ok_comb).all()
    np.testing.assert_array_equal(np.asarray(hat), np.asarray(pay[0]))
    s.handle_crc_indication(g2.rnti, g2.pid, True)
    assert not s.ues[0x4601].ul_harq.procs[g2.pid].busy


def test_all_zero_decode_rejected():
    """The zero codeword passes LDPC parity and CRC(0)=0 — desegment_tb
    must not false-ACK it (an rv>=1-only reception with a zero-LLR
    systematic head can collapse there)."""
    from srsran_edgeric_5g_tpu.ops.ldpc import segmenter

    plan = segmenter.get_segment_plan(704, segmenter.BG1, 2048, 2)
    hard = jnp.zeros((plan.c, plan.k), jnp.int8)
    _, ok = segmenter.desegment_tb(hard, plan)
    assert not np.asarray(ok).any()
