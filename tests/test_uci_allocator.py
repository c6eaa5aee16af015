"""UCI allocator behavior vs the reference's uci_allocator_impl.cpp."""

import numpy as np

from srsran_edgeric_5g_tpu.mac.scheduler import (
    CellScheduler, SchedulerConfig,
)
from srsran_edgeric_5g_tpu.mac.uci_allocator import (
    PucchResource, UciAllocator, default_resource_set,
)


def test_harq_ack_gets_distinct_f1_resources():
    """Two UEs ACKing on the same UL slot must hold different PUCCH F1
    resources (pucch_allocator resource indicator assignment)."""
    a = UciAllocator()
    r1 = a.alloc_harq_ack(10, 0x4601, k1_list=(4,))
    r2 = a.alloc_harq_ack(10, 0x4602, k1_list=(4,))
    assert r1.k1 == r2.k1 == 4
    assert r1.pucch_res_indicator != r2.pucch_res_indicator
    res1 = a.resource(r1.pucch_res_indicator)
    res2 = a.resource(r2.pucch_res_indicator)
    assert res1.format == res2.format == 1
    assert (res1.initial_cyclic_shift, res1.time_domain_occ) != (
        res2.initial_cyclic_shift, res2.time_domain_occ)


def test_harq_bit_idx_counts_per_ue_per_slot():
    """DAI: the second PDSCH ACKing on the same UCI slot gets bit index 1
    and REUSES the UE's resource (scheduled_dl_pdcch_counter)."""
    a = UciAllocator()
    r1 = a.alloc_harq_ack(10, 0x4601, k1_list=(4,))
    r2 = a.alloc_harq_ack(11, 0x4601, k1_list=(3, 4))
    # 11+3 == 10+4: same UCI slot preferred (min_pdsch_to_ack_slot_distance)
    assert r2.k1 == 3
    assert r1.harq_bit_idx == 0 and r2.harq_bit_idx == 1
    assert r2.pucch_res_indicator == r1.pucch_res_indicator


def test_ack_slot_monotonicity_floor():
    """TS 38.214 5.1: a later PDSCH may not ACK before an earlier PDSCH's
    assigned ACK slot — k1 candidates below the floor are skipped."""
    a = UciAllocator()
    r1 = a.alloc_harq_ack(10, 0x4601, k1_list=(7,))   # ACK at slot 17
    r2 = a.alloc_harq_ack(11, 0x4601, k1_list=(4, 5, 6, 7))
    assert 11 + r2.k1 >= 10 + r1.k1


def test_uci_on_pusch_multiplexing():
    """A PUSCH grant on the ACK slot absorbs the UCI: no PUCCH resource is
    claimed (alloc_uci_harq_ue_helper PUSCH skip), and an already-claimed
    resource is released when the PUSCH arrives later
    (multiplex_uci_on_pusch)."""
    a = UciAllocator()
    a.on_pusch_grant(14, 0x4601)
    r = a.alloc_harq_ack(10, 0x4601, k1_list=(4,))
    assert r.on_pusch and r.pucch_res_indicator is None
    # Reverse order: PUCCH first, then the PUSCH grant lands.
    r2 = a.alloc_harq_ack(11, 0x4602, k1_list=(4,))
    assert r2.pucch_res_indicator is not None
    a.on_pusch_grant(15, 0x4602)
    occ = a.occasions(15)
    assert occ[0x4602].on_pusch and occ[0x4602].res_indicator is None
    # The freed resource is claimable again.
    r3 = a.alloc_harq_ack(11, 0x4603, k1_list=(4,))
    assert r3.pucch_res_indicator == r2.pucch_res_indicator


def test_sr_skipped_on_pusch_and_csi_moves_to_pusch():
    a = UciAllocator()
    a.on_pusch_grant(5, 0x4601)
    assert a.alloc_sr(5, 0x4601) is None
    c = a.alloc_csi(5, 0x4601)
    assert c.on_pusch and c.pucch_res_indicator is None
    # Without a PUSCH: SR gets F1, CSI gets F2.
    s = a.alloc_sr(6, 0x4602)
    c2 = a.alloc_csi(6, 0x4602)
    assert a.resource(s.pucch_res_indicator).format == 1
    assert a.resource(c2.pucch_res_indicator).format == 2


def test_resource_exhaustion_falls_to_next_k1_then_fails():
    """With a single F1 resource, the second UE walks to the next k1
    candidate; with no candidates left the allocation FAILS (and the
    scheduler must drop the PDSCH grant)."""
    res = [PucchResource(res_id=0, format=1, prb=0)]
    a = UciAllocator(resources=res)
    r1 = a.alloc_harq_ack(10, 0x4601, k1_list=(4, 5))
    r2 = a.alloc_harq_ack(10, 0x4602, k1_list=(4, 5))
    assert r1.k1 == 4 and r2.k1 == 5
    assert a.alloc_harq_ack(10, 0x4603, k1_list=(4, 5)) is None


def test_non_ul_slots_skipped():
    a = UciAllocator(is_ul_slot=lambda s: s % 2 == 0)
    r = a.alloc_harq_ack(10, 0x4601, k1_list=(3, 4))
    assert (10 + r.k1) % 2 == 0


def test_slot_indication_garbage_collects():
    a = UciAllocator()
    a.alloc_harq_ack(10, 0x4601, k1_list=(4,))
    a.slot_indication(20)
    assert a.occasions(14) == {}


def test_scheduler_integration_fills_grant_uci_fields():
    """CellScheduler + UciAllocator: every DL grant carries k1/PUCCH
    resource, two UEs get distinct resources, and a UE with a PUSCH grant
    on the ACK slot rides it instead."""
    cfg = SchedulerConfig(nof_prb=52, policy="time_rr")
    sched = CellScheduler(cfg, [0x4601, 0x4602],
                          uci_allocator=UciAllocator())
    for r in (0x4601, 0x4602):
        sched.update_buffer(r, dl_bytes=5000, ul_bytes=0)
        sched.handle_csi(r, cqi=12)
    grants = sched.run_slot()
    assert len(grants) == 2
    assert all(g.k1 >= 4 for g in grants)
    assert grants[0].pucch_res != grants[1].pucch_res
    assert grants[0].harq_bit_idx == 0
    # Schedule ULs on the ACK slot of the next DL pass: pre-register via
    # run_slot_ul at that slot index.
    sched2 = CellScheduler(cfg, [0x4601], uci_allocator=UciAllocator())
    sched2.update_buffer(0x4601, dl_bytes=5000, ul_bytes=5000)
    sched2.handle_csi(0x4601, cqi=12)
    sched2._ul_slot = 4                       # the DL slot-0 ACK slot (k1=4)
    ul = sched2.run_slot_ul()
    assert ul, "UL grant expected"
    dl = sched2.run_slot()
    assert dl[0].pucch_res is None and dl[0].k1 == 4


def test_default_resource_set_shape():
    rs = default_resource_set()
    f1 = [r for r in rs if r.format == 1]
    f2 = [r for r in rs if r.format == 2]
    assert len(f1) == 8 and len(f2) == 8
    # F1 resources are separated in (cs, occ) space on a shared PRB.
    keys = {(r.initial_cyclic_shift, r.time_domain_occ) for r in f1}
    assert len(keys) == 8
    assert len({r.prb for r in f1}) == 1
    # F2 resources occupy distinct PRBs.
    assert len({r.prb for r in f2}) == 8
