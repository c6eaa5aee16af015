"""Failure detection / radio events (runtime/events.py) — the counterparts
of the reference's puxch late-request rule, ru radio notifier counters,
cell_scheduler skipped-slot fast-forward, and the upper-PHY fail-open
error handler."""

from srsran_edgeric_5g_tpu.runtime import (RadioEventNotifier, SlotClock,
                                           SlotDeadline, fail_open)


def test_slot_clock_skip_and_late():
    logs = []
    n = RadioEventNotifier(log=logs.append)
    clk = SlotClock(n)
    assert clk.advance(10) == []          # first slot establishes the clock
    assert clk.advance(11) == []          # in sequence
    assert clk.advance(14) == [12, 13]    # forward jump -> skipped counted
    assert n.events.skipped_slots == 2
    assert clk.advance(12) is None        # already passed -> LATE, dropped
    assert n.events.late == 1
    assert clk.advance(15) == []          # clock resynced after the jump
    assert any(s.startswith("skip") for s in logs)
    assert any(s.startswith("L ") for s in logs)


def test_slot_deadline():
    n = RadioEventNotifier()
    now = [0.0]
    dl = SlotDeadline(1e-3, run_ahead=4, notifier=n, clock=lambda: now[0])
    tok = dl.start()
    now[0] += 3e-3
    assert dl.finish(0, tok)              # within 4 slots of budget
    tok = dl.start()
    now[0] += 5e-3
    assert not dl.finish(1, tok)          # missed -> LATE
    assert n.events.late == 1


def test_fail_open_and_counters():
    n = RadioEventNotifier()

    def boom():
        raise ValueError("phy error")

    assert fail_open(n, 7, boom, fallback="default") == "default"
    assert fail_open(n, 8, lambda x: x + 1, 41) == 42
    n.on_underflow(3)
    n.on_overflow(4)
    assert n.events.as_dict() == {"late": 0, "underflow": 1, "overflow": 1,
                                  "skipped_slots": 0, "errors": 1}
    assert n.events.total() == 3
