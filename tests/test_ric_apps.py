"""muApp3 monitor, muApp4 NeurWIN, and live algorithm switching."""

import time

import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ric import monitor as mon_mod
from srsran_edgeric_5g_tpu.ric import muapp, neurwin
from srsran_edgeric_5g_tpu.ric.switchboard import AlgorithmSwitch


def _ue_data(tx, cqis=None, bls=None):
    n = len(tx)
    cqis = cqis or [10] * n
    bls = bls or [1000] * n
    return {0x4601 + i: {"cqi": cqis[i], "snr": 20.0, "tx_bytes": tx[i],
                         "rx_bytes": 0, "dl_buffer": bls[i],
                         "ul_buffer": bls[i], "dl_tbs": 0.0}
            for i in range(n)}


# ------------------------------------------------------------------ muApp3

def test_monitor_moving_average():
    m = mon_mod.ThroughputMonitor(window=4)
    for tx in ([1000, 1000], [2000, 0], [0, 3000]):
        m.update(_ue_data(tx))
    # Totals in kbit: 16, 16, 24 -> MA over the 4-window = mean of all 3.
    assert m.ttis == 3
    np.testing.assert_allclose(m.total_moving_average[-1],
                               np.mean([16.0, 16.0, 24.0]))
    snap = m.snapshot("max_cqi")
    assert snap["algorithm"] == "max_cqi"
    assert snap["per_ue_kbit"][hex(0x4601)] == pytest.approx(8.0)
    assert "total MA" in m.render()


def test_monitor_over_the_wire(tmp_path):
    """muApp3 consumes the real metrics PUB/SUB (RAN agent -> monitor)."""
    import zmq
    from srsran_edgeric_5g_tpu.runtime import edgeric

    ctx = zmq.Context()
    m_ep = f"ipc://{tmp_path}/metrics-mon"
    w_ep = f"ipc://{tmp_path}/weights-mon"
    mcs_ep = f"ipc://{tmp_path}/mcs-mon"
    agent = edgeric.EdgericAgent(m_ep, w_ep, mcs_ep, context=ctx)
    from srsran_edgeric_5g_tpu.ric.messenger import RicMessenger
    msgr = RicMessenger(m_ep, f"ipc://{tmp_path}/w2-mon", mcs_ep,
                        context=ctx)
    time.sleep(0.2)  # PUB/SUB join
    reports = [edgeric.UeReport(rnti=0x4601 + i, cqi=10, snr=20.0,
                                tx_bytes=tx, ul_buffer=1000)
               for i, tx in enumerate([5000, 2500])]
    # The RAN keeps publishing per TTI while the monitor consumes (CONFLATE
    # keeps only the newest — a one-shot burst would starve the loop).
    import threading
    stop = threading.Event()

    def ran_loop():
        while not stop.is_set():
            agent.send_metrics(reports)
            time.sleep(0.005)

    th = threading.Thread(target=ran_loop, daemon=True)
    th.start()
    try:
        m = mon_mod.run(messenger=msgr, ttis=3, every=1)
    finally:
        stop.set()
        th.join()
    assert m.ttis == 3
    assert m.total_moving_average[-1] == pytest.approx(60.0)  # 7500B*8/1000
    msgr.close()
    agent.close()
    ctx.term()


# --------------------------------------------------------- live switching

class FakeMessenger:
    def __init__(self, ue_data):
        self.ue_data = ue_data
        self.sent = []

    def get_metrics(self, blocking=True, timeout_ms=1000):
        return len(self.sent), self.ue_data

    def send_scheduling_weight(self, ran_tti, weights):
        self.sent.append(dict(weights))


def test_live_algorithm_switching(tmp_path):
    """The muApp1 loop re-reads the switch every TTI (the redis
    'scheduling_algorithm' contract) and the weight pattern changes."""
    sw = AlgorithmSwitch(path=str(tmp_path / "algo"), default="max_cqi")
    ue = _ue_data([0, 0], cqis=[15, 3], bls=[100, 100])
    msgr = FakeMessenger(ue)
    app = muapp.MuAppScheduler(msgr, switch=sw)
    assert app.step()
    assert app.algorithm == "max_cqi"
    w1 = msgr.sent[-1]
    assert w1[0x4601] > w1[0x4602]          # best-CQI UE wins

    sw.set("fixed")
    assert app.step()
    assert app.algorithm == "fixed"
    w2 = msgr.sent[-1]
    assert w2[0x4601] == pytest.approx(0.3)  # fixed 0.3/0.7
    assert w2[0x4602] == pytest.approx(0.7)

    sw.set("round_robin")
    app.step()
    assert app.algorithm == "round_robin"


def test_switch_file_roundtrip(tmp_path):
    sw = AlgorithmSwitch(path=str(tmp_path / "k"), default="prop_fair")
    assert sw.get() == "prop_fair"          # no file yet -> default
    sw.set("max_weight")
    assert sw.get() == "max_weight"
    sw.clear()
    assert sw.get() == "prop_fair"


# ------------------------------------------------------------------ muApp4

def test_neurwin_training_and_policy(tmp_path):
    """NeurWIN learns a monotone index (more backlog -> higher index) on
    the digital-twin arm; the checkpoint round-trips into a muApp1-pluggable
    WhittleIndexPolicy with the 2/1/0 share mapping."""
    env = neurwin.ArmEnv(neurwin.ArmConfig(horizon=16, seed=1))
    net, history = neurwin.neurwin_train(env, episodes=300, batch_size=10,
                                         lr=2e-3, seed=1)
    assert len(history) == 300
    assert np.isfinite(history).all()

    import torch
    with torch.no_grad():
        hi = float(net.forward(np.array([200_000, 12], np.float32)
                               * neurwin.OBS_SCALE)[0])
        lo = float(net.forward(np.array([1_000, 3], np.float32)
                               * neurwin.OBS_SCALE)[0])
    assert hi > lo, (hi, lo)

    path = str(tmp_path / "windex.pt")
    neurwin.save_checkpoint(net, path)
    pol = neurwin.WhittleIndexPolicy(path)

    ue = _ue_data([0] * 4, cqis=[12, 5, 9, 11],
                  bls=[250_000, 500, 0, 40_000])
    w = pol(ue)
    assert sum(w.values()) == pytest.approx(1.0)
    # Empty-backlog UE (index -100) gets the floor share.
    assert w[0x4603] == min(w.values())
    # The big-backlog good-CQI UE out-ranks the tiny-backlog one.
    assert w[0x4601] > w[0x4602]
    # Top UE carries the 2-share (2.1/3.4), runner-up the 1-share.
    assert max(w.values()) == pytest.approx(2.1 / 3.4)

    # Plugs into the muApp1 loop as algorithm="whittle".
    msgr = FakeMessenger(ue)
    app = muapp.MuAppScheduler(msgr, algorithm="whittle", whittle_policy=pol)
    assert app.step()
    assert msgr.sent[-1] == w


def test_neurwin_cost_charging_shapes_index():
    """The index net's output is the break-even subsidy: states with zero
    service value should sit below states with high service value."""
    env = neurwin.ArmEnv(neurwin.ArmConfig(horizon=12, seed=3,
                                           arrival_bytes=2_000))
    net, _ = neurwin.neurwin_train(env, episodes=200, batch_size=10,
                                   lr=2e-3, seed=3)
    import torch
    with torch.no_grad():
        empty = float(net.forward(np.array([0, 15], np.float32)
                                  * neurwin.OBS_SCALE)[0])
        full = float(net.forward(np.array([300_000, 15], np.float32)
                                 * neurwin.OBS_SCALE)[0])
    assert full > empty
