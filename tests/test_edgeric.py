"""EdgeRIC RT-E2 agent: metrics PUB / weights SUB round trip + fail-open."""

import time
import uuid

import pytest

zmq = pytest.importorskip("zmq")

from srsran_edgeric_5g_tpu.runtime import edgeric
from srsran_edgeric_5g_tpu.runtime.protobufs import edgeric_pb2 as pb


@pytest.fixture
def endpoints(tmp_path):
    tag = uuid.uuid4().hex[:8]
    return (f"ipc://{tmp_path}/metrics-{tag}",
            f"ipc://{tmp_path}/weights-{tag}",
            f"ipc://{tmp_path}/mcs-{tag}")


def _fake_ric(ctx, metrics_ep, weights_ep):
    """RIC side: SUB metrics (conflate), PUB weights — the counterpart of
    edgeric-v2/edgeric_messenger.py."""
    sub = ctx.socket(zmq.SUB)
    sub.setsockopt(zmq.CONFLATE, 1)
    sub.setsockopt(zmq.SUBSCRIBE, b"")
    sub.connect(metrics_ep)
    pub = ctx.socket(zmq.PUB)
    pub.bind(weights_ep)
    return sub, pub


def test_metrics_weights_roundtrip(endpoints):
    m_ep, w_ep, mcs_ep = endpoints
    ctx = zmq.Context()
    agent = edgeric.EdgericAgent(m_ep, w_ep, mcs_ep, context=ctx)
    ric_sub, ric_pub = _fake_ric(ctx, m_ep, w_ep)
    time.sleep(0.2)   # PUB/SUB join

    # TTI 0: RAN publishes metrics; nothing from the RIC yet -> fail-open.
    agent.send_metrics([edgeric.UeReport(rnti=0x4601, cqi=11, snr=23.5,
                                         dl_tbs=9224.0),
                        edgeric.UeReport(rnti=0x4602, cqi=7, snr=12.0)])
    assert agent.get_weights([0x4601, 0x4602]) is None

    got = pb.Metrics.FromString(ric_sub.recv())
    assert got.tti_cnt == 0
    assert [u.rnti for u in got.ue_metrics] == [0x4601, 0x4602]
    assert got.ue_metrics[0].snr == pytest.approx(23.5)

    # RIC answers with flattened [rnti, weight] pairs echoing ran_index.
    w = pb.SchedulingWeights(ran_index=got.tti_cnt,
                             weights=[0x4601, 3.0, 0x4602, 1.0])
    ric_pub.send(w.SerializeToString())
    time.sleep(0.2)

    agent.send_metrics([edgeric.UeReport(rnti=0x4601)])
    out = agent.get_weights([0x4601, 0x4602])
    assert out is not None
    assert out[0x4601] == pytest.approx(0.75)   # normalized to sum 1
    assert out[0x4602] == pytest.approx(0.25)
    assert agent.weights_age == 2 - 0           # tti advanced twice

    # Next TTI: no fresh policy -> cleared (fail-open), not sticky.
    assert agent.get_weights([0x4601]) is None
    assert agent.weights_age is None

    agent.close()
    ric_sub.close(linger=0)
    ric_pub.close(linger=0)
    ctx.term()


def test_mcs_channel_and_unknown_rnti(endpoints):
    m_ep, w_ep, mcs_ep = endpoints
    ctx = zmq.Context()
    agent = edgeric.EdgericAgent(m_ep, w_ep, mcs_ep, context=ctx)
    pub = ctx.socket(zmq.PUB)
    pub.bind(mcs_ep)
    time.sleep(0.2)

    pub.send(pb.McsControl(ran_index=0,
                           mcs=[0x17, 21.0, 0x99, 5.0]).SerializeToString())
    time.sleep(0.2)
    out = agent.get_mcs([0x17])
    assert out == {0x17: 21}
    # A policy naming only unknown RNTIs is unusable -> fail-open None.
    pub.send(pb.McsControl(ran_index=1,
                           mcs=[0x42, 9.0]).SerializeToString())
    time.sleep(0.2)
    assert agent.get_mcs([0x17]) is None

    agent.close()
    pub.close(linger=0)
    ctx.term()
