"""Native IQ bridge: ring buffer, ZMQ loopback, file capture/replay."""

import numpy as np
import pytest

pytest.importorskip("ctypes")

from srsran_edgeric_5g_tpu.runtime import iqbridge


def test_builds_and_loads():
    assert iqbridge.lib() is not None


def test_ring_roundtrip():
    ring = iqbridge.IqRing(1024)
    rng = np.random.default_rng(0)
    data = (rng.normal(size=300) + 1j * rng.normal(size=300)).astype(np.complex64)
    assert ring.write(data) == 300
    assert len(ring) == 300
    out = ring.read(300)
    np.testing.assert_array_equal(out, data)
    assert len(ring) == 0
    ring.close()


def test_ring_wraparound_and_capacity():
    ring = iqbridge.IqRing(100)
    rng = np.random.default_rng(1)
    total_in, total_out = [], []
    for i in range(10):
        chunk = (rng.normal(size=37) + 1j * rng.normal(size=37)).astype(np.complex64)
        wrote = ring.write(chunk)
        total_in.append(chunk[:wrote])
        total_out.append(ring.read(37))
    np.testing.assert_array_equal(np.concatenate(total_in),
                                  np.concatenate(total_out))
    ring.close()


def test_zmq_tx_rx_loopback():
    """TX REP server <- REQ client: the reference's zmq radio sample path."""
    addr = "tcp://127.0.0.1:47611"
    tx = iqbridge.IqTxServer(addr, chunk=256)
    rx = iqbridge.IqRxClient(addr, chunk=256)
    rng = np.random.default_rng(2)
    data = (rng.normal(size=2048) + 1j * rng.normal(size=2048)).astype(np.complex64)
    tx.push(data)

    import time
    got = []
    deadline = time.time() + 10.0
    while sum(len(g) for g in got) < 2048 and time.time() < deadline:
        chunk = rx.pull(2048)
        if len(chunk):
            got.append(chunk)
        else:
            time.sleep(0.01)
    rx.stop()
    tx.stop()
    received = np.concatenate(got) if got else np.empty(0, np.complex64)
    assert len(received) == 2048, len(received)
    np.testing.assert_array_equal(received, data)


def test_file_capture_replay(tmp_path):
    rng = np.random.default_rng(3)
    data = (rng.normal(size=500) + 1j * rng.normal(size=500)).astype(np.complex64)
    path = tmp_path / "capture.cf32"
    assert iqbridge.iq_file_write(path, data) == 500
    back = iqbridge.iq_file_read(path, 1000)
    np.testing.assert_array_equal(back, data)
