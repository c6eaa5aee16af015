"""End-to-end app test: the loopback app binary (config -> PHY -> native ZMQ
bridge -> metrics) driven as a subprocess, like the reference's run scripts
drive apps/gnb."""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_loopback_app_runs_and_reports(tmp_path):
    cfg = tmp_path / "cell.yml"
    cfg.write_text("""
cell:
  bandwidth_mhz: 10
  pci: 7
  nof_ue: 2
  modulation: qam16
  target_rate: 0.4
""")
    trace = tmp_path / "trace.json"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "run_loopback_app.py"),
         str(cfg), "--slots", "3", "--snr", "25", "--port", "47821",
         "--trace", str(trace)],
        capture_output=True, text=True, timeout=300, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "TB success 6/6" in out.stdout, out.stdout
    assert "throughput" in out.stdout
    # Chrome trace written with dl/ul spans.
    import json
    doc = json.loads(trace.read_text())
    names = {e["name"] for e in doc["traceEvents"]}
    assert "dl_slot" in names and "ul_slot" in names


def test_loopback_app_with_edgeric_muapp(tmp_path):
    """App publishes per-TTI metrics to a live (fake) muApp and applies the
    RT-E2 round trip: the muApp computes MaxCQI-style weights from received
    metrics and the app reports the received policy at exit."""
    import pytest
    zmq = pytest.importorskip("zmq")
    import threading
    from srsran_edgeric_5g_tpu.runtime.protobufs import edgeric_pb2 as pb

    cfg = tmp_path / "cell.yml"
    cfg.write_text("cell:\n  bandwidth_mhz: 10\n  nof_ue: 2\n")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    seen = []

    def muapp():
        ctx = zmq.Context()
        sub = ctx.socket(zmq.SUB)
        sub.setsockopt(zmq.CONFLATE, 1)
        sub.setsockopt(zmq.SUBSCRIBE, b"")
        sub.setsockopt(zmq.RCVTIMEO, 30000)
        sub.connect("ipc:///tmp/metrics")
        pub = ctx.socket(zmq.PUB)
        pub.bind("ipc:///tmp/control_weights_actions")
        try:
            while True:
                m = pb.Metrics.FromString(sub.recv())
                seen.append(m)
                ues = sorted(m.ue_metrics, key=lambda u: -u.cqi)
                w = pb.SchedulingWeights(ran_index=m.tti_cnt)
                for i, u in enumerate(ues):
                    w.weights.extend([float(u.rnti), 1.0 if i == 0 else 0.1])
                pub.send(w.SerializeToString())
        except zmq.Again:
            pass
        finally:
            sub.close(linger=0)
            pub.close(linger=0)
            ctx.term()

    t = threading.Thread(target=muapp, daemon=True)
    t.start()
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "run_loopback_app.py"),
         str(cfg), "--slots", "6", "--snr", "25", "--port", "47823",
         "--edgeric"],
        capture_output=True, text=True, timeout=300, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "edgeric:" in out.stdout, out.stdout
    # The muApp saw real metrics...
    assert seen and all(len(m.ue_metrics) == 2 for m in seen)
    assert any(u.cqi > 0 for m in seen for u in m.ue_metrics)
    # ...and by the last TTIs the app received a normalized weight policy.
    assert "weights={" in out.stdout, out.stdout


def test_loopback_app_scheduled_mode(tmp_path):
    """--sched pf: MAC grants (RBG-quantized) drive the cached hetero PHY;
    every scheduled TB decodes and the layout cache stays small."""
    import re

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "run_loopback_app.py"),
         "--slots", "6", "--snr", "25", "--port", "47823",
         "--sched", "pf"],
        capture_output=True, text=True, timeout=300, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    m = re.search(r"TB success (\d+)/(\d+), (\d+) compiled", out.stdout)
    assert m, out.stdout
    assert m.group(1) == m.group(2) and int(m.group(2)) >= 6
    assert int(m.group(3)) <= 4          # RBG snap bounds the layouts
    assert "bytes served" in out.stdout


def test_loopback_app_harq_retx(tmp_path):
    """--ul-fade: a deep-fade slot forces UL CRC NACKs; the scheduler's
    HARQ loop (CRC indication -> rv-sequence retx grant -> soft-combined
    decode) recovers every TB over the radio bridge (VERDICT r3 item 5)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "run_loopback_app.py"),
         "--slots", "14", "--snr", "25", "--port", "47827",
         "--ul-traffic", "400", "--ul-fade", "4", "--ul-fade-snr", "5"],
        capture_output=True, text=True, timeout=420, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "HARQ retx rv=2 decoded (soft-combined)" in out.stdout, out.stdout
    assert "0 dropped, 0 in flight" in out.stdout, out.stdout


def test_loopback_app_dl_harq_retx(tmp_path):
    """--dl-fade: a UE-side PDSCH NACK drives the DL HARQ loop (ACK
    feedback -> rv-sequence retx grant -> UE soft-combined decode)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "run_loopback_app.py"),
         "--slots", "14", "--snr", "25", "--port", "47829",
         "--sched", "pf", "--dl-fade", "3", "--dl-fade-snr", "4"],
        capture_output=True, text=True, timeout=420, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "DL HARQ retx rv=" in out.stdout, out.stdout
    assert "(0 dropped, 0 in flight)" in out.stdout, out.stdout
