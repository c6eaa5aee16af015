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
