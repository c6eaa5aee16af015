import json

import pytest

from srsran_edgeric_5g_tpu import config as cfg_mod
from srsran_edgeric_5g_tpu.utils import metrics, tracing


def test_config_defaults_and_derivation():
    c = cfg_mod.PhyConfig()
    assert c.nof_prb == 52 and c.nfft == 768 and c.srate == 11_520_000
    c20 = cfg_mod.PhyConfig(bandwidth_mhz=20, nof_ue=4)
    assert c20.nof_prb == 106 and c20.srate == 23_040_000
    cell = c20.cell_config()
    assert cell.nof_ue == 4 and cell.prb_per_ue == 26


def test_config_validation():
    with pytest.raises(ValueError, match="bandwidth"):
        cfg_mod.PhyConfig(bandwidth_mhz=7)
    with pytest.raises(ValueError, match="pci"):
        cfg_mod.PhyConfig(pci=5000)
    with pytest.raises(ValueError, match="UEs"):
        cfg_mod.PhyConfig(bandwidth_mhz=5, nof_ue=10)


def test_yaml_load(tmp_path):
    p = tmp_path / "cell.yml"
    p.write_text("""
# reference-style cell config
cell:
  bandwidth_mhz: 20
  pci: 77
  nof_ue: 4
  modulation: qam64
  center_freq_hz: 1842500000.0
""")
    c = cfg_mod.load(p)
    assert c.bandwidth_mhz == 20 and c.pci == 77 and c.modulation == "qam64"
    assert c.center_freq_hz == pytest.approx(1.8425e9)


def test_metrics_hub_and_sinks(tmp_path, capsys):
    hub = metrics.MetricsHub()
    out = tmp_path / "m.jsonl"
    hub.add_sink(metrics.JsonLinesSink(str(out)))
    hub.add_sink(metrics.StdoutSink(every=1))
    for slot in range(3):
        hub.report(metrics.SlotMetrics(slot=slot, ues=[
            metrics.UeSlotMetrics(rnti=0x4601, tb_crc_ok=True, tbs=8000,
                                  sinr_db=20.5, dl_bytes=1000),
            metrics.UeSlotMetrics(rnti=0x4602, tb_crc_ok=slot != 1, tbs=8000,
                                  sinr_db=15.0, dl_bytes=1000),
        ]))
    lines = out.read_text().splitlines()
    assert len(lines) == 3
    rec = json.loads(lines[0])
    assert rec["ues"][0]["rnti"] == 0x4601
    tp = hub.throughput_mbps()
    assert tp[0x4601] == pytest.approx(8.0)   # 1000 B/slot at 1000 slot/s
    assert tp[0x4602] == pytest.approx(8.0 * 2 / 3)
    assert "crc=OK" in capsys.readouterr().out


def test_tracer_writes_chrome_json(tmp_path):
    tr = tracing.EventTracer()
    tr.enable()
    with tr.span("process_pusch", slot=3):
        with tr.span("ldpc_decode"):
            pass
    tr.instant("crc_ok")
    path = tmp_path / "trace.json"
    tr.write(str(path))
    doc = json.loads(path.read_text())
    names = [e["name"] for e in doc["traceEvents"]]
    assert "process_pusch" in names and "ldpc_decode" in names and "crc_ok" in names
    assert all("ts" in e for e in doc["traceEvents"])


def test_tracer_disabled_is_noop():
    tr = tracing.EventTracer()
    with tr.span("x"):
        pass
    tr.instant("y")
    assert not tr._events


def test_config_delay_spread_plumbs_to_cell():
    from srsran_edgeric_5g_tpu import config as cfg_mod
    c = cfg_mod.from_dict({"cell": {"bandwidth_mhz": 10, "nof_ue": 2,
                                    "delay_spread_us": 1.5}})
    assert c.cell_config().delay_spread_us == 1.5
    import pytest
    with pytest.raises(ValueError):
        cfg_mod.from_dict({"cell": {"delay_spread_us": 99.0}})
