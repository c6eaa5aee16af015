"""UL scheduling procedures: SR occasions, BSR codec, app e2e loop.

Counterpart of the reference's SR/BSR-driven ul_sched chain
(lib/scheduler/ue_scheduling, lib/mac/mac_ul)."""

import os
import pathlib
import subprocess
import sys

import numpy as np

from srsran_edgeric_5g_tpu.mac import ul_procedures as ulp


def test_bsr_table():
    """TS 38.321 Table 6.1.3.1-1 round trips at the bounds."""
    assert ulp.bsr_index(0) == 0 and ulp.bsr_bytes(0) == 0
    assert ulp.bsr_index(10) == 1 and ulp.bsr_index(11) == 2
    assert ulp.bsr_index(150000) == 30
    assert ulp.bsr_index(10 ** 9) == 31
    for q in (1, 17, 999, 149999):
        i = ulp.bsr_index(q)
        assert ulp.bsr_bytes(i) >= q
        assert i == 1 or ulp.bsr_bytes(i - 1) < q


def test_ul_mac_pdu_roundtrip():
    rng = np.random.default_rng(0)
    sdu = rng.integers(0, 256, 100, dtype=np.uint8).tobytes()
    pdu_bits = 8 * (5 + 100) + 13          # ragged tail -> zero pad
    bits = ulp.build_ul_mac_pdu(4321, sdu, pdu_bits)
    assert bits.size == pdu_bits
    reported, got = ulp.parse_ul_mac_pdu(bits)
    assert got == sdu
    assert reported == ulp.bsr_bytes(ulp.bsr_index(4321)) >= 4321
    assert ulp.sdu_capacity(pdu_bits) == 100 + 1


def test_sr_occasions():
    sr = ulp.SrConfig(period=10, offset=3)
    assert sr.is_occasion(3) and sr.is_occasion(13)
    assert not sr.is_occasion(4)
    assert {sr.m0_of_ue(i) for i in range(4)} == {0, 3, 6, 9}


def test_loopback_app_sr_bsr(tmp_path):
    """SR -> UL grant -> PUSCH+BSR through the real PHY in the app loop."""
    repo = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(repo)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    out = subprocess.run(
        [sys.executable, str(repo / "tools" / "run_loopback_app.py"),
         "--slots", "25", "--ul-traffic", "600", "--port", "47924"],
        capture_output=True, text=True, timeout=500, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("ul:")]
    assert line, out.stdout
    # All UL TBs decoded, at least one SR detected, BSRs flowing.
    assert " 0 BSRs" not in line[0] and "SR 0/" not in line[0], line[0]
