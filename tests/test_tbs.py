import pytest

from srsran_edgeric_5g_tpu.ops.ldpc import segmenter
from srsran_edgeric_5g_tpu.ran import tbs as tbs_mod


def test_mcs_tables():
    m = tbs_mod.mcs_config(0, "qam64")
    assert m.qm == 2 and m.target_rate == pytest.approx(120 / 1024)
    m = tbs_mod.mcs_config(28, "qam64")
    assert m.qm == 6 and m.target_rate == pytest.approx(948 / 1024)
    m = tbs_mod.mcs_config(27, "qam256")
    assert m.qm == 8 and m.target_rate == pytest.approx(948 / 1024)
    with pytest.raises(ValueError):
        tbs_mod.mcs_config(29, "qam64")  # reserved


def test_small_tbs_lands_on_table_values():
    import numpy as np
    table = tbs_mod._tables()[0]
    for nre, rate, qm in [(100, 0.3, 2), (300, 0.5, 4), (64, 0.12, 2)]:
        v = tbs_mod.tbs(nre, rate, qm)
        assert v in table


def test_large_tbs_byte_aligned_and_segmentable():
    """Big TBS values must segment cleanly (B' divisible by C) — the property
    the LDPC segmenter asserts."""
    for nof_prb, mcs_idx in [(52, 15), (106, 27), (106, 10), (24, 5)]:
        m = tbs_mod.mcs_config(mcs_idx, "qam64")
        a = tbs_mod.tbs_for_alloc(nof_prb, 12, nof_dmrs_re_per_prb=12, mcs=m)
        assert a % 8 == 0
        bg = segmenter.select_base_graph(a, m.target_rate)
        g_total = tbs_mod.nof_re(nof_prb, 12, 12) * m.qm
        plan = segmenter.get_segment_plan(a, bg, g_total, m.qm)  # must not raise
        assert plan.k_prime <= plan.k


def test_known_tbs_value():
    """Spot value: 106 PRB, 12 symbols, 12 DMRS RE/PRB, MCS27 qam256
    => a large multi-CB TBS in the expected range."""
    m = tbs_mod.mcs_config(27, "qam256")
    a = tbs_mod.tbs_for_alloc(106, 12, 12, m)
    assert 100_000 < a < 130_000
    assert (a + 24) % 8 == 0


def test_riv_roundtrip_exhaustive():
    """RIV encode/decode (TS 38.214 5.1.2.2.2) round-trips every legal
    (start, length) on a 52- and a 106-PRB BWP, and RIVs are unique."""
    from srsran_edgeric_5g_tpu.ran.alloc import riv_decode, riv_encode
    for n in (52, 106):
        seen = set()
        for s in range(n):
            for l in range(1, n - s + 1):
                riv = riv_encode(n, s, l)
                assert riv not in seen
                seen.add(riv)
                assert riv_decode(n, riv) == (s, l)
        assert max(seen) < n * (n + 1) // 2 + n
