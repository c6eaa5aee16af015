import pytest

from srsran_edgeric_5g_tpu.ran import numerology as num


def test_scs():
    assert num.scs_hz(0) == 15_000
    assert num.scs_hz(1) == 30_000


@pytest.mark.parametrize("nof_prb,nfft,srate", [(52, 768, 11_520_000),
                                                (106, 1536, 23_040_000)])
def test_reference_cells(nof_prb, nfft, srate):
    """The reference zmq-mode cell configs (10/20 MHz, 15 kHz SCS)."""
    t = num.slot_timing(nof_prb=nof_prb, nfft=nfft, mu=0)
    assert t.srate == srate
    # One slot at mu=0 is 1 ms of samples.
    assert t.cp.total == srate // 1000
    # Normal CP: symbols 0 and 7 carry the long CP.
    cps = t.cp.cp
    assert len(cps) == 14
    assert cps[0] == cps[7] > cps[1]
    assert all(c == cps[1] for i, c in enumerate(cps) if i not in (0, 7))


def test_cp_2048():
    """Canonical 2048-point numerology: 160/144 CP split at mu=0."""
    cps = num.cp_lengths(2048, 0)
    assert cps[0] == 160 and cps[1] == 144
    assert sum(cps) + 14 * 2048 == 30_720  # 1 ms at 30.72 Msps


def test_mu1_long_cp_position():
    # mu=1: second slot of the subframe has no long CP at symbol 0,
    # but symbol 0 of slot 0 and symbol 14 (i.e. slot 1, symbol 0) do... per
    # TS 38.211 the extension applies at l=0 and l=7*2^mu=14 in the subframe.
    cps0 = num.cp_lengths(2048, 1, slot_in_subframe=0)
    cps1 = num.cp_lengths(2048, 1, slot_in_subframe=1)
    assert cps0[0] > cps0[1]
    assert cps1[0] > cps1[1]  # symbol 14 of the subframe == slot1 symbol 0
    assert all(c == cps0[1] for c in cps0[1:])
    assert all(c == cps1[1] for c in cps1[1:])
