"""Full gNB slot with MIMO data plane: the multi-layer PDSCH/PUSCH
(layer-mapped codeword, CDM DM-RS, LxP MMSE) composed with the single-port
control channels (PDCCH/SSB down, PUCCH/SRS/PRACH up) in the jitted
slot-batch programs (parallel.full_cell *_mimo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.parallel import full_cell as fcell
from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

S = 20  # SSB {0,10}, CSI {1,6,11,16}, SRS {3,13}, PRACH {5,15}


def small_fc(n_layers=2) -> fcell.FullCellConfig:
    return fcell.FullCellConfig(
        nof_prb=52, nfft=1024, nof_ue=2,
        dl_first_prb=2, dl_prb_per_ue=20,
        ul_first_prb=2, ul_prb_per_ue=20,
        coreset_start_prb=2, coreset_nof_prb=48,
        ssb_first_subcarrier=192,
        prach_freq_prb=46, n_layers=n_layers)


def _mix(td, rng, n):
    """(S, L, total) port streams -> (S, P, total) antenna streams through
    a well-conditioned static spatial channel."""
    a = ((rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
         / np.sqrt(2))
    f = np.exp(-2j * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    a = (0.35 * a + f / np.sqrt(n)).astype(np.complex64)
    return jnp.einsum("pl,slt->spt", jnp.asarray(a), td), a


def _awgn(td, snr_db, rng):
    x = np.asarray(td)
    nv = float((np.abs(x) ** 2).mean()) * 10 ** (-snr_db / 10)
    noise = rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
    return jnp.asarray((x + noise * np.sqrt(nv / 2)).astype(np.complex64))


def test_ul_full_slot_batch_mimo():
    """UE MIMO UL generator -> 2x2 spatial channel + AWGN -> gNB MIMO UL RX:
    PUSCH payload-exact at the 2-layer TBS, control channels intact."""
    fc = small_fc(2)
    rng = np.random.default_rng(5)
    u = fc.nof_ue
    tbs = fc.ul_cell().derived_tbs()
    assert fc.ul_cell().n_layers == 2
    payloads = jnp.asarray(rng.integers(0, 2, (S, u, tbs), np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (S, u, 2), np.int8))
    csi = jnp.asarray(rng.integers(0, 2, (len(fc.csi_slots(S)), u,
                                          fc.csi_bits), np.int8))

    td = jax.jit(lambda p, a, c: fcell.ue_ul_slot_batch_mimo(
        p, a, c, fc, S, prach_preamble=7, prach_delay=24,
        prach_amplitude=0.02))(payloads, ack, csi)
    assert td.shape == (S, 2, fc.timing.cp.total)
    rx, _ = _mix(td, rng, 2)
    rx = _awgn(rx, 25.0, rng)

    res = jax.jit(lambda r: fcell.gnb_ul_slot_batch_mimo(r, fc, S))(rx)

    assert np.asarray(res["tb_ok"]).all()
    np.testing.assert_array_equal(np.asarray(res["payload"]),
                                  np.asarray(payloads))
    np.testing.assert_array_equal(np.asarray(res["ack_bits"]),
                                  np.asarray(ack))
    assert np.asarray(res["csi_ok"]).all()
    np.testing.assert_array_equal(np.asarray(res["csi_bits"]),
                                  np.asarray(csi))
    det = np.asarray(res["prach_detected"])
    assert det[:, 7].all() and not det[:, np.arange(64) != 7].any()
    # 2-layer TBS is ~2x the SISO TBS: the MIMO slot really carries more.
    assert tbs > 1.8 * fcell.FullCellConfig(
        **{**small_fc(1).__dict__}).ul_cell().derived_tbs()


def test_dl_full_slot_batch_mimo():
    """gNB MIMO DL TX (PDSCH layers + PDCCH/SSB on port 0) -> spatial
    channel -> UE-side MIMO receive decodes the normal-slot PDSCH exactly;
    port 0 carries the PDCCH/SSB energy."""
    fc = small_fc(2)
    rng = np.random.default_rng(6)
    u = fc.nof_ue
    cell_n = fc.dl_cell_mimo()
    tbs_n = cell_n.derived_tbs()
    tbs_s = fc.dl_cell_ssb_mimo().derived_tbs()
    norm_idx, ssb_idx = fc.norm_slots(S), fc.ssb_slots(S)
    pay_n = jnp.asarray(rng.integers(0, 2, (len(norm_idx), u, tbs_n),
                                     np.int8))
    pay_s = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), u, tbs_s),
                                     np.int8))
    dci = jnp.asarray(rng.integers(0, 2, (S, 2 * u, fc.dci_bits), np.int8))
    pbch = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), 24), np.int8))

    td = jax.jit(lambda a, b, d, p: fcell.gnb_dl_slot_batch_mimo(
        a, b, d, p, fc, S))(pay_n, pay_s, dci, pbch)
    assert td.shape == (S, 2, fc.timing.cp.total)

    # Control rides port 0 only: symbol-0 (PDCCH) energy must differ
    # across ports in the frequency domain.
    from srsran_edgeric_5g_tpu.ops import ofdm
    t = fc.timing
    g = jax.jit(lambda x: ofdm.demodulate_slot(x, t, scale=1.0))(
        td[0].reshape(2, -1))
    p_pdcch = np.abs(np.asarray(g[:, 0])) ** 2
    assert p_pdcch[0].sum() > 100 * p_pdcch[1].sum()

    rx, _ = _mix(td, rng, 2)
    rx = _awgn(rx, 25.0, rng)

    # UE-side MIMO receive of the normal-slot PDSCH (the same LxP front
    # the UL uses, at the DL cell geometry).
    rx_n = rx[jnp.asarray(norm_idx)]

    @jax.jit
    def ue_rx(r):
        llr, nv, cfo = sp._ul_front_mimo(r, fc.rntis(), cell_n)
        return sp._ul_back(llr, cell_n, 0, 6, None)

    payload, tb_ok, _ = ue_rx(rx_n)
    assert np.asarray(tb_ok).all()
    np.testing.assert_array_equal(
        np.asarray(payload).reshape(len(norm_idx), u, -1), np.asarray(pay_n))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
