import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import short_block
from srsran_edgeric_5g_tpu.ops.polar import code as pcode
from srsran_edgeric_5g_tpu.ops.polar import decoder as pdec
from srsran_edgeric_5g_tpu.ops.polar import encoder as penc
from srsran_edgeric_5g_tpu.ops.polar import rate_match as prm


def test_subblock_permutation_is_permutation():
    for n in (32, 128, 512):
        p = pcode.subblock_permutation(n)
        assert sorted(p) == list(range(n))


@pytest.mark.parametrize("k,e", [(40, 100), (32, 864), (70, 200), (140, 288)])
def test_construct_basics(k, e):
    c = pcode.construct(k, e)
    assert len(c.info_set) == k
    assert len(c.frozen_set) == c.nof_bits - k
    assert c.nof_bits <= 512  # DL nmax=9
    assert set(c.info_set) & set(c.frozen_set) == set()


def test_encoder_matches_kron_oracle():
    c = pcode.construct(24, 60, i_il=False)
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 2, (5, 24), dtype=np.int8)
    got = np.asarray(penc.encode(jnp.asarray(msgs), c))
    want = penc.np_encode(msgs, c)
    np.testing.assert_array_equal(got, want)


def test_encoder_with_interleaver_matches_oracle():
    c = pcode.construct(31, 100, i_il=True)
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 2, (3, 31), dtype=np.int8)
    np.testing.assert_array_equal(np.asarray(penc.encode(jnp.asarray(msgs), c)),
                                  penc.np_encode(msgs, c))


@pytest.mark.parametrize("k,e", [(40, 100), (24, 432), (100, 160), (16, 48)])
def test_polar_noiseless_roundtrip(k, e):
    """encode -> rate match -> BPSK LLR -> dematch -> SC decode == message."""
    c = pcode.construct(k, e)
    rng = np.random.default_rng(k * e)
    msgs = jnp.asarray(rng.integers(0, 2, (4, k), dtype=np.int8))
    cw = penc.encode(msgs, c)
    tx = prm.rate_match(cw, c)
    assert tx.shape == (4, e)
    llr = (1.0 - 2.0 * tx.astype(jnp.float32)) * 10.0
    ml = prm.rate_dematch(llr, c)
    out = pdec.decode(ml, c)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(msgs))


def test_polar_awgn():
    k, e = 32, 256
    c = pcode.construct(k, e)
    rng = np.random.default_rng(7)
    msgs = jnp.asarray(rng.integers(0, 2, (16, k), dtype=np.int8))
    cw = penc.encode(msgs, c)
    tx = np.asarray(prm.rate_match(cw, c)).astype(np.float32)
    sym = 1 - 2 * tx
    sigma = 10 ** (-4.0 / 20)  # 4 dB, rate 1/8 -> easy
    y = sym + rng.normal(size=sym.shape) * sigma
    llr = jnp.asarray(2 * y / sigma ** 2)
    out = pdec.decode(prm.rate_dematch(llr, c), c)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(msgs))


def test_rate_match_modes():
    assert pcode.construct(30, 120).rm_mode == "puncture"   # N=128, K/E<=7/16
    assert pcode.construct(70, 120).rm_mode == "shorten"    # N=128, K/E>7/16
    assert pcode.construct(30, 600).rm_mode == "repeat"     # E>=N=256


# ---------- short block ----------

@pytest.mark.parametrize("k", [1, 2, 3, 6, 11])
def test_short_block_roundtrip(k):
    rng = np.random.default_rng(k)
    e = {1: 8, 2: 9}.get(k, 32)
    bits = jnp.asarray(rng.integers(0, 2, (6, k), dtype=np.int8))
    cw = short_block.encode(bits, e)
    assert cw.shape == (6, e)
    llr = (1.0 - 2.0 * cw.astype(jnp.float32)) * 5.0
    out, metric = short_block.detect(llr, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
    assert (np.asarray(metric) > 0).all()


def test_short_block_rm_is_linear():
    """RM encoding is linear: enc(a^b) = enc(a)^enc(b)."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2, (1, 8), dtype=np.int8)
    b = rng.integers(0, 2, (1, 8), dtype=np.int8)
    ea = np.asarray(short_block.encode(jnp.asarray(a), 32))
    eb = np.asarray(short_block.encode(jnp.asarray(b), 32))
    eab = np.asarray(short_block.encode(jnp.asarray(a ^ b), 32))
    np.testing.assert_array_equal(eab, ea ^ eb)


def test_short_block_awgn_detection():
    rng = np.random.default_rng(5)
    bits = jnp.asarray(rng.integers(0, 2, (32, 4), dtype=np.int8))
    cw = np.asarray(short_block.encode(bits, 32)).astype(np.float32)
    sym = 1 - 2 * cw
    sigma = 0.7
    y = sym + rng.normal(size=sym.shape) * sigma
    out, _ = short_block.detect(jnp.asarray(2 * y / sigma ** 2), 4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


# ---------- SCL list decoder ----------

def test_scl_noiseless_matches_message():
    from srsran_edgeric_5g_tpu.ops.polar import list_decoder as scl
    c = pcode.construct(32, 128, i_il=False)
    rng = np.random.default_rng(1)
    msgs = jnp.asarray(rng.integers(0, 2, (4, 32), dtype=np.int8))
    cw = penc.encode(msgs, c)
    llr = (1.0 - 2.0 * cw.astype(jnp.float32)) * 6.0
    out, ok = scl.decode_scl(llr, c, list_size=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(msgs))
    assert np.asarray(ok).all()


def test_scl_beats_sc_at_low_snr():
    """CA-SCL-8 must decode strictly more blocks than SC at a stressed SNR."""
    from srsran_edgeric_5g_tpu.ops import crc as crc_mod
    from srsran_edgeric_5g_tpu.ops.polar import list_decoder as scl
    k_payload, e = 16, 96
    k = k_payload + 11  # CRC11-aided
    c = pcode.construct(k, e, i_il=False)
    rng = np.random.default_rng(5)
    nblk = 64
    payload = jnp.asarray(rng.integers(0, 2, (nblk, k_payload), dtype=np.int8))
    with_crc = crc_mod.crc_attach(payload, "crc11")
    cw = penc.encode(with_crc, c)
    tx = np.asarray(prm.rate_match(cw, c)).astype(np.float32)
    sym = 1 - 2 * tx
    sigma = 10 ** (2.5 / 20)  # SNR -2.5 dB
    y = sym + rng.normal(size=sym.shape) * sigma
    llr = prm.rate_dematch(jnp.asarray(2 * y / sigma ** 2), c)

    sc_out = pdec.decode(llr, c)
    sc_ok = (np.asarray(sc_out) == np.asarray(with_crc)).all(axis=1)
    scl_out, scl_ok = scl.decode_scl(llr, c, list_size=8, crc="crc11")
    scl_correct = (np.asarray(scl_out) == np.asarray(with_crc)).all(axis=1)
    # CRC-aided flag agrees with correctness (false-pass chance ~2^-11/blk).
    assert (np.asarray(scl_ok) == scl_correct).mean() > 0.95
    assert scl_correct.sum() > sc_ok.sum()
    assert scl_correct.mean() > 0.8


# ---------- PC bits (UCI 12 <= K <= 19) ----------

@pytest.mark.parametrize("k,e", [(12, 48), (16, 96), (19, 240)])
def test_pc_encode_matches_register_oracle(k, e):
    c = pcode.construct(k, e, nmax=pcode.NMAX_UL, i_il=False, n_pc=3)
    assert c.n_pc == 3
    assert len(c.info_set) == k
    assert not set(c.pc_set) & set(c.info_set)
    rng = np.random.default_rng(k)
    msgs = rng.integers(0, 2, (5, k), dtype=np.int8)
    got = np.asarray(penc.encode(jnp.asarray(msgs), c))
    want = penc.np_encode(msgs, c)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k,e", [(12, 48), (16, 200)])
def test_pc_roundtrip_sc(k, e):
    c = pcode.construct(k, e, nmax=pcode.NMAX_UL, i_il=False, n_pc=3)
    rng = np.random.default_rng(e)
    msgs = jnp.asarray(rng.integers(0, 2, (4, k), dtype=np.int8))
    cw = penc.encode(msgs, c)
    tx = prm.rate_match(cw, c)
    llr = (1.0 - 2.0 * tx.astype(jnp.float32)) * 8.0
    out = pdec.decode(prm.rate_dematch(llr, c), c)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(msgs))


def test_pc_wm_selection():
    """E - K + 3 > 192 triggers the row-weight-placed PC bit."""
    c = pcode.construct(16, 220, nmax=pcode.NMAX_UL, i_il=False, n_pc=3)
    assert c.n_pc == 3
    # at least one PC bit should NOT be among the 2 least reliable chosen
    # (it was placed by min row weight among the most reliable positions).
    c2 = pcode.construct(16, 96, nmax=pcode.NMAX_UL, i_il=False, n_pc=3)
    assert c2.n_pc == 3


@pytest.mark.parametrize("k,e", [(12, 48), (16, 96), (19, 240)])
def test_pc_roundtrip_scl(k, e):
    """SCL must honour the PC register: noiseless roundtrip, exact message."""
    from srsran_edgeric_5g_tpu.ops.polar import list_decoder as scl
    c = pcode.construct(k, e, nmax=pcode.NMAX_UL, i_il=False, n_pc=3)
    rng = np.random.default_rng(3 * k + e)
    msgs = jnp.asarray(rng.integers(0, 2, (4, k), dtype=np.int8))
    cw = penc.encode(msgs, c)
    tx = prm.rate_match(cw, c)
    llr = (1.0 - 2.0 * tx.astype(jnp.float32)) * 8.0
    out, ok = scl.decode_scl(prm.rate_dematch(llr, c), c, list_size=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(msgs))
    assert np.asarray(ok).all()


def test_pc_scl_beats_sc_at_low_snr():
    """CA-SCL-8 on the CRC6+PC UCI code decodes more blocks than SC."""
    from srsran_edgeric_5g_tpu.ops import crc as crc_mod
    from srsran_edgeric_5g_tpu.ops.polar import list_decoder as scl
    k_payload, e = 12, 64
    k = k_payload + 6  # CRC6-aided, +3 PC bits in construction
    c = pcode.construct(k, e, nmax=pcode.NMAX_UL, i_il=False, n_pc=3)
    rng = np.random.default_rng(11)
    nblk = 64
    payload = jnp.asarray(rng.integers(0, 2, (nblk, k_payload), dtype=np.int8))
    with_crc = crc_mod.crc_attach(payload, "crc6")
    cw = penc.encode(with_crc, c)
    tx = np.asarray(prm.rate_match(cw, c)).astype(np.float32)
    sym = 1 - 2 * tx
    sigma = 10 ** (1.5 / 20)
    y = sym + rng.normal(size=sym.shape) * sigma
    llr = prm.rate_dematch(jnp.asarray(2 * y / sigma ** 2), c)

    sc_out = pdec.decode(llr, c)
    sc_ok = (np.asarray(sc_out) == np.asarray(with_crc)).all(axis=1)
    scl_out, scl_ok = scl.decode_scl(llr, c, list_size=8, crc="crc6")
    scl_correct = (np.asarray(scl_out) == np.asarray(with_crc)).all(axis=1)
    assert scl_correct.sum() >= sc_ok.sum()
    assert scl_correct.mean() > 0.85, scl_correct.mean()
