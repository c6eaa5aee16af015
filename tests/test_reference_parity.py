"""Bit-exact cross-validation against the REFERENCE C++ implementations.

native/refharness compiles the reference's own kernels (ldpc_encoder_generic/
avx2, ldpc_decoder_generic/avx2, crc_calculator_lut, ldpc_rate_matcher/
dematcher — srsRAN-5G-ER/lib/phy/upper/channel_coding/**) straight from the
read-only checkout and emits golden vectors on deterministic inputs; these
tests replay the SAME inputs through the TPU-native ops and require equality.
This closes the conformance gap left by the reference's absent MATLAB .dat
vectors (its *_test_data.h case tables reference files downloaded at its
build time — see NOTES_ROUND1.md "Parity validation status").
"""

import dataclasses
import pathlib
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from srsran_edgeric_5g_tpu.ops import crc as crc_ops
from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder, rate_match
from srsran_edgeric_5g_tpu.ops.ldpc.graph import get_graph

ROOT = pathlib.Path(__file__).resolve().parent.parent
HARNESS = ROOT / "native" / "build" / "refharness" / "refharness"


@pytest.fixture(scope="module")
def harness():
    if not HARNESS.exists():
        r = subprocess.run(["make", "-j4"],
                           cwd=ROOT / "native" / "refharness",
                           capture_output=True, text=True)
        if r.returncode != 0 or not HARNESS.exists():
            pytest.skip(f"refharness build failed: {r.stderr[-500:]}")

    def run(*args) -> bytes:
        r = subprocess.run([str(HARNESS), *map(str, args)],
                           capture_output=True)
        assert r.returncode == 0, r.stderr.decode()[-500:]
        return r.stdout

    return run


@pytest.mark.parametrize("bg,zc", [(1, 224), (1, 64), (1, 13), (2, 52),
                                   (2, 384), (2, 10)])
def test_ldpc_encoder_bit_exact(harness, bg, zc):
    g = get_graph(bg, zc)
    nmsg = 4
    out = np.frombuffer(harness("encode", bg, zc, nmsg, 42, "generic"),
                        dtype=np.uint8)
    k, n_ref = g.k, g.n_full - 2 * zc
    msgs = out[:nmsg * k].reshape(nmsg, k)
    cw_ref = out[nmsg * k:].reshape(nmsg, n_ref)
    ours = np.asarray(encoder.encode(jnp.asarray(msgs.astype(np.int8)),
                                     bg, zc))
    # Reference output drops the 2*Zc punctured systematic bits
    # (ldpc_encoder_generic.cpp write_codeblock).
    np.testing.assert_array_equal(ours[:, 2 * zc:], cw_ref)


def test_ldpc_encoder_avx2_matches_generic(harness):
    a = harness("encode", 1, 224, 4, 42, "avx2")
    b = harness("encode", 1, 224, 4, 42, "generic")
    assert a == b


@pytest.mark.parametrize("poly,nbits", [("24A", 24), ("24B", 24),
                                        ("24C", 24), ("16", 16),
                                        ("11", 11), ("6", 6)])
def test_crc_bit_exact(harness, poly, nbits):
    nbytes, nmsg = 125, 8
    out = harness("crc", poly, nbytes, nmsg, 7)
    data = np.frombuffer(out[:nmsg * nbytes], dtype=np.uint8)
    sums = np.frombuffer(out[nmsg * nbytes:], dtype=np.uint32)
    bits = np.unpackbits(data.reshape(nmsg, nbytes), axis=1)
    ours = crc_ops.crc(jnp.asarray(bits.astype(np.int8)),
                       "crc" + poly.lower() if poly in ("24A", "24B", "24C")
                       else "crc" + poly)
    ours_int = np.asarray(ours) @ (1 << np.arange(nbits)[::-1])
    np.testing.assert_array_equal(ours_int.astype(np.uint32), sums)


@pytest.mark.parametrize("bg,zc,e_frac,rv,qm,nfill", [
    (1, 224, 0.6, 0, 6, 0),     # typical pipeline shape, no fillers
    (1, 224, 0.6, 2, 6, 0),     # nonzero rv
    (2, 52, 0.8, 0, 4, 36),     # BG2 with fillers
    (1, 64, 1.3, 3, 2, 0),      # repetition (E > N_cb wrap)
])
def test_rate_matcher_bit_exact(harness, bg, zc, e_frac, rv, qm, nfill):
    g = get_graph(bg, zc)
    n_ref = g.n_full - 2 * zc
    e = (int(n_ref * e_frac) // qm) * qm
    nmsg = 3
    out = np.frombuffer(
        harness("ratematch", bg, zc, e, rv, qm, nfill, nmsg, 11),
        dtype=np.uint8)
    k = g.k
    msgs = out[:nmsg * k].reshape(nmsg, k)
    cw_ref = out[nmsg * k:nmsg * (k + n_ref)].reshape(nmsg, n_ref)
    rm_ref = out[nmsg * (k + n_ref):].reshape(nmsg, e)
    full = np.concatenate([msgs[:, :2 * zc], cw_ref], axis=1)
    plan = rate_match.get_rate_match_plan(bg, zc, e, rv, qm,
                                          k_prime=k - nfill)
    ours = np.asarray(rate_match.rate_match(
        jnp.asarray(full.astype(np.int8)), plan))
    np.testing.assert_array_equal(ours, rm_ref)


@pytest.mark.parametrize("bg,zc,e_frac,rv,qm,nfill", [
    (1, 224, 0.6, 0, 6, 0),
    (2, 52, 0.8, 0, 4, 36),
    (1, 64, 1.3, 3, 2, 0),      # repetition: saturating vs clipped combine
])
def test_rate_dematcher_exact(harness, bg, zc, e_frac, rv, qm, nfill):
    g = get_graph(bg, zc)
    n_ref = g.n_full - 2 * zc
    e = (int(n_ref * e_frac) // qm) * qm
    nmsg = 3
    out = harness("dematch", bg, zc, e, rv, qm, nfill, nmsg, 5)
    llrs = np.frombuffer(out[:nmsg * e], dtype=np.int8).reshape(nmsg, e)
    # Reference output = the N-bit circular buffer (punctured 2*Zc positions
    # are outside its domain); ours returns the full-codeword layout.
    ref = np.frombuffer(out[nmsg * e:], dtype=np.int8).reshape(nmsg, n_ref)
    plan = rate_match.get_rate_match_plan(bg, zc, e, rv, qm,
                                          k_prime=g.k - nfill)
    ours_full = np.asarray(rate_match.rate_dematch(
        jnp.asarray(llrs.astype(np.float32)), plan))
    ours = ours_full[:, 2 * zc:2 * zc + n_ref]
    # Filler span +127 both sides; the reference saturates sums at +-120
    # (<= 2 contributions here, so saturate(a+b) == clip(a+b)).
    ours_q = np.clip(ours, -120, 120)
    fill = np.zeros(n_ref, dtype=bool)
    fill[g.k - nfill - 2 * zc:g.k - 2 * zc] = True
    ours_q[:, fill] = 127
    np.testing.assert_array_equal(ours_q, ref.astype(np.float32))


@pytest.mark.parametrize("impl", ["generic", "avx2"])
def test_ldpc_decoder_fixed_point_parity(harness, impl):
    """The reference decoder IS int8 fixed point; our layered_rolls_i8
    schedule replicates its arithmetic (load clamp +-64, v2c saturation at
    +-120, promotion to +-127, scale_llr rounding).  Same int8 LLRs in ->
    same hard decisions out, for the full 6-iteration run (no early stop:
    random payloads don't carry the CRC16 the reference's early stop
    checks)."""
    bg, zc = 1, 64
    g = get_graph(bg, zc)
    nmsg = 6
    n_full = g.n_full
    k = g.k
    out = harness("decode", bg, zc, nmsg, 3, 700, 6, impl, 0)
    o = 0
    msgs = np.frombuffer(out[o:o + nmsg * k], np.uint8).reshape(nmsg, k)
    o += nmsg * k
    llrs = np.frombuffer(out[o:o + nmsg * n_full], np.int8).reshape(
        nmsg, n_full)
    o += nmsg * n_full
    hards = np.frombuffer(out[o:o + nmsg * k], np.uint8).reshape(nmsg, k)

    ours, _ = decoder.decode(jnp.asarray(llrs), bg, zc, num_iters=6,
                             schedule="layered_rolls_i8", early_stop=False)
    np.testing.assert_array_equal(np.asarray(ours), hards)
    # At sigma=0.7 (high SNR for r~1/3) decoding should also be correct.
    np.testing.assert_array_equal(hards, msgs)


# ---------------------------------------------------------------------------
# v2: sequence generators, modulation, demapping, equalization, short block,
# polar — all against the reference binaries compiled in native/refharness.
# ---------------------------------------------------------------------------

from srsran_edgeric_5g_tpu.ops import equalizer as eq_ops
from srsran_edgeric_5g_tpu.ops import low_papr as lp_ops
from srsran_edgeric_5g_tpu.ops import modulation as mod_ops
from srsran_edgeric_5g_tpu.ops import sequences as seq_ops
from srsran_edgeric_5g_tpu.ops import short_block as sb_ops
from srsran_edgeric_5g_tpu.ops import polar as polar_ops
from srsran_edgeric_5g_tpu.ops.polar import code as polar_code
from srsran_edgeric_5g_tpu.ops.polar import encoder as polar_enc
from srsran_edgeric_5g_tpu.ops.polar import rate_match as polar_rm
from srsran_edgeric_5g_tpu.ops.polar import decoder as polar_dec


def test_gold_prg_bit_exact(harness):
    """pseudo_random_generator_impl (x1/x2 LFSR + fast advance) vs our
    GF(2)-matmul Gold formulation (ops/sequences.py)."""
    c0, length, nseq = 0x5432A1, 1600, 4
    out = np.frombuffer(harness("prg", c0, length, nseq), dtype=np.uint8)
    ref = out.reshape(nseq, length)
    for i in range(nseq):
        ours = np.asarray(seq_ops.gold_sequence(
            jnp.asarray(np.uint32(c0 + i * 7919)), length))
        np.testing.assert_array_equal(ours, ref[i])


@pytest.mark.parametrize("u,v,anum,aden,m", [
    (5, 0, 3, 12, 36),      # 3-PRB ZC-based
    (29, 0, 0, 1, 132),     # 11-PRB ZC-based (no shift)
    (7, 1, 5, 8, 144),      # v=1 sequence number
    (11, 0, 2, 12, 12),     # 1-PRB phi table
    (23, 0, 1, 6, 18),      # 1.5-PRB phi table
    (3, 0, 7, 12, 24),      # 2-PRB phi table
    (17, 0, 0, 1, 6),       # smallest phi table
])
def test_low_papr_sequence_parity(harness, u, v, anum, aden, m):
    """low_papr_sequence_generator_impl (TS 38.211 5.2.2) vs ops/low_papr."""
    ref = np.frombuffer(harness("lowpapr", u, v, anum, aden, m),
                        dtype=np.complex64)
    alpha = 2.0 * np.pi * anum / aden
    ours = np.asarray(lp_ops.low_papr_sequence(u, v, alpha, m))
    np.testing.assert_allclose(ours, ref, atol=4e-5)


@pytest.mark.parametrize("qm", [1, 2, 4, 6, 8])
def test_modulation_mapper_parity(harness, qm):
    """modulation_mapper_lut_impl vs ops/modulation.modulate."""
    nsym, nmsg = 120, 3
    out = harness("modmap", qm, nsym, nmsg, 77)
    rec = nsym * qm + nsym * 8
    for i in range(nmsg):
        blob = out[i * rec:(i + 1) * rec]
        bits = np.frombuffer(blob[:nsym * qm], dtype=np.uint8)
        ref = np.frombuffer(blob[nsym * qm:], dtype=np.complex64)
        ours = np.asarray(mod_ops.modulate(
            jnp.asarray(bits.astype(np.int8)), mod_ops.NAME_BY_QM[qm]))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("qm", [1, 2, 4, 6, 8])
def test_soft_demapper_parity(harness, qm):
    """demodulation_mapper (max-log interval kernels + int8 quantization,
    AVX2 build) vs our closed-form Gray-fold demapper.  Assert <=1 LSB
    difference everywhere (float association order may round differently at
    quantization boundaries) and >=99% exact."""
    nsym, nmsg, sigma = 256, 4, 0.35
    out = harness("demap", qm, nsym, nmsg, 99, int(sigma * 1000))
    rec = nsym * 8 + nsym * 4 + nsym * qm
    for i in range(nmsg):
        blob = out[i * rec:(i + 1) * rec]
        syms = np.frombuffer(blob[:nsym * 8], dtype=np.complex64)
        nvars = np.frombuffer(blob[nsym * 8:nsym * 12], dtype=np.float32)
        ref = np.frombuffer(blob[nsym * 12:], dtype=np.int8)
        ours = np.asarray(mod_ops.demodulate_soft(
            jnp.asarray(syms), jnp.asarray(nvars),
            mod_ops.NAME_BY_QM[qm])).astype(np.int32)
        diff = np.abs(ours - ref.astype(np.int32))
        assert diff.max() <= 1, (qm, i, int(diff.max()))
        assert (diff == 0).mean() >= 0.99, (qm, i, float((diff == 0).mean()))


@pytest.mark.parametrize("algo,nports,txs", [
    ("mmse", 1, 1.0), ("mmse", 2, 1.0), ("mmse", 4, 0.5),
    ("zf", 1, 1.0), ("zf", 2, 0.5),
])
def test_equalizer_parity(harness, algo, nports, txs):
    """channel_equalizer_generic_impl (1 layer x N ports) vs ops/equalizer,
    on cbf16-quantized inputs (the reference grid storage), including the
    abnormal-input policy (zeroed channel -> x=0, nvar=inf)."""
    nre, nmsg = 64, 2
    out = harness("eq", algo, nports, nre, nmsg, 21, int(txs * 1000))
    rec = nports * nre * 8 * 2 + nports * 4 + nre * 8 + nre * 4
    for i in range(nmsg):
        blob = out[i * rec:(i + 1) * rec]
        o = 0
        y = np.frombuffer(blob[o:o + nports * nre * 8],
                          dtype=np.complex64).reshape(nports, nre)
        o += nports * nre * 8
        h = np.frombuffer(blob[o:o + nports * nre * 8],
                          dtype=np.complex64).reshape(nports, nre)
        o += nports * nre * 8
        nv = np.frombuffer(blob[o:o + nports * 4], dtype=np.float32)
        o += nports * 4
        ref_x = np.frombuffer(blob[o:o + nre * 8], dtype=np.complex64)
        o += nre * 8
        ref_nv = np.frombuffer(blob[o:], dtype=np.float32)
        fn = (eq_ops.equalize_mmse_1xn if algo == "mmse"
              else eq_ops.equalize_zf_1xn)
        x, nvo = fn(jnp.asarray(y), jnp.asarray(h),
                    jnp.asarray(nv)[:, None], tx_scaling=txs)
        x, nvo = np.asarray(x), np.asarray(nvo)
        # The reference's AVX2 kernels compute reciprocals with the
        # approximate rcp_ps + Newton step (~1e-4 rel error); we divide
        # exactly, so allow that much.
        np.testing.assert_allclose(x, ref_x, atol=1e-3, rtol=1e-3)
        fin = np.isfinite(ref_nv)
        np.testing.assert_array_equal(np.isfinite(nvo), fin)
        np.testing.assert_allclose(nvo[fin], ref_nv[fin], rtol=2e-3)


@pytest.mark.parametrize("k,e,qm", [(1, 16, 1), (2, 18, 1), (5, 32, 2),
                                    (8, 32, 1), (11, 64, 2)])
def test_short_block_parity(harness, k, e, qm):
    """short_block_{encoder,detector}_impl vs ops/short_block (RM(32,K)
    encode bit-exact; ML detection agrees at workable SNR)."""
    nmsg = 6
    out = harness("shortblock", k, e, qm, nmsg, 31, 400)
    rec = k + e + e + k + 1
    for i in range(nmsg):
        blob = out[i * rec:(i + 1) * rec]
        msg = np.frombuffer(blob[:k], dtype=np.uint8)
        cw = np.frombuffer(blob[k:k + e], dtype=np.uint8)
        llrs = np.frombuffer(blob[k + e:k + 2 * e], dtype=np.int8)
        det = np.frombuffer(blob[k + 2 * e:k + 2 * e + k], dtype=np.uint8)
        ours_cw = np.asarray(sb_ops.encode(
            jnp.asarray(msg.astype(np.int8))[None], e))[0]
        np.testing.assert_array_equal(ours_cw, cw)
        ours_det, _ = sb_ops.detect(
            jnp.asarray(llrs.astype(np.float32))[None], k)
        np.testing.assert_array_equal(np.asarray(ours_det)[0], det)
        np.testing.assert_array_equal(np.asarray(ours_det)[0], msg)


@pytest.mark.parametrize("K,E,nmax,ibil", [
    (32, 128, 9, 0),    # DCI-style sizes, no coded-bit interleaver
    (45, 300, 9, 0),    # repetition rate matching
    (25, 50, 10, 1),    # UCI (triangular channel interleaver), shorten
    (15, 120, 10, 1),   # UCI with nPC=3 parity-check bits
    (40, 120, 10, 1),   # UCI repeat-mode... puncture with i_BIL
])
def test_polar_chain_parity(harness, K, E, nmax, ibil):
    """polar_{code,interleaver,allocator,encoder,rate_matcher}_impl TX chain
    bit-exact, and the SC decoder RX chain agrees at moderate SNR."""
    nmsg = 3
    out = harness("polar", K, E, nmax, ibil, nmsg, 17, 500)
    o = 0
    N, n, npc = np.frombuffer(out[o:o + 12], dtype=np.uint32)
    o += 12
    mask = np.frombuffer(out[o:o + N], dtype=np.uint8)
    o += int(N)
    (npc2,) = np.frombuffer(out[o:o + 4], dtype=np.uint32)
    o += 4
    pc_ref = np.frombuffer(out[o:o + 2 * npc2], dtype=np.uint16)
    o += int(2 * npc2)

    # The harness chain always applies the input interleaver (the DCI TX
    # order); `ibil` is the reference's coded-bit channel interleaver flag.
    code = polar_code.construct(K, E, nmax=nmax, i_il=True,
                                n_pc=int(npc), i_bil=bool(ibil))
    assert code.nof_bits == N and code.n == n and code.n_pc == npc
    kset_ref = np.flatnonzero(mask & 1)
    ours_kset = np.sort(np.concatenate([code.info_set, code.pc_set]))
    np.testing.assert_array_equal(ours_kset, kset_ref)
    np.testing.assert_array_equal(np.sort(code.pc_set),
                                  np.sort(pc_ref.astype(np.int64)))

    rec = K + K + N + N + E + E + K
    for i in range(nmsg):
        blob = out[o + i * rec:o + (i + 1) * rec]
        c = 0
        msg = np.frombuffer(blob[c:c + K], dtype=np.uint8); c += K
        itl = np.frombuffer(blob[c:c + K], dtype=np.uint8); c += K
        alloc = np.frombuffer(blob[c:c + int(N)], dtype=np.uint8); c += int(N)
        enc = np.frombuffer(blob[c:c + int(N)], dtype=np.uint8); c += int(N)
        matched = np.frombuffer(blob[c:c + E], dtype=np.uint8); c += E
        llrs = np.frombuffer(blob[c:c + E], dtype=np.int8); c += E
        dec_ref = np.frombuffer(blob[c:c + K], dtype=np.uint8)

        pi = polar_code.dci_interleaver(K)
        np.testing.assert_array_equal(msg[pi], itl)
        # allocate() applies the DCI interleaver itself when i_IL=1.
        u = np.asarray(polar_enc.allocate(
            jnp.asarray(msg.astype(np.int8))[None], code))[0]
        np.testing.assert_array_equal(u, alloc)
        x = np.asarray(polar_enc.transform(jnp.asarray(u)[None]))[0]
        np.testing.assert_array_equal(x, enc)
        f = np.asarray(polar_rm.rate_match(jnp.asarray(x)[None], code))[0]
        np.testing.assert_array_equal(f, matched)

        # RX: dematch + SSC decode; at sigma=0.5 both decoders must recover
        # the message (and hence agree with each other).
        lin = polar_rm.rate_dematch(
            jnp.asarray(llrs.astype(np.float32))[None], code)
        ours_dec = np.asarray(polar_dec.decode(lin, code))[0]
        np.testing.assert_array_equal(dec_ref, msg)
        np.testing.assert_array_equal(ours_dec, msg)


from srsran_edgeric_5g_tpu.ops import ofh_compression as ofh


@pytest.mark.parametrize("width", [9, 12, 14, 16])
def test_ofh_bfp_parity(harness, width):
    """O-RAN fronthaul BFP IQ compression (iq_compression_bfp_impl +
    compressed_prb_packer) vs ops/ofh_compression: quantized int16s,
    per-PRB exponents, W-bit mantissa wire bytes, and decompressed floats
    — all bit-exact."""
    nprb, nmsg, scale = 16, 2, 1.0
    nsamp = nprb * 12
    psize = (24 * width + 7) // 8
    out = harness("ofhbfp", width, nprb, nmsg, 5, int(scale * 1000))
    rec = nsamp * 8 + nsamp * 4 + nprb + nprb * psize + nsamp * 8
    for i in range(nmsg):
        blob = out[i * rec:(i + 1) * rec]
        o = 0
        iq = np.frombuffer(blob[o:o + nsamp * 8], dtype=np.complex64)
        o += nsamp * 8
        quant_ref = np.frombuffer(blob[o:o + nsamp * 4], dtype=np.int16)
        o += nsamp * 4
        exps_ref = np.frombuffer(blob[o:o + nprb], dtype=np.uint8)
        o += nprb
        packed_ref = np.frombuffer(blob[o:o + nprb * psize],
                                   dtype=np.uint8).reshape(nprb, psize)
        o += nprb * psize
        dec_ref = np.frombuffer(blob[o:], dtype=np.complex64)

        q = np.asarray(ofh.quantize_iq(jnp.asarray(iq), scale))
        np.testing.assert_array_equal(q, quant_ref)
        mant, exp = ofh.bfp_compress(jnp.asarray(iq), width, scale)
        mant, exp = np.asarray(mant), np.asarray(exp)
        np.testing.assert_array_equal(exp, exps_ref.astype(np.int32))
        packed = ofh.pack_prbs(mant, width)
        np.testing.assert_array_equal(packed, packed_ref)
        unpacked = ofh.unpack_prbs(packed_ref, width)
        np.testing.assert_array_equal(unpacked, mant)
        dec = np.asarray(ofh.bfp_decompress(jnp.asarray(mant),
                                            jnp.asarray(exp)))
        # The reference stores decompressed output as cbf16 (rounding to
        # 8 mantissa bits); compare within that quantization step.
        np.testing.assert_allclose(dec, dec_ref, atol=4e-3)


from srsran_edgeric_5g_tpu.ops import ofdm as ofdm_ops
from srsran_edgeric_5g_tpu.ran import numerology as num


@pytest.mark.parametrize("mu,bw_rb,dft,slot,scale,cfreq,wofs", [
    (0, 106, 1536, 0, 1.0, 3_500_000_000, 0),   # the 20 MHz pipeline shape
    (0, 52, 1024, 0, 0.75, 0, 8),               # 10 MHz, window offset
    (1, 51, 1024, 1, 1.0, 3_600_000_000, 0),    # 30 kHz SCS, 2nd slot in sf
])
def test_ofdm_chain_parity(harness, mu, bw_rb, dft, slot, scale, cfreq,
                           wofs):
    """OFDM slot modulator + demodulator vs the reference's
    ofdm_{modulator,demodulator}_impl running on its generic (FFTW-free)
    radix DFT: same grid in -> same baseband samples -> same rx grid,
    within f32 accumulation differences of the two FFT algorithms."""
    out = harness("ofdm", mu, bw_rb, dft, slot, int(scale * 1000), cfreq,
                  wofs, 9)
    nsubc, slot_size = np.frombuffer(out[:8], dtype=np.uint32)
    o = 8
    nsymb = 14
    grid = np.frombuffer(out[o:o + nsymb * nsubc * 8],
                         dtype=np.complex64).reshape(nsymb, nsubc)
    o += nsymb * nsubc * 8
    samples_ref = np.frombuffer(out[o:o + int(slot_size) * 8],
                                dtype=np.complex64)
    o += int(slot_size) * 8
    rx_ref = np.frombuffer(out[o:], dtype=np.complex64).reshape(nsymb, nsubc)

    timing = num.slot_timing(bw_rb, dft, mu=mu, slot_in_subframe=slot)
    assert timing.cp.total == slot_size and timing.nof_subc == nsubc

    ours = np.asarray(ofdm_ops.modulate_slot(
        jnp.asarray(grid), timing, center_freq_hz=float(cfreq), scale=scale,
        slot_in_subframe=slot))
    rms = np.sqrt(np.mean(np.abs(samples_ref) ** 2))
    np.testing.assert_allclose(ours, samples_ref, atol=3e-4 * rms)

    rx = np.asarray(ofdm_ops.demodulate_slot(
        jnp.asarray(samples_ref), timing, center_freq_hz=float(cfreq),
        scale=1.0 / (scale * dft), slot_in_subframe=slot,
        window_offset=wofs))
    np.testing.assert_allclose(rx, rx_ref, atol=3e-3)
    # And the loopback must return the grid (to cbf16-ish accuracy).
    np.testing.assert_allclose(rx, grid, atol=2e-2)


from srsran_edgeric_5g_tpu.ops import channel_est as chest_ops


@pytest.mark.parametrize("nprb,ndmrs,delay_ns,cfo_hz,snr_db,smooth", [
    (52, 2, 500, 200, 20, 2),    # filter smoothing, 10 MHz
    (106, 4, 300, 0, 15, 2),     # 20 MHz, 4 DM-RS symbols, no CFO
    (52, 2, 100, 400, 25, 0),    # no smoothing
])
def test_channel_estimator_quality_parity(harness, nprb, ndmrs, delay_ns,
                                          cfo_hz, snr_db, smooth):
    """PUSCH port channel estimator vs the reference's
    port_channel_estimator_average_impl on IDENTICAL noisy pilots over a
    known 2-tap channel.  Ours is an intentional algorithmic redesign
    (windowed-sinc smoothing vs RC filter, closed-form TA vs 4096-IDFT), so
    this asserts estimation QUALITY and metric agreement, not float parity:
    estimate MSE within 2x of the reference (or both tiny), noise variance
    within 4 dB, CFO within 15% or 20 Hz, TA within 100 ns."""
    out = harness("chest", nprb, ndmrs, delay_ns, cfo_hz, snr_db * 10,
                  smooth, 7)
    nsubc, npil, nd = np.frombuffer(out[:12], dtype=np.uint32)
    o = 12
    h_true = np.frombuffer(out[o:o + int(nsubc) * 8], dtype=np.complex64)
    o += int(nsubc) * 8
    pil = np.frombuffer(out[o:o + int(nd * npil) * 8],
                        dtype=np.complex64).reshape(nd, npil)
    o += int(nd * npil) * 8
    rx = np.frombuffer(out[o:o + int(nd * npil) * 8],
                       dtype=np.complex64).reshape(nd, npil)
    o += int(nd * npil) * 8
    h_ref = np.frombuffer(out[o:o + 14 * int(nsubc) * 8],
                          dtype=np.complex64).reshape(14, nsubc)
    o += 14 * int(nsubc) * 8
    m = np.frombuffer(out[o:o + 24], dtype=np.float32)
    noise_ref, rsrp_ref, epre_ref, snr_ref, ta_ref, cfo_ref = m
    o += 24
    t_sym = np.frombuffer(out[o:], dtype=np.float64)

    dsyms = {1: [2], 2: [2, 11], 3: [2, 7, 11], 4: [2, 5, 8, 11]}[int(nd)]
    times = np.asarray([t_sym[l] for l in dsyms])
    pilot_subc = np.arange(0, int(nsubc), 2)
    delay_spread = 1.0e-6 if smooth == 2 else None
    h_ours, nvar, cfo, ta = chest_ops.estimate_port_ta(
        jnp.asarray(rx), jnp.asarray(pil), pilot_subc, int(nsubc),
        scs_hz=15e3, dmrs_symbol_times_s=times,
        delay_spread_s=delay_spread)
    h_ours, nvar = np.asarray(h_ours), float(np.asarray(nvar))
    cfo, ta = float(np.asarray(cfo)), float(np.asarray(ta))

    # Reference estimate at a DM-RS symbol includes its CFO re-rotation;
    # compare both at the first DM-RS symbol.
    rot = np.exp(2j * np.pi * cfo_hz * times[0])
    true_at_sym = h_true * rot
    # Our estimate_port_ta returns the CFO-compensated (time-averaged)
    # channel; re-rotate to symbol 0's epoch like the reference does.
    ours_at_sym = h_ours * np.exp(2j * np.pi * cfo * times[0])
    mse_ref = np.mean(np.abs(h_ref[dsyms[0]] - true_at_sym) ** 2)
    mse_ours = np.mean(np.abs(ours_at_sym - true_at_sym) ** 2)
    sig = np.mean(np.abs(h_true) ** 2)
    assert mse_ours < max(2.0 * mse_ref, 1e-4 * sig), (mse_ours, mse_ref)

    true_nvar = 10 ** (-snr_db / 10)
    assert abs(10 * np.log10(nvar / noise_ref)) < 4.0, (nvar, noise_ref)
    assert abs(10 * np.log10(nvar / true_nvar)) < 4.0, (nvar, true_nvar)
    if cfo_hz and not np.isnan(cfo_ref):
        tol = max(0.15 * cfo_hz, 20.0)
        assert abs(cfo - cfo_hz) < tol, (cfo, cfo_hz)
        assert abs(cfo_ref - cfo_hz) < tol, (cfo_ref, cfo_hz)
    # TA: true dominant delay is delay_ns (plus energy at +200ns).
    assert abs(ta - ta_ref) < 100e-9, (ta, ta_ref)


from srsran_edgeric_5g_tpu.ops import prach as prach_ops


@pytest.mark.parametrize("is_long,root,pre,zcz,restricted", [
    (1, 22, 0, 11, 0),     # long format 0, unrestricted
    (1, 22, 37, 11, 0),    # deep in the preamble table (root walk)
    (1, 300, 13, 12, 0),   # high logical root
    (1, 5, 63, 0, 0),      # zcz 0: one preamble per root
    (0, 30, 9, 4, 0),      # short L=139 (B4)
])
def test_prach_generator_parity(harness, is_long, root, pre, zcz,
                                restricted):
    """prach_generator_impl (logical-root walk + cyclic shifts + ZC DFT) vs
    ops/prach.generate: same frequency-domain preamble up to one global
    complex scale (the implementations normalize differently).

    Restricted sets are NOT cross-validatable: the reference generator only
    implements UNRESTRICTED (prach_generator_impl.cpp:260 asserts) — our
    restricted-set-A support exceeds it and is validated by the
    spec-derived tests in test_pucch_prach.py."""
    out = harness("prachgen", is_long, root, pre, zcz, restricted)
    (n,) = np.frombuffer(out[:4], dtype=np.uint32)
    ref = np.frombuffer(out[4:], dtype=np.complex64)
    assert len(ref) == n

    l_ra = prach_ops.L_LONG if is_long else prach_ops.L_SHORT
    if zcz == 0:
        ncs = 0
    elif is_long:
        ncs = prach_ops.ncs_from_zcz(zcz, "a" if restricted else None)
    else:
        ncs = prach_ops.ncs_from_zcz_short(zcz)
    cfg = prach_ops.PrachConfig(root_sequence_index=root,
                                zero_correlation_zone=ncs, l_ra=l_ra,
                                restricted="a" if restricted else None)
    ours = np.asarray(prach_ops.generate(cfg, pre))
    # One global complex scale is allowed; the normalized correlation must
    # be 1 and the scaled sequences must match elementwise.
    scale = np.vdot(ours, ref) / np.vdot(ours, ours)
    np.testing.assert_allclose(ours * scale, ref, atol=2e-3 * np.abs(ref).max())
    corr = np.abs(np.vdot(ours, ref)) / (
        np.linalg.norm(ours) * np.linalg.norm(ref))
    assert corr > 0.99999, corr


@pytest.mark.parametrize("nprb,width,pcid,seq,sfn,subframe,symbol", [
    (24, 9, 2, 7, 100, 3, 5),
    (106, 12, 513, 65000, 255, 9, 13),
    (273, 9, 1, 0, 0, 0, 0),       # numPrb > 255 -> encoded as 0
])
def test_ofh_uplane_frame_parity(harness, nprb, width, pcid, seq, sfn,
                                 subframe, symbol):
    """eCPRI U-Plane DL frame (section type 1, static BFP compression) built
    by native/ofh vs the reference's ecpri_packet_builder_impl +
    ofh_uplane_message_builder_static_compression_impl: byte-exact, and our
    parser recovers the reference frame's header + payload."""
    from srsran_edgeric_5g_tpu.runtime import ofh as ofh_rt

    out = harness("ouplane", nprb, width, pcid, seq, sfn, subframe, 0,
                  symbol, 11)
    (total,) = np.frombuffer(out[:4], dtype=np.uint32)
    nsamp = nprb * 12
    iq = np.frombuffer(out[4:4 + nsamp * 8], dtype=np.complex64)
    frame_ref = out[4 + nsamp * 8:]
    assert len(frame_ref) == total

    mant, exp = ofh.bfp_compress(jnp.asarray(iq), width, 1.0)
    packed = ofh.pack_prbs(np.asarray(mant), width)
    # mu=0: the slot index within the subframe is always 0.
    ours = ofh_rt.build_dl_frame(pcid, seq, sfn, subframe, 0, symbol,
                                 0, width, np.asarray(exp).astype(np.uint8),
                                 packed)
    assert ours == frame_ref

    hdr, exps2, packed2 = ofh_rt.parse_frame(frame_ref, width)
    assert (hdr.pc_id, hdr.seq_id, hdr.sfn & 0xFF) == (pcid, seq, sfn & 0xFF)
    assert (hdr.subframe, hdr.symbol, hdr.nof_prb) == (subframe, symbol,
                                                       nprb)
    np.testing.assert_array_equal(exps2, np.asarray(exp).astype(np.uint8))
    np.testing.assert_array_equal(packed2, packed)


@pytest.mark.parametrize("tci,payload_len,seed", [
    (0x0123, 200, 3),     # normal eCPRI-sized payload
    (0xFFF, 10, 4),       # short payload -> 64-byte minimum padding
])
def test_ofh_eth_frame_parity(harness, tci, payload_len, seed):
    """VLAN Ethernet framing vs the reference's
    vlan_ethernet_frame_builder_impl (tagged header, byte-exact) and
    vlan_ethernet_frame_decoder_impl (NIC-stripped parse: same eth_type and
    payload span, incl. the minimum-length zero padding)."""
    from srsran_edgeric_5g_tpu.runtime import ofh as ofh_rt

    out = harness("oeth", tci, ofh_rt.ECPRI_ETH_TYPE, payload_len, seed)
    dst, src = out[:6], out[6:12]
    (flen,) = np.frombuffer(out[12:16], dtype=np.uint32)
    frame_ref = out[16:16 + flen]
    (ptype, rlen) = np.frombuffer(out[16 + flen:24 + flen], dtype=np.uint32)
    rest_ref = out[24 + flen:24 + flen + rlen]

    payload = frame_ref[18:18 + payload_len]
    ours = ofh_rt.build_eth_frame(dst, src, tci, payload)
    assert ours == frame_ref

    # Our parser on the tagged loopback form recovers everything.
    d2, s2, tci2, et2, pl2 = ofh_rt.parse_eth_frame(frame_ref)
    assert (d2, s2, tci2, et2) == (dst, src, tci, ofh_rt.ECPRI_ETH_TYPE)
    assert pl2[:payload_len] == payload

    # And on the NIC-stripped form we agree with the reference decoder's
    # eth_type + payload span (which keeps the min-length padding) — or
    # with its <64-byte drop rule when stripping the tag goes sub-minimum.
    stripped = frame_ref[:12] + frame_ref[16:]
    if len(stripped) >= 64:
        d3, s3, tci3, et3, pl3 = ofh_rt.parse_eth_frame(stripped)
        assert (d3, s3, tci3) == (dst, src, None)
        assert et3 == ptype
        assert pl3 == rest_ref
    else:
        assert rlen == 0  # the reference dropped it
        with pytest.raises(AssertionError):
            ofh_rt.parse_eth_frame(stripped)


def test_ofh_eth_slot_roundtrip():
    """Whole DL slot: BFP compress -> eCPRI U-Plane frames -> VLAN Ethernet
    frames -> parse -> decompress recovers the grid to BFP-9 accuracy."""
    from srsran_edgeric_5g_tpu.runtime import ofh as ofh_rt

    rng = np.random.default_rng(5)
    grid = (rng.normal(size=(14, 624)) + 1j * rng.normal(size=(14, 624))) \
        .astype(np.complex64) * 0.3
    msgs = ofh_rt.frame_dl_slot(grid, pc_id=1, sfn=7, subframe=2, slot=0)
    dst, src = b"\x02\x00\x00\x00\x00\x01", b"\x02\x00\x00\x00\x00\x02"
    eth = [ofh_rt.build_eth_frame(dst, src, 1, m) for m in msgs]
    back = []
    for f in eth:
        d, s, tci, et, pl = ofh_rt.parse_eth_frame(f)
        assert (d, s, tci, et) == (dst, src, 1, ofh_rt.ECPRI_ETH_TYPE)
        back.append(pl)
    rec = ofh_rt.deframe_dl_slot(back)
    err = np.mean(np.abs(rec - grid) ** 2) / np.mean(np.abs(grid) ** 2)
    assert err < 2e-4  # BFP-9 quantization floor


from srsran_edgeric_5g_tpu.ops import ulsch_demux as ud


def _demux_positions(harness, args):
    """Reconstruct the reference demux's exact source position of every
    output softbit from three digit-plane runs."""
    outs = []
    for mode in (0, 1, 2):
        out = harness("ulschdemux", *args[:8], mode, *args[8:])
        g, nsch, nack, ncsi, ncsi2 = np.frombuffer(out[:20], np.uint32)
        o = 20
        streams = []
        for n in (int(nsch), int(nack), int(ncsi), int(ncsi2)):
            streams.append(np.frombuffer(out[o:o + n], np.int8))
            o += n
        outs.append(tuple(streams))

    def pos(i):
        return ((outs[0][i].astype(np.int64) + 50)
                + 100 * (outs[1][i].astype(np.int64) + 50)
                + 10000 * (outs[2][i].astype(np.int64) + 50))

    def erased(i):
        return (outs[0][i] == 0) & (outs[1][i] == 0) & (outs[2][i] == 0)

    return int(g), pos(0), pos(1), pos(2), pos(3), erased(0), erased(3)


@pytest.mark.parametrize("nprb,nsym,qm,oack,gack,ocsi,gcsi,grvd,ocsi2,gcsi2", [
    (26, 14, 6, 4, 24, 8, 48, 0, 0, 0),    # both fields, one symbol each
    (26, 14, 6, 11, 3000, 0, 0, 0, 0, 0),  # ACK spills into a 2nd symbol
    (26, 14, 6, 4, 24, 11, 6552, 0, 0, 0), # CSI crosses the ACK symbol
    (26, 14, 6, 4, 24, 11, int((312+312+100)*6), 0, 0, 0),  # CSI partial
    (26, 14, 2, 4, 16, 0, 0, 0, 0, 0),     # QPSK
    (26, 14, 6, 2, 12, 0, 0, 24, 0, 0),    # o_ack<=2: reserved + puncture
    (26, 14, 6, 2, 12, 8, 48, 24, 0, 0),   # reserved + CSI
    (26, 14, 6, 4, 24, 8, 48, 0, 6, 36),   # ACK + CSI1 + CSI2
    (26, 14, 6, 0, 0, 8, 48, 0, 11, 4008), # CSI2 spills across symbols
    (26, 14, 6, 2, 12, 8, 48, 24, 6, 3000),# reserved mode + CSI2 (CSI2 may
                                           # land on reserved REs and get
                                           # ACK-punctured)
])
def test_ulsch_demux_parity(harness, nprb, nsym, qm, oack, gack, ocsi, gcsi,
                            grvd, ocsi2, gcsi2):
    """TS 38.212 6.2.7 UL-SCH demultiplex placement vs
    ulsch_demultiplex_impl: ACK/CSI1/CSI2 source positions, the SCH stream's
    kept positions, and the reserved-mode ACK-puncture erasures all agree
    position-for-position."""
    g, sch_pos, ack_pos, csi_pos, csi2_pos, sch_erased, csi2_erased = \
        _demux_positions(harness, (nprb, nsym, qm, oack, gack, ocsi, gcsi,
                                   grvd, ocsi2, gcsi2))

    # Mirror the harness grid: DM-RS at slot symbols {2, 11}, type 1 with 2
    # CDM groups -> DM-RS symbols carry no data.
    dsyms = tuple(l for l in range(nsym) if l not in (2, 11) or nsym <= 11)
    plan = ud.get_demux_plan(g, qm, nprb * 12, dsyms, 2, g_ack=gack,
                             g_csi1=gcsi, g_ack_rvd=grvd, o_ack=oack,
                             g_csi2=gcsi2)
    np.testing.assert_array_equal(plan.ack_positions, ack_pos)
    np.testing.assert_array_equal(plan.csi1_positions, csi_pos)
    # The reference emits SCH (and CSI2) in stream order (== our ascending
    # positions).  Reserved-mode punctured entries are zeroed in its
    # output, so their source positions are unrecoverable — compare the
    # erasure mask there and the positions everywhere else.
    assert len(csi2_pos) == len(plan.csi2_positions)
    np.testing.assert_array_equal(csi2_erased, plan.csi2_erased)
    if len(csi2_pos):
        keep2 = ~plan.csi2_erased
        np.testing.assert_array_equal(plan.csi2_positions[keep2],
                                      csi2_pos[keep2])
    assert len(sch_pos) == plan.sch_len
    np.testing.assert_array_equal(sch_erased, plan.sch_erased)
    keep = ~plan.sch_erased
    np.testing.assert_array_equal(plan.sch_positions[keep], sch_pos[keep])


from srsran_edgeric_5g_tpu.models import pdcch as pdcch_model


@pytest.mark.parametrize("a,e,rnti", [(40, 216, 0x4601), (28, 432, 0xFFFF),
                                      (52, 108, 1)])
def test_pdcch_encoder_parity(harness, a, e, rnti):
    """pdcch_encoder_impl (ones-prefixed CRC24C + RNTI mask + DCI polar
    chain) vs models/pdcch.encode_dci: bit-exact."""
    nmsg = 3
    out = harness("pdcchenc", a, e, rnti, nmsg, 5)
    rec = a + e
    for i in range(nmsg):
        blob = out[i * rec:(i + 1) * rec]
        data = np.frombuffer(blob[:a], dtype=np.uint8)
        enc_ref = np.frombuffer(blob[a:], dtype=np.uint8)
        code = polar_code.construct(a + 24, e, nmax=polar_code.NMAX_DL,
                                    i_il=True)
        # encode_dci derives E from the aggregation level; drive the same
        # chain at arbitrary (A, E) directly:
        from srsran_edgeric_5g_tpu.ops.polar import encoder as _pe
        from srsran_edgeric_5g_tpu.ops.polar import rate_match as _prm
        from srsran_edgeric_5g_tpu.ops.crc import crc as _crc
        ones = jnp.ones((1, 24), jnp.int8)
        crc_bits = _crc(jnp.concatenate(
            [ones, jnp.asarray(data.astype(np.int8))[None]], axis=1),
            "crc24c")
        rnti_bits = jnp.asarray([(rnti >> (15 - i2)) & 1 for i2 in range(16)],
                                jnp.int8)
        crc_bits = crc_bits.at[:, 8:].set(
            jnp.bitwise_xor(crc_bits[:, 8:], rnti_bits[None]))
        k_bits = jnp.concatenate([jnp.asarray(data.astype(np.int8))[None],
                                  crc_bits], axis=1)
        cw = _pe.encode(k_bits, code)
        ours = np.asarray(_prm.rate_match(cw, code))[0]
        np.testing.assert_array_equal(ours, enc_ref)


from srsran_edgeric_5g_tpu.models import ssb as ssb_model


@pytest.mark.parametrize("pci,ssbi,lmax,hrf,sfn,kssb", [
    (123, 2, 8, 0, 100, 0),
    (500, 7, 8, 1, 1023, 5),
    (3, 1, 4, 1, 0, 11),       # L_max=4: DM-RS i_bar includes the hrf bit
    (700, 37, 64, 0, 512, 0),  # L_max=64: SSB index MSBs in the payload
])
def test_ssb_grid_parity(harness, pci, ssbi, lmax, hrf, sfn, kssb):
    """The complete SS/PBCH block grid (PSS + SSS + PBCH with the full
    TS 38.212 7.1.1 chain + DM-RS) vs the reference's pbch_encoder +
    pbch_modulator + pss/sss/dmrs_pbch processors: every RE equal, and our
    decode recovers the payload from the reference's grid."""
    out = harness("ssbgrid", pci, ssbi, lmax, hrf, sfn, kssb, 7)
    payload = np.frombuffer(out[:24], dtype=np.uint8)
    enc_ref = np.frombuffer(out[24:24 + 864], dtype=np.uint8)
    grid_ref = np.frombuffer(out[24 + 864:],
                             dtype=np.complex64).reshape(4, 240)

    cfg = ssb_model.SsbConfig(pci=pci, ssb_index=ssbi, l_max=lmax,
                              hrf=bool(hrf), sfn=sfn, k_ssb=kssb)
    ours_bits = np.asarray(ssb_model.pbch_encode(
        jnp.asarray(payload.astype(np.int8))[None], cfg))[0]
    np.testing.assert_array_equal(ours_bits, enc_ref)

    grid = np.asarray(ssb_model.process(
        jnp.asarray(payload.astype(np.int8))[None], cfg, 4, 240))
    np.testing.assert_allclose(grid, grid_ref, atol=2e-4)

    dec, ok = ssb_model.decode(jnp.asarray(grid_ref), cfg)
    assert bool(np.asarray(ok)[0])
    np.testing.assert_array_equal(np.asarray(dec)[0], payload)


from srsran_edgeric_5g_tpu.models import pdsch as pdsch_model


@pytest.mark.parametrize("bwp,alloc,qm,rv,tbs_bytes,rnti,nid", [
    (52, 52, 6, 0, 1000, 0x4601, 1),     # full-BW 64QAM, 1 CB
    (106, 106, 6, 0, 3000, 0x4602, 500), # 20 MHz, multiple CBs
    (52, 52, 2, 2, 200, 0xFFFF, 2),      # QPSK, rv 2
    (52, 52, 8, 0, 1500, 0x4603, 77),    # 256QAM
])
def test_pdsch_processor_grid_parity(harness, bwp, alloc, qm, rv, tbs_bytes,
                                     rnti, nid):
    """The COMPLETE reference pdsch_processor (segment+CRC24A/B -> LDPC ->
    rate match -> scramble -> QAM -> RG map + DM-RS type 1) vs
    models/pdsch.process: every resource element equal."""
    out = harness("pdschproc", bwp, alloc, qm, rv, tbs_bytes, rnti, nid, 7)
    nsubc, nbytes = np.frombuffer(out[:8], dtype=np.uint32)
    data = np.frombuffer(out[8:8 + int(nbytes)], dtype=np.uint8)
    grid_ref = np.frombuffer(out[8 + int(nbytes):],
                             dtype=np.complex64).reshape(14, int(nsubc))

    payload = np.unpackbits(data).astype(np.int8)
    cfg = pdsch_model.PdschConfig(
        rnti=rnti, nof_prb=alloc, start_prb=0, first_symbol=2,
        nof_symbols=12, dmrs_symbols=(2, 7, 11),
        modulation={2: "qpsk", 4: "qam16", 6: "qam64", 8: "qam256"}[qm],
        n_id=nid, tbs=tbs_bytes * 8)
    grid = np.asarray(pdsch_model.process(jnp.asarray(payload)[None], cfg,
                                          14, int(nsubc), rv=rv))
    # The reference grid stores cbf16 (brain-float complex); rounding ours
    # through bf16 must reproduce it EXACTLY.
    ours_bf16 = (np.asarray(jnp.asarray(grid.real, jnp.bfloat16),
                            np.float32)
                 + 1j * np.asarray(jnp.asarray(grid.imag, jnp.bfloat16),
                                   np.float32)).astype(np.complex64)
    np.testing.assert_array_equal(ours_bf16, grid_ref)


from srsran_edgeric_5g_tpu.models import pusch as pusch_model


@pytest.mark.parametrize("nprb,qm,tbs_bytes,snr_db", [
    (52, 6, 1000, None),    # clean channel
    (52, 6, 1000, 25.0),    # AWGN
    (106, 2, 500, 20.0),    # QPSK 20 MHz
    (52, 8, 1500, 30.0),    # 256QAM
])
def test_reference_receiver_decodes_our_pusch(harness, nprb, qm, tbs_bytes,
                                              snr_db):
    """INTEROP: the reference's COMPLETE PUSCH receiver
    (pusch_processor_impl: DM-RS channel estimation -> MMSE -> demap ->
    descramble -> rate dematch -> LDPC decode -> CRC) decodes a transport
    block transmitted by OUR PUSCH model, through AWGN."""
    import subprocess as sp

    rnti, nid, rv = 0x4601, 1, 0
    rng = np.random.default_rng(3)
    payload = rng.integers(0, 2, (1, tbs_bytes * 8), dtype=np.int8)
    cfg = pusch_model.PdschConfig(
        rnti=rnti, nof_prb=nprb, start_prb=0, first_symbol=2,
        nof_symbols=12, dmrs_symbols=(2, 11),
        modulation={2: "qpsk", 4: "qam16", 6: "qam64", 8: "qam256"}[qm],
        n_id=nid, tbs=tbs_bytes * 8)
    grid = np.asarray(pusch_model.transmit(jnp.asarray(payload), cfg, 14,
                                           nprb * 12))
    if snr_db is not None:
        sig = np.mean(np.abs(grid[grid != 0]) ** 2)
        sigma = np.sqrt(sig * 10 ** (-snr_db / 10) / 2)
        noise = (rng.normal(size=grid.shape)
                 + 1j * rng.normal(size=grid.shape)) * sigma
        grid = (grid + noise).astype(np.complex64)

    r = sp.run([str(HARNESS), "puschproc", str(nprb), str(qm), "0",
                str(tbs_bytes), str(rnti), str(nid), "6", "0"],
               input=grid.astype(np.complex64).tobytes(),
               capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-400:]
    out = r.stdout
    ok = out[0]
    sinr = np.frombuffer(out[1:5], dtype=np.float32)[0]
    data = np.frombuffer(out[5:5 + tbs_bytes], dtype=np.uint8)
    assert ok == 1, f"reference CRC failed (sinr {sinr:.1f} dB)"
    np.testing.assert_array_equal(np.unpackbits(data),
                                  payload[0].astype(np.uint8))
    if snr_db is not None:
        assert abs(sinr - snr_db) < 6.0, sinr


@pytest.mark.parametrize("root,zcz,pre,delay_ns,snr_db", [
    (22, 11, 5, 2000, 10.0),
    (22, 11, 37, 0, 10.0),
    (300, 12, 13, 4000, 6.0),
    (5, 0, 63, 1000, 10.0),     # zcz 0: one preamble per root
])
def test_prach_detector_parity(harness, root, zcz, pre, delay_ns, snr_db):
    """prach_detector_generic_impl (IDFT correlation + noise-floor
    thresholds) vs ops/prach.detect on IDENTICAL noisy delayed preambles:
    same detected preamble, no false positives among the monitored 64, and
    timing advance within one time-resolution step of each other."""
    out = harness("prachdet", root, zcz, 0, pre, delay_ns,
                  int(snr_db * 10), 1, 7)
    nsym, ndet = np.frombuffer(out[:8], dtype=np.uint32)
    o = 8
    dets = []
    for _ in range(int(ndet)):
        (idx,) = np.frombuffer(out[o:o + 4], dtype=np.uint32)
        ta, metric = np.frombuffer(out[o + 4:o + 12], dtype=np.float32)
        dets.append((int(idx), float(ta), float(metric)))
        o += 12
    sym = np.frombuffer(out[o:o + 839 * 8], dtype=np.complex64)

    assert [d[0] for d in dets] == [pre], dets

    ncs = prach_ops.ncs_from_zcz(zcz) if zcz else 0
    cfg = prach_ops.PrachConfig(root_sequence_index=root,
                                zero_correlation_zone=ncs)
    det = prach_ops.detect(jnp.asarray(sym), cfg)
    detected = np.flatnonzero(np.asarray(det.detected))
    assert detected.tolist() == [pre], (detected, np.asarray(det.metrics)[pre])
    # Delay agreement: ours in L_RA-domain samples -> seconds.
    t_sample = 1.0 / (1250.0 * 839)
    ours_ta = float(np.asarray(det.delays)[pre]) * t_sample
    assert abs(ours_ta - dets[0][1]) < 1.5e-6, (ours_ta, dets[0][1])


from srsran_edgeric_5g_tpu.ops import pucch as pucch_ops


@pytest.mark.parametrize("nack,ack_val,m0,nid,snr_db", [
    (1, 1, 0, 123, 10.0),    # ACK
    (1, 0, 3, 123, 10.0),    # NACK, nonzero initial shift
    (2, 2, 7, 500, 10.0),    # 2-bit ACK (value 0b10 -> shift +6... spec map)
])
def test_pucch_f0_interop(harness, nack, ack_val, m0, nid, snr_db):
    """INTEROP: the reference's pucch_detector_format0 detects HARQ-ACK
    from OUR PUCCH Format 0 transmission (TS 38.213 9.2.3 cyclic-shift
    signalling) through AWGN."""
    import subprocess as sp

    nprb, start_prb, start_sym, nsym, slot = 6, 2, 12, 2, 0
    # TS 38.213 Table 9.2.3-1/-2: m_cs from ACK values.
    if nack == 1:
        m_cs = 6 * ack_val
        bits = [ack_val]
    else:
        m_cs = {0: 0, 1: 3, 2: 9, 3: 6}[ack_val]
        bits = [(ack_val >> 1) & 1, ack_val & 1]
    cfg = pucch_ops.Pucch01Config(n_id=nid, slot=slot,
                                  start_symbol=start_sym, nof_symbols=nsym,
                                  initial_cs=m0, prb=start_prb)
    seq = np.asarray(pucch_ops.format0_generate(cfg, (m0 + m_cs) % 12))
    grid = np.zeros((14, nprb * 12), np.complex64)
    rng = np.random.default_rng(5)
    sigma = np.sqrt(10 ** (-snr_db / 10) / 2)
    grid += (rng.normal(size=grid.shape)
             + 1j * rng.normal(size=grid.shape)).astype(np.complex64) * sigma
    grid[start_sym:start_sym + nsym,
         start_prb * 12:(start_prb + 1) * 12] += seq

    r = sp.run([str(HARNESS), "pucchf0", str(nprb), str(start_prb),
                str(start_sym), str(nsym), str(m0), str(nid), str(nack),
                "0"], input=grid.tobytes(), capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-300:]
    o = r.stdout
    valid, nbits = o[0], o[1]
    det_bits = list(o[2:2 + nbits])
    assert valid == 1, "reference did not detect our PUCCH F0"
    assert det_bits == bits, (det_bits, bits)


from srsran_edgeric_5g_tpu.models import pdcch as pdcch_model


@pytest.mark.parametrize(
    "bwp,start_sym,dur,al,cce,il,rows,shift,rnti,nid,npay", [
        (48, 1, 1, 4, 2, 0, 2, 0, 0x4601, 41, 40),   # non-interleaved AL4
        (48, 0, 1, 8, 0, 1, 2, 11, 0x17, 500, 39),   # interleaved R=2+shift
        (108, 2, 1, 16, 0, 1, 3, 0, 0xFFF0, 2, 60),  # interleaved R=3, AL16
        (48, 1, 1, 1, 7, 0, 2, 0, 1, 1007, 28),      # AL1 high CCE
        (48, 0, 2, 4, 3, 0, 2, 0, 0x4601, 41, 40),   # duration 2
        (48, 0, 2, 8, 1, 1, 2, 5, 0x17, 500, 39),    # dur 2, interleaved
        (48, 0, 3, 4, 2, 0, 2, 0, 0xABCD, 7, 44),    # duration 3
        (36, 0, 3, 2, 1, 1, 6, 2, 0x1234, 77, 32),   # dur 3, interleaved R=6
    ])
def test_pdcch_processor_grid_parity(harness, bwp, start_sym, dur, al, cce,
                                     il, rows, shift, rnti, nid, npay):
    """The COMPLETE reference pdcch_processor (pdcch_encoder + QPSK
    modulator + scrambling + DM-RS + CCE-to-REG mapping, interleaved and
    non-interleaved, CORESET durations 1-3) vs models/pdcch.process: every
    RE equal."""
    out = harness("pdcchproc", bwp, start_sym, dur, al, cce, il, rows, shift,
                  rnti, nid, npay, 7)
    nsubc, npayload = np.frombuffer(out[:8], dtype=np.uint32)
    payload = np.frombuffer(out[8:8 + int(npayload)], dtype=np.uint8)
    grid_ref = np.frombuffer(out[8 + int(npayload):],
                             dtype=np.complex64).reshape(14, int(nsubc))

    cfg = pdcch_model.PdcchConfig(
        rnti=rnti, n_id=nid, aggregation_level=al, cce_index=cce,
        start_symbol=start_sym, coreset_start_prb=0, payload_bits=npay,
        coreset_nof_prb=bwp, duration=dur, interleaved=bool(il),
        interleaver_rows=rows, shift_index=shift)
    grid = np.asarray(pdcch_model.process(
        jnp.asarray(payload.astype(np.int8))[None], cfg, 14, int(nsubc)))
    # The PDCCH mapper path keeps f32 (the mapper's contiguous-put route, no
    # cbf16 view writes) — every RE must be exactly equal.
    np.testing.assert_array_equal(grid, grid_ref)


from srsran_edgeric_5g_tpu.ops import csi_rs as csi_mod


@pytest.mark.parametrize("row,start_rb,nof_rb,k0,l0,density,sid,slot", [
    (1, 0, 12, 2, 4, 3, 500, 3),    # row 1: density three (k0 + {0,4,8})
    (1, 4, 24, 0, 13, 3, 13, 1),
    (2, 4, 24, 7, 9, 2, 13, 1),     # row 2: density one
    (2, 0, 52, 11, 0, 2, 1007, 0),
])
def test_csi_rs_generator_grid_parity(harness, row, start_rb, nof_rb, k0,
                                      l0, density, sid, slot):
    """nzp_csi_rs_generator_impl (TS 38.211 7.4.1.5 rows 1 and 2, no CDM)
    vs ops/csi_rs.map_csi_rs: every RE equal through cbf16."""
    bwp = start_rb + nof_rb
    out = harness("csirs", bwp, row, start_rb, nof_rb, k0, l0, density, sid,
                  slot)
    nsubc = int(np.frombuffer(out[:4], dtype=np.uint32)[0])
    grid_ref = np.frombuffer(out[4:], dtype=np.complex64).reshape(14, nsubc)

    cfg = csi_mod.CsiRsConfig(scrambling_id=sid, slot=slot, symbol=l0,
                              start_prb=start_rb, nof_prb=nof_rb,
                              density=3 if density == 3 else 1,
                              comb_offset=k0)
    grid = np.asarray(csi_mod.map_csi_rs(
        jnp.zeros((14, nsubc), jnp.complex64), cfg))
    np.testing.assert_array_equal(grid, grid_ref)


@pytest.mark.parametrize("nack,ack_bits,m0,occ,nsym,start_sym,prb,nid", [
    (1, (1,), 0, 0, 14, 0, 1, 42),
    (2, (1, 0), 3, 1, 8, 4, 2, 500),
    (1, (0,), 9, 2, 4, 10, 0, 7),
    (2, (0, 1), 6, 0, 10, 2, 3, 301),
])
def test_pucch_f1_interop(harness, nack, ack_bits, m0, occ, nsym, start_sym,
                          prb, nid):
    """INTEROP: the reference's COMPLETE PUCCH F1 receiver
    (dmrs_pucch_processor_format1 channel estimation from the even-offset
    DM-RS + pucch_detector_format1 OCC despread on the odd-offset data
    symbols) detects OUR format1_process transmission through AWGN."""
    import subprocess as sp

    nprb = 6
    cfg = pucch_ops.Pucch01Config(n_id=nid, slot=0, start_symbol=start_sym,
                                  nof_symbols=nsym, initial_cs=m0, prb=prb)
    grid = np.asarray(pucch_ops.format1_process(
        np.asarray(ack_bits), cfg, 14, nprb * 12, occ_index=occ))
    rng = np.random.default_rng(11)
    sigma = np.sqrt(10 ** (-20.0 / 10) / 2)   # 20 dB SNR
    grid = (grid + (rng.normal(size=grid.shape)
                    + 1j * rng.normal(size=grid.shape)) * sigma
            ).astype(np.complex64)

    r = sp.run([str(HARNESS), "pucchf1", str(nprb), str(prb), str(start_sym),
                str(nsym), str(m0), str(occ), str(nid), str(nack)],
               input=grid.tobytes(), capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-300:]
    o = r.stdout
    valid, nbits = o[0], o[1]
    det_bits = list(o[2:2 + nbits])
    metric = np.frombuffer(o[4:8], dtype=np.float32)[0]
    assert valid == 1, f"reference did not detect our PUCCH F1 ({metric=})"
    assert det_bits == list(ack_bits), (det_bits, ack_bits)


@pytest.mark.parametrize("K,nof_prb,nsym,start_sym,start_prb,rnti,nid,nid0", [
    (4, 2, 1, 13, 0, 0x4601, 42, 7),      # short block RM(32,K)
    (11, 2, 2, 12, 3, 0x17, 500, 500),    # short block, 2 symbols
    (16, 4, 2, 12, 0, 0xFFF0, 2, 13),     # polar CRC6 + 3 PC bits
    (22, 9, 2, 12, 1, 0x0001, 1007, 0),   # polar CRC11
])
def test_pucch_f2_interop(harness, K, nof_prb, nsym, start_sym, start_prb,
                          rnti, nid, nid0):
    """INTEROP: the reference's COMPLETE PUCCH F2 receiver
    (dmrs_pucch_processor_format2 chest -> pucch_demodulator ZF equalize +
    QPSK demap + descramble -> uci_decoder short-block/polar) recovers the
    UCI payload transmitted by OUR format2_process, through AWGN."""
    import subprocess as sp

    nprb_grid = start_prb + nof_prb + 1
    cfg = pucch_ops.Pucch2Config(rnti=rnti, n_id=nid, n_id0=nid0, slot=0,
                                 start_symbol=start_sym, nof_symbols=nsym,
                                 start_prb=start_prb, nof_prb=nof_prb,
                                 uci_bits=K)
    rng = np.random.default_rng(13)
    payload = rng.integers(0, 2, (1, K), dtype=np.int8)
    grid = np.asarray(pucch_ops.format2_process(
        jnp.asarray(payload), cfg, 14, nprb_grid * 12))
    sigma = np.sqrt(10 ** (-20.0 / 10) / 2)   # 20 dB SNR
    grid = (grid + (rng.normal(size=grid.shape)
                    + 1j * rng.normal(size=grid.shape)) * sigma
            ).astype(np.complex64)

    r = sp.run([str(HARNESS), "pucchf2", str(nprb_grid), str(start_prb),
                str(nof_prb), str(start_sym), str(nsym), str(rnti), str(nid),
                str(nid0), str(K)],
               input=grid.tobytes(), capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-300:]
    o = r.stdout
    valid = o[0]
    k_out = int(np.frombuffer(o[1:5], dtype=np.uint32)[0])
    bits = np.frombuffer(o[5:5 + k_out], dtype=np.uint8)
    assert valid == 1, "reference UCI decode declared invalid"
    np.testing.assert_array_equal(bits, payload[0].astype(np.uint8))


@pytest.mark.parametrize("cfg_idx,b_idx,comb,comb_off,n_cs,sid,sym,fshift,"
                         "fpos,delay_ns", [
    (7, 0, 2, 0, 4, 330, 13, 1, 0, 0),
    (7, 0, 2, 0, 4, 330, 13, 1, 0, 200),
    (7, 0, 4, 1, 7, 17, 12, 0, 0, 0),
    (13, 1, 2, 1, 0, 999, 11, 4, 0, 100),
])
def test_srs_estimator_interop(harness, cfg_idx, b_idx, comb, comb_off,
                               n_cs, sid, sym, fshift, fpos, delay_ns):
    """INTEROP: the reference's srs_estimator_generic_impl (sequence
    correlation + IDFT time alignment) measures a clean/delayed channel from
    OUR map_srs transmission: |H| ~ 1, TA within one resolution step."""
    import subprocess as sp

    info = np.frombuffer(
        harness("srsinfo", cfg_idx, b_idx, comb, comb_off, n_cs, sid, sym,
                fshift, fpos), dtype=np.uint32)
    seq_len, group, number, ncs_i, ncs_max, k0, comb_i = map(int, info)
    assert comb_i == comb and ncs_i == n_cs
    assert group == sid % 30 and number == 0

    cfg = csi_mod.SrsConfig(sequence_id=sid, slot=0, symbol=sym,
                            start_prb=k0 // 12, nof_prb=seq_len * comb // 12,
                            comb=comb, comb_offset=k0 % 12,
                            cyclic_shift=n_cs)
    assert cfg.m_sc == seq_len
    n_cs_max_ours = 8 if comb == 2 else 12
    assert n_cs_max_ours == ncs_max

    nprb_grid = (k0 + seq_len * comb + 11) // 12
    grid = np.asarray(csi_mod.map_srs(
        jnp.zeros((14, nprb_grid * 12), jnp.complex64), cfg))
    if delay_ns:
        k = np.arange(nprb_grid * 12)
        ramp = np.exp(-2j * np.pi * 15e3 * k * delay_ns * 1e-9)
        grid = (grid * ramp[None, :]).astype(np.complex64)

    r = sp.run([str(HARNESS), "srsest", str(nprb_grid), str(cfg_idx),
                str(b_idx), str(comb), str(comb_off), str(n_cs), str(sid),
                str(sym), str(fshift), str(fpos)],
               input=grid.tobytes(), capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-300:]
    o = r.stdout
    vals = np.frombuffer(o[28:], dtype=np.float32)
    coeff = vals[0] + 1j * vals[1]
    noise_var, ta_s, ta_res = vals[2], vals[3], vals[4]
    assert abs(abs(coeff) - 1.0) < 0.05, coeff
    assert noise_var < 0.05, noise_var
    tol = max(ta_res, 50e-9)
    assert abs(ta_s - delay_ns * 1e-9) <= tol, (ta_s, delay_ns, ta_res)


@pytest.mark.parametrize("root,zcz,pre,delay_ns,snr_db", [
    (22, 11, 5, 200, 10.0),
    (1, 14, 37, 0, 10.0),
    (100, 0, 63, 400, 10.0),    # zcz 0: one preamble per root
])
def test_prach_short_detector_parity(harness, root, zcz, pre, delay_ns,
                                     snr_db):
    """Short-preamble PRACH (format B4, L=139, 15 kHz SCS):
    prach_detector_generic_impl vs ops/prach.detect on identical noisy
    delayed preambles — same detection, TA within one resolution step."""
    nsym = 12   # B4 repeats the sequence over 12 symbols
    out = harness("prachdet", root, zcz, 0, pre, delay_ns,
                  int(snr_db * 10), nsym, 7, 0)
    nsym_o, ndet = np.frombuffer(out[:8], dtype=np.uint32)
    o = 8
    dets = []
    for _ in range(int(ndet)):
        (idx,) = np.frombuffer(out[o:o + 4], dtype=np.uint32)
        ta, metric = np.frombuffer(out[o + 4:o + 12], dtype=np.float32)
        dets.append((int(idx), float(ta), float(metric)))
        o += 12
    syms = np.frombuffer(out[o:], dtype=np.complex64).reshape(int(nsym_o),
                                                              139)

    assert [d[0] for d in dets] == [pre], dets

    ncs = prach_ops.ncs_from_zcz_short(zcz) if zcz else 0
    cfg = prach_ops.PrachConfig(root_sequence_index=root,
                                zero_correlation_zone=ncs, l_ra=139)
    # Average the symbol repetitions (identical signal, independent noise)
    # before our single-window detector.
    det = prach_ops.detect(jnp.asarray(syms.mean(axis=0)), cfg)
    detected = np.flatnonzero(np.asarray(det.detected))
    assert detected.tolist() == [pre], (detected,
                                        np.asarray(det.metrics)[pre])
    t_sample = 1.0 / (15000.0 * 139)
    ours_ta = float(np.asarray(det.delays)[pre]) * t_sample
    assert abs(ours_ta - dets[0][1]) < 2.0 * t_sample, (ours_ta, dets[0][1])


@pytest.mark.parametrize("oack,ocsi1,ocsi2,qm,snr_db", [
    (2, 7, 13, 6, 28.0),    # reserved ACK mode; polar CSI2 (K=13)
    (4, 25, 0, 6, 28.0),    # skip mode; polar CSI1 (K=25, CRC11)
    (1, 0, 0, 2, 20.0),     # 1-bit ACK puncture only
])
def test_reference_receiver_decodes_our_uci_on_pusch(harness, oack, ocsi1,
                                                     ocsi2, qm, snr_db):
    """INTEROP: the reference's complete pusch_processor recovers the
    HARQ-ACK / CSI part 1 / CSI part 2 fields (short-block AND polar coded)
    multiplexed into OUR PUSCH transmission, with the coded-bit counts
    G_ack/G_csi1/G_csi2/G_rvd taken from ITS OWN get_ulsch_information —
    plus the transport block, through AWGN.

    Layout is symbols 0-13 with DM-RS at 2/11 (production srsRAN's typical
    PUSCH allocation): the reference live-locks when UCI is configured and
    the FIRST symbol is DM-RS — ulsch_demultiplex_impl parks on the
    0-softbit symbol and pusch_demodulator_impl.cpp:224 spins on empty
    get_next_block_view() blocks (see refharness cmd_puschproc)."""
    import subprocess as sp

    nprb, tbs_bytes, rnti, nid = 52, 1000, 0x4601, 1
    info = np.frombuffer(
        harness("puschproc", nprb, qm, 0, tbs_bytes, rnti, nid, 6, 0,
                oack, ocsi1, ocsi2, 1), dtype=np.uint32)
    g_sch, g_ack, g_csi1, g_csi2, g_rvd = map(int, info)

    uci = pusch_model.UciConfig(
        n_ack=oack, g_ack=g_ack, n_csi1=ocsi1, g_csi1=g_csi1,
        n_csi2=ocsi2, g_csi2=g_csi2,
        g_ack_rvd=g_rvd if oack <= 2 else 0)
    cfg = pusch_model.PdschConfig(
        rnti=rnti, nof_prb=nprb, start_prb=0, first_symbol=0,
        nof_symbols=14, dmrs_symbols=(2, 11),
        modulation={2: "qpsk", 6: "qam64"}[qm], n_id=nid,
        tbs=tbs_bytes * 8)
    from srsran_edgeric_5g_tpu.models.pusch import _uci_plan
    assert _uci_plan(cfg, uci).sch_len == g_sch

    rng = np.random.default_rng(17)
    payload = jnp.asarray(rng.integers(0, 2, (1, tbs_bytes * 8),
                                       dtype=np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (1, oack), dtype=np.int8))
    csi1 = jnp.asarray(rng.integers(0, 2, (1, ocsi1), dtype=np.int8)) \
        if ocsi1 else None
    csi2 = jnp.asarray(rng.integers(0, 2, (1, ocsi2), dtype=np.int8)) \
        if ocsi2 else None
    grid = np.asarray(pusch_model.transmit(
        payload, cfg, 14, nprb * 12, uci=uci, ack_bits=ack,
        csi1_bits=csi1, csi2_bits=csi2))
    sig = np.mean(np.abs(grid[grid != 0]) ** 2)
    sigma = np.sqrt(sig * 10 ** (-snr_db / 10) / 2)
    grid = (grid + (rng.normal(size=grid.shape)
                    + 1j * rng.normal(size=grid.shape)) * sigma
            ).astype(np.complex64)

    r = sp.run([str(HARNESS), "puschproc", str(nprb), str(qm), "0",
                str(tbs_bytes), str(rnti), str(nid), "6", "0",
                str(oack), str(ocsi1), str(ocsi2), "0"],
               input=grid.tobytes(), capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-400:]
    out = r.stdout
    ok = out[0]
    data = np.frombuffer(out[5:5 + tbs_bytes], dtype=np.uint8)
    o = 5 + tbs_bytes
    (ns,) = np.frombuffer(out[o:o + 4], dtype=np.uint32)
    o += 4 + int(ns)
    assert out[o] == 1, "no UCI result from the reference"
    o += 1
    fields = []
    for _ in range(3):
        valid = out[o]
        (n,) = np.frombuffer(out[o + 1:o + 5], dtype=np.uint32)
        bits = np.frombuffer(out[o + 5:o + 5 + int(n)], dtype=np.uint8)
        fields.append((valid, bits))
        o += 5 + int(n)

    assert ok == 1, "reference TB CRC failed"
    np.testing.assert_array_equal(np.unpackbits(data),
                                  np.asarray(payload)[0].astype(np.uint8))
    assert fields[0][0] == 1, "ACK invalid"
    np.testing.assert_array_equal(fields[0][1],
                                  np.asarray(ack)[0].astype(np.uint8))
    if ocsi1:
        assert fields[1][0] == 1, "CSI1 invalid"
        np.testing.assert_array_equal(fields[1][1],
                                      np.asarray(csi1)[0].astype(np.uint8))
    if ocsi2:
        assert fields[2][0] == 1, "CSI2 invalid"
        np.testing.assert_array_equal(fields[2][1],
                                      np.asarray(csi2)[0].astype(np.uint8))


@pytest.mark.parametrize("fmt_code,fmt,root,zcz,pre,delay_ns", [
    (1, "1", 22, 11, 5, 2000),     # long format 1 (2 reps, CP 21024k)
    (2, "2", 300, 12, 13, 4000),   # long format 2 (4 reps)
    (3, "3", 22, 11, 41, 2000),    # long format 3 (5 kHz SCS, 4 reps)
    (4, "A1", 22, 11, 5, 200),     # short A1 (2 reps)
    (9, "C0", 1, 14, 37, 400),     # short C0 (1 symbol)
    (10, "C2", 100, 13, 60, 300),  # short C2 (4 reps)
])
def test_prach_format_breadth_parity(harness, fmt_code, fmt, root, zcz, pre,
                                     delay_ns):
    """PRACH format breadth (VERDICT missing #6): the reference
    prach_generator_impl + prach_detector_generic_impl at formats 1/2/3 and
    A1/C0/C2 (prach_preamble_information.cpp:30-118 layouts; 5 kHz N_cs
    table prach_cyclic_shifts.cpp for format 3) vs ops/prach.detect on
    IDENTICAL noisy delayed multi-repetition occasions: same detected
    preamble, TA within one resolution step."""
    snr_db = 10.0
    l_ra, scs, n_reps, _ = prach_ops.PRACH_FORMATS[fmt]
    is_long = 1 if l_ra == prach_ops.L_LONG else 0
    out = harness("prachdet", root, zcz, 0, pre, delay_ns,
                  int(snr_db * 10), n_reps, 7, is_long, fmt_code)
    nsym_o, ndet = np.frombuffer(out[:8], dtype=np.uint32)
    o = 8
    dets = []
    for _ in range(int(ndet)):
        (idx,) = np.frombuffer(out[o:o + 4], dtype=np.uint32)
        ta, metric = np.frombuffer(out[o + 4:o + 12], dtype=np.float32)
        dets.append((int(idx), float(ta), float(metric)))
        o += 12
    syms = np.frombuffer(out[o:], dtype=np.complex64).reshape(int(nsym_o),
                                                              l_ra)
    assert int(nsym_o) == n_reps
    assert [d[0] for d in dets] == [pre], dets

    if is_long:
        ncs = prach_ops.ncs_from_zcz(zcz, scs_hz=scs) if zcz else 0
    else:
        ncs = prach_ops.ncs_from_zcz_short(zcz) if zcz else 0
    cfg = prach_ops.PrachConfig(root_sequence_index=root,
                                zero_correlation_zone=ncs, l_ra=l_ra)
    det = prach_ops.detect(jnp.asarray(syms), cfg)  # (n_reps, L) combined
    detected = np.flatnonzero(np.asarray(det.detected))
    assert detected.tolist() == [pre], (detected,
                                        np.asarray(det.metrics)[pre])
    t_sample = 1.0 / (float(scs) * l_ra)
    ours_ta = float(np.asarray(det.delays)[pre]) * t_sample
    assert abs(ours_ta - dets[0][1]) < 2.0 * t_sample, (ours_ta, dets[0][1])


@pytest.mark.parametrize("sched", ["layered_rolls_wire", "layered_wire",
                                   "layered_rolls_wire_i8s"])
def test_ldpc_decoder_wire_schedule_matches_avx2_at_waterfall(harness, sched):
    """The production 'wire' schedules replicate the reference's PRODUCTION
    decoder (ldpc_decoder_avx2) bit-for-bit AT THE WATERFALL, where the
    avx2 impl diverges from the reference's own generic impl: scale_epi8
    TRUNCATES (mulhi) while the generic scale_llr rounds, and the implicit
    offset is worth ~0.3-0.5 dB (measured here: avx2 decodes TBs the
    generic impl leaves undecoded at the same 6 iterations)."""
    bg, zc = 1, 64
    g = get_graph(bg, zc)
    nmsg, k, n_full = 24, 22 * zc, g.cols * zc
    sigma_x1000 = 1000                       # r=1/3 waterfall
    out = harness("decode", bg, zc, nmsg, 3, sigma_x1000, 6, "avx2", 0)
    o = nmsg * k
    llrs = np.frombuffer(out[o:o + nmsg * n_full], np.int8).reshape(
        nmsg, n_full)
    o += nmsg * n_full
    ref = np.frombuffer(out[o:o + nmsg * k], np.uint8).reshape(nmsg, k)

    ours, _ = decoder.decode(jnp.asarray(llrs.astype(np.float32)), bg, zc,
                             num_iters=6, schedule=sched, early_stop=False)
    np.testing.assert_array_equal(np.asarray(ours).astype(np.uint8), ref)

    # The same inputs through the reference's generic impl diverge (this
    # pins the avx2-vs-generic scaling difference the wire schedule
    # reproduces): identical here would make the test vacuous.
    out_g = harness("decode", bg, zc, nmsg, 3, sigma_x1000, 6, "generic", 0)
    gen = np.frombuffer(out_g[2 * nmsg * k + nmsg * n_full - nmsg * k:]
                        [:nmsg * k], np.uint8)
    gen = np.frombuffer(out_g[nmsg * k + nmsg * n_full:][:nmsg * k],
                        np.uint8).reshape(nmsg, k)
    assert not (gen == ref).all()
