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
