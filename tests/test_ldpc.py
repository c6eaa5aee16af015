import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import modulation
from srsran_edgeric_5g_tpu.ops.ldpc import (
    decoder, encoder, graph, rate_match, segmenter,
)

ZCS_SMOKE = [2, 3, 5, 7, 9, 11, 13, 15]          # one per lifting-set class
ZCS_LARGE = [32, 52, 96, 144, 208, 240, 320, 384]


@pytest.mark.parametrize("bg", [1, 2])
@pytest.mark.parametrize("zc", ZCS_SMOKE + ZCS_LARGE)
def test_encode_satisfies_parity(bg, zc):
    """H @ c == 0 over GF(2) — complete validation of the encoder given H.

    Uses the gather impl for the broad sweep (fast CPU compiles); the rolls
    impl is checked for equality on representative configs below.
    """
    g = graph.get_graph(bg, zc)
    rng = np.random.default_rng(bg * 1000 + zc)
    msgs = rng.integers(0, 2, size=(4, g.k), dtype=np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msgs), bg, zc, impl="gather"))
    np.testing.assert_array_equal(cw[:, :g.k], msgs)  # systematic
    syndrome = encoder.np_check_parity(cw, bg, zc)
    assert (syndrome == 0).all(), f"nonzero syndrome rows: {np.nonzero(syndrome.sum(1))[0]}"


@pytest.mark.parametrize("bg,zc", [(1, 8), (1, 384), (2, 13), (2, 208)])
def test_encode_rolls_equals_gather(bg, zc):
    g = graph.get_graph(bg, zc)
    rng = np.random.default_rng(bg * 77 + zc)
    msgs = jnp.asarray(rng.integers(0, 2, size=(3, g.k), dtype=np.int8))
    a = np.asarray(encoder.encode(msgs, bg, zc, impl="rolls"))
    b = np.asarray(encoder.encode(msgs, bg, zc, impl="gather"))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("bg,zc", [(1, 96), (2, 52)])
def test_graph_edge_counts(bg, zc):
    g = graph.get_graph(bg, zc)
    assert g.num_edges == {1: 316, 2: 197}[bg]


def test_rate_match_full_buffer_roundtrip():
    """rv0, E=N: every non-filler bit appears exactly once; dematch inverts."""
    bg, zc = 1, 32
    g = graph.get_graph(bg, zc)
    k_prime = g.k - 3 * zc  # pretend 3 blocks of fillers
    e = g.n - (g.k - k_prime)  # exactly the non-filler positions
    e -= e % 2  # make divisible by Qm=2
    plan = rate_match.get_rate_match_plan(bg, zc, e, rv=0, qm=2, k_prime=k_prime)
    rng = np.random.default_rng(5)
    msgs = rng.integers(0, 2, size=(2, g.k), dtype=np.int8)
    msgs[:, k_prime:] = 0  # fillers zero
    cw = encoder.encode(jnp.asarray(msgs), bg, zc)
    tx = rate_match.rate_match(cw, plan)
    assert tx.shape == (2, e)
    # Soft bits back through dematcher -> positions match the codeword.
    llrs = (1 - 2 * tx.astype(jnp.float32)) * 10.0
    full = np.asarray(rate_match.rate_dematch(llrs, plan))
    cw_np = np.asarray(cw)
    # Punctured first 2*Zc: zero LLR.
    assert (full[:, :2 * zc] == 0).all()
    # Fillers: strong positive (bit 0).
    f0, f1 = 2 * zc + (k_prime - 2 * zc), 2 * zc + (g.k - 2 * zc)
    assert (full[:, f0:f1] == rate_match.FILLER_LLR).all()
    # All selected positions agree in sign with the codeword bits.
    sel = np.ones(g.n_full, dtype=bool)
    sel[:2 * zc] = False
    sel[f0:f1] = False
    sel[2 * zc + plan.n_cb:] = False
    want = (1 - 2 * cw_np[:, sel]) * 10.0
    got = full[:, sel]
    nz = got != 0
    assert nz.all(), "every non-filler buffer position is hit at E=N-fillers"
    np.testing.assert_array_equal(np.sign(got), np.sign(want))


def test_rate_match_runs_equal_index_formulation():
    """The static-slice/transpose alternative (use_runs=True, default off —
    it regresses the v5e pipeline) produces bit-exact results of the fused
    index (gather/scatter) formulation in both directions, across filler
    spans, every rv (incl. wraps), Qm values, and LBRM buffers."""
    cases = [
        (1, 64, 2 * 66 * 64, 0, 2, None),       # E = 2N: double wrap
        (1, 64, 3000, 2, 6, None),               # mid-buffer k0 + fillers
        (2, 40, 1200, 1, 4, None),               # BG2
        (1, 64, 3000, 3, 2, 2560),               # LBRM, high rv wrap
        (2, 40, 2 * 50 * 40 + 400, 3, 8, None),  # >2 wraps, 256QAM
    ]
    rng = np.random.default_rng(11)
    for bg, zc, e, rv, qm, tbs_lbrm in cases:
        g = graph.get_graph(bg, zc)
        k_prime = g.k - 2 * zc // 2
        n_cb = (rate_match.lbrm_n_cb(bg, zc, 1, tbs_lbrm)
                if tbs_lbrm else None)
        plan = rate_match.get_rate_match_plan(bg, zc, e, rv, qm, k_prime,
                                              n_cb=n_cb)
        assert len(plan.runs) <= rate_match._MAX_RUNS, \
            (len(plan.runs), bg, zc, e, rv)
        cw = jnp.asarray(rng.integers(0, 2, (3, g.n_full), dtype=np.int8))
        llr = jnp.asarray(rng.normal(size=(3, e)).astype(np.float32))
        soft = jnp.asarray(rng.normal(size=(3, plan.n_cb)).astype(np.float32))
        # Index-formulation oracle (the documented fallback path).
        buf = np.asarray(cw)[:, 2 * zc: 2 * zc + plan.n_cb]
        tx_ref = buf[:, plan.select_idx]
        acc = np.array(soft)
        np.add.at(acc, (slice(None), plan.select_idx), np.asarray(llr))
        np.testing.assert_array_equal(
            np.asarray(rate_match.rate_match(cw, plan, use_runs=True)),
            tx_ref)
        got = np.asarray(
            rate_match.rate_dematch(llr, plan, soft, use_runs=True))
        f0 = 2 * zc + (k_prime - 2 * zc)
        f1 = 2 * zc + (g.k - 2 * zc)
        inner = got[:, 2 * zc: 2 * zc + plan.n_cb]
        keep = np.ones(plan.n_cb, bool)
        keep[f0 - 2 * zc:f1 - 2 * zc] = False
        # Accumulation order differs across wrap runs: tolerate float noise.
        np.testing.assert_allclose(inner[:, keep], acc[:, keep],
                                   rtol=1e-5, atol=1e-4)
        assert (got[:, f0:f1] == rate_match.FILLER_LLR).all()


def test_rate_dematch_gather_equals_scatter():
    """The inverse-gather dematch (use_gather=True, default off — forces a
    transpose copy in the fused pipeline) matches the scatter-add
    formulation across wraps, fillers, and LBRM."""
    cases = [
        (1, 64, 2 * 66 * 64, 0, 2, None),       # E = 2N: double wrap
        (1, 64, 3000, 2, 6, None),               # mid-buffer k0 + fillers
        (1, 64, 3000, 3, 2, 2560),               # LBRM, high rv wrap
        (2, 40, 2 * 50 * 40 + 400, 3, 8, None),  # >2 wraps
    ]
    rng = np.random.default_rng(5)
    for bg, zc, e, rv, qm, tbs_lbrm in cases:
        g = graph.get_graph(bg, zc)
        k_prime = g.k - 2 * zc // 2
        n_cb = (rate_match.lbrm_n_cb(bg, zc, 1, tbs_lbrm)
                if tbs_lbrm else None)
        plan = rate_match.get_rate_match_plan(bg, zc, e, rv, qm, k_prime,
                                              n_cb=n_cb)
        llr = jnp.asarray(rng.normal(size=(3, e)).astype(np.float32))
        soft = jnp.asarray(rng.normal(size=(3, plan.n_cb)).astype(np.float32))
        want = np.asarray(rate_match.rate_dematch(llr, plan, soft))
        got = np.asarray(rate_match.rate_dematch(llr, plan, soft,
                                                 use_gather=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("rv", [0, 1, 2, 3])
def test_rate_match_rv_offsets(rv):
    bg, zc = 2, 16
    g = graph.get_graph(bg, zc)
    plan = rate_match.get_rate_match_plan(bg, zc, 200, rv, qm=2, k_prime=g.k)
    k0 = rate_match.k0_offset(bg, rv, g.n, zc)
    # First transmitted (pre-interleave) position is k0 — recover by inverting
    # the interleaver: output order positions p=j*Qm+i hold e[i*rows+j].
    assert plan.select_idx[0] == k0 % g.n


def test_decode_noiseless_roundtrip():
    bg, zc = 1, 64
    g = graph.get_graph(bg, zc)
    rng = np.random.default_rng(11)
    msgs = rng.integers(0, 2, size=(3, g.k), dtype=np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msgs), bg, zc))
    llrs = (1 - 2 * cw.astype(np.float32)) * 8.0
    llrs[:, :2 * zc] = 0.0  # puncture
    hard, ok = decoder.decode(jnp.asarray(llrs), bg, zc, num_iters=6)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hard), msgs)


def test_decode_awgn():
    """Encode -> BPSK -> AWGN at a workable SNR -> decode recovers all CBs."""
    bg, zc = 2, 64
    g = graph.get_graph(bg, zc)
    rng = np.random.default_rng(17)
    b = 8
    msgs = rng.integers(0, 2, size=(b, g.k), dtype=np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msgs), bg, zc))
    # rate ~0.2 (full buffer): transmit everything except puncture.
    tx = cw[:, 2 * zc:].astype(np.float32)
    sym = 1 - 2 * tx
    snr_db = 3.0
    sigma = 10 ** (-snr_db / 20)
    y = sym + rng.normal(size=sym.shape) * sigma
    llr = 2 * y / sigma**2
    full_llr = np.concatenate([np.zeros((b, 2 * zc), np.float32), llr], axis=1)
    hard, ok = decoder.decode(jnp.asarray(full_llr), bg, zc, num_iters=8)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hard), msgs)


def test_decode_flags_bad_parity():
    bg, zc = 2, 32
    g = graph.get_graph(bg, zc)
    llrs = np.zeros((2, g.n_full), np.float32)
    rng = np.random.default_rng(23)
    # Random garbage LLRs: decoder should (almost surely) not converge.
    llrs[:] = rng.normal(size=llrs.shape) * 3
    _, ok = decoder.decode(jnp.asarray(llrs), bg, zc, num_iters=2)
    assert not np.asarray(ok).any()


def test_segmentation_single_cb():
    plan = segmenter.get_segment_plan(a=320, bg=2, g_total=1024, qm=2)
    assert plan.c == 1 and not plan.cb_crc and plan.tb_crc == "crc16"
    rng = np.random.default_rng(3)
    payload = jnp.asarray(rng.integers(0, 2, size=(2, 320), dtype=np.int8))
    cbs = segmenter.segment_tb(payload, plan)
    assert cbs.shape == (2, plan.k)
    out, ok = segmenter.desegment_tb(cbs, plan)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))


def test_segmentation_multi_cb():
    a = 19992  # forces BG1 multi-CB; (A+24) divisible by C=3 like real TBS values
    bg = segmenter.select_base_graph(a, 0.5)
    assert bg == 1
    plan = segmenter.get_segment_plan(a=a, bg=bg, g_total=3 * a, qm=4)
    assert plan.c > 1 and plan.cb_crc and plan.tb_crc == "crc24a"
    assert plan.k_prime <= plan.k
    assert plan.c * (plan.k_prime - 24) == a + 24 + plan.c * 0  # B' split
    rng = np.random.default_rng(9)
    payload = jnp.asarray(rng.integers(0, 2, size=(1, a), dtype=np.int8))
    cbs = segmenter.segment_tb(payload, plan)
    assert cbs.shape == (plan.c, plan.k)
    # Each CB's CRC24B must verify over its K' bits.
    from srsran_edgeric_5g_tpu.ops.crc import crc_check
    assert np.asarray(crc_check(cbs[:, :plan.k_prime], "crc24b")).all()
    out, ok = segmenter.desegment_tb(cbs, plan)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))


def test_full_chain_segment_encode_ratematch_decode():
    """TB -> segment -> encode -> rate match (rv0) -> AWGN -> dematch ->
    decode -> desegment -> TB CRC ok."""
    a, qm = 8192, 4
    rate = 0.5
    g_total = int(a / rate) // qm * qm
    bg = segmenter.select_base_graph(a, rate)
    plan = segmenter.get_segment_plan(a=a, bg=bg, g_total=g_total, qm=qm)
    rng = np.random.default_rng(41)
    payload = jnp.asarray(rng.integers(0, 2, size=(1, a), dtype=np.int8))
    cbs = segment = segmenter.segment_tb(payload, plan)
    cw = encoder.encode(cbs, plan.bg, plan.zc)
    assert len(set(plan.e)) == 1, "equal E in this config"
    rm_plan = rate_match.get_rate_match_plan(plan.bg, plan.zc, plan.e[0], 0,
                                             qm, plan.k_prime)
    tx_bits = rate_match.rate_match(cw, rm_plan)
    syms = modulation.modulate(tx_bits, "qam16")
    snr_db = 9.0
    nv = 10 ** (-snr_db / 10)
    noise = (rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape))
    y = np.asarray(syms) + noise * np.sqrt(nv / 2)
    llr = modulation.demodulate_soft(jnp.asarray(y.astype(np.complex64)),
                                     jnp.float32(nv), "qam16", quantize=False)
    full = rate_match.rate_dematch(llr, rm_plan)
    hard, ok_cb = decoder.decode(full, plan.bg, plan.zc, num_iters=8)
    assert np.asarray(ok_cb).all()
    out, ok = segmenter.desegment_tb(hard, plan)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))


def test_decode_flooding_awgn():
    """Flooding schedule decodes the same AWGN scenario (2x iterations)."""
    bg, zc = 2, 64
    g = graph.get_graph(bg, zc)
    rng = np.random.default_rng(29)
    b = 8
    msgs = rng.integers(0, 2, size=(b, g.k), dtype=np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msgs), bg, zc))
    sym = 1 - 2 * cw[:, 2 * zc:].astype(np.float32)
    sigma = 10 ** (-3.0 / 20)
    y = sym + rng.normal(size=sym.shape) * sigma
    llr = np.concatenate([np.zeros((b, 2 * zc), np.float32), 2 * y / sigma**2],
                         axis=1)
    hard, ok = decoder.decode(jnp.asarray(llr), bg, zc, num_iters=16,
                              schedule="flooding")
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hard), msgs)


def test_decode_reduced_precision_schedules_awgn():
    """bf16-storage and reference-fixed-point int8 rolls schedules decode the
    AWGN scenario that the f32 path decodes (the i8 path mirrors the
    reference's int8 semantics: +-120 finite range, +-64 load clamp,
    promotion of saturated posteriors to the +-127 fixed-bit value)."""
    bg, zc = 2, 64
    g = graph.get_graph(bg, zc)
    rng = np.random.default_rng(31)
    b = 8
    msgs = rng.integers(0, 2, size=(b, g.k), dtype=np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msgs), bg, zc))
    sym = 1 - 2 * cw[:, 2 * zc:].astype(np.float32)
    sigma = 10 ** (-3.0 / 20)
    y = sym + rng.normal(size=sym.shape) * sigma
    llr = np.concatenate([np.zeros((b, 2 * zc), np.float32), 2 * y / sigma**2],
                         axis=1)
    for sched in ("layered_rolls_bf16", "layered_rolls_i8"):
        hard, ok = decoder.decode(jnp.asarray(llr), bg, zc, num_iters=8,
                                  schedule=sched)
        assert np.asarray(ok).all(), sched
        np.testing.assert_array_equal(np.asarray(hard), msgs)


def test_decode_i8_fixed_bit_freezing():
    """A clean high-confidence wire converges and STAYS converged through
    extra iterations (the promotion-to-infinity freezing; without it the
    saturated fixed-point iteration oscillates after convergence)."""
    bg, zc = 1, 224
    g = graph.get_graph(bg, zc)
    rng = np.random.default_rng(7)
    b = 4
    msgs = rng.integers(0, 2, size=(b, g.k), dtype=np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msgs), bg, zc))
    llr = (1.0 - 2.0 * cw.astype(np.float32)) * 30.0  # saturates the wire
    llr[:, :2 * zc] = 0.0
    hard, ok = decoder.decode(jnp.asarray(llr), bg, zc, num_iters=10,
                              schedule="layered_rolls_i8", early_stop=False)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hard), msgs)


def test_lbrm_buffer_roundtrip():
    """Limited-buffer rate matching: N_cb < N restricts the circular buffer;
    encode->rate match->dematch->decode still succeeds at moderate rate."""
    bg, zc = 1, 64
    g = graph.get_graph(bg, zc)
    n_cb = rate_match.lbrm_n_cb(bg, zc, nof_cb=1, tbs_lbrm=2560)
    assert n_cb < g.n
    assert n_cb == (3 * 2560) // 2
    k_prime = g.k
    e = 2816  # rate ~0.5 within the limited buffer
    plan = rate_match.get_rate_match_plan(bg, zc, e, rv=0, qm=2,
                                          k_prime=k_prime, n_cb=n_cb)
    assert plan.select_idx.max() < n_cb
    rng = np.random.default_rng(31)
    msgs = jnp.asarray(rng.integers(0, 2, size=(4, g.k), dtype=np.int8))
    cw = encoder.encode(msgs, bg, zc, impl="gather")
    tx = rate_match.rate_match(cw, plan)
    llrs = (1 - 2 * tx.astype(jnp.float32)) * 8.0
    full = rate_match.rate_dematch(llrs, plan)
    hard, ok = decoder.decode(full, bg, zc, num_iters=8)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hard), np.asarray(msgs))


def test_lbrm_rv_offsets_use_limited_buffer():
    bg, zc = 2, 32
    n_cb = rate_match.lbrm_n_cb(bg, zc, nof_cb=1, tbs_lbrm=800)
    k0 = rate_match.k0_offset(bg, 1, n_cb, zc)
    assert k0 == zc * ((13 * n_cb) // (50 * zc))

@pytest.mark.parametrize("bg", [1, 2])
def test_wave_schedule_is_exact_reordering(bg):
    """The wave-packed layer schedule only commutes column-disjoint rows:
    rows within a wave are pairwise disjoint, and every column-sharing pair
    keeps its original relative order (so the packed sweep is bit-identical
    to the sequential layered sweep)."""
    g = graph.get_graph(bg, 2)
    row_cols = [set() for _ in range(g.rows)]
    for r, c in zip(g.edge_row, g.edge_col):
        row_cols[int(r)].add(int(c))
    waves = decoder._wave_schedule(bg)
    assert sorted(r for w in waves for r in w) == list(range(g.rows))
    wave_of = {r: i for i, w in enumerate(waves) for r in w}
    for w in waves:
        for i, r1 in enumerate(w):
            for r2 in w[i + 1:]:
                assert not (row_cols[r1] & row_cols[r2])
    for r1 in range(g.rows):
        for r2 in range(r1 + 1, g.rows):
            if row_cols[r1] & row_cols[r2]:
                assert wave_of[r1] < wave_of[r2]


@pytest.mark.parametrize("sched_pair", [
    ("layered_rolls", "layered_waves"),
    ("layered_rolls_bf16", "layered_waves_bf16"),
    ("layered_rolls", "layered_rolls_cr_f32"),
    ("layered_rolls_bf16", "layered_rolls_cr"),
])
def test_decode_waves_bit_identical_to_rolls(sched_pair):
    """Wave-packed and compressed-R sweeps are bit-identical to the
    sequential layered sweep (on CPU; on TPU bf16 post-convergence ties may
    flip with fusion layout, the same nondeterminism as recompiling the
    sequential program)."""
    ref_sched, wave_sched = sched_pair
    bg, zc = 1, 32
    g = graph.get_graph(bg, zc)
    rng = np.random.default_rng(37)
    b = 6
    msgs = rng.integers(0, 2, size=(b, g.k), dtype=np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msgs), bg, zc))
    sym = 1 - 2 * cw[:, 2 * zc:].astype(np.float32)
    sigma = 0.7
    y = sym + rng.normal(size=sym.shape) * sigma
    llr = jnp.asarray(np.concatenate(
        [np.zeros((b, 2 * zc), np.float32), 2 * y / sigma**2], axis=1))
    for es in (False, True):
        h_ref, ok_ref = decoder.decode(llr, bg, zc, num_iters=4,
                                       schedule=ref_sched, early_stop=es)
        h_wav, ok_wav = decoder.decode(llr, bg, zc, num_iters=4,
                                       schedule=wave_sched, early_stop=es)
        np.testing.assert_array_equal(np.asarray(h_ref), np.asarray(h_wav))
        np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_wav))

