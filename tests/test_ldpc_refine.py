"""Refine-compaction and wire-i8s decode schedule tests.

In their own file (= own pytest-xdist worker under --dist loadfile): the
per-CB oracle loop compiles many small while-loop programs, and stacking
those on top of test_ldpc.py's compilations pushes XLA:CPU's JIT over its
code-section cliff (see tests/conftest.py).
"""

import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder, graph

def _awgn_batch(bg, zc, b, snr_db, seed=23):
    """Encode b random CBs, BPSK over AWGN, return (msgs, full-buffer LLRs)."""
    g = graph.get_graph(bg, zc)
    rng = np.random.default_rng(seed)
    msgs = rng.integers(0, 2, size=(b, g.k), dtype=np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msgs), bg, zc))
    tx = cw[:, 2 * zc:].astype(np.float32)
    sigma = 10 ** (-snr_db / 20)
    y = (1 - 2 * tx) + rng.normal(size=tx.shape) * sigma
    llr = 2 * y / sigma**2
    return msgs, np.concatenate(
        [np.zeros((b, 2 * zc), np.float32), llr], axis=1)


def test_refine_compaction_matches_per_cb_semantics(monkeypatch):
    """The refine-compaction path (active when B > 2*refine) must give every
    codeblock the SAME effective iteration budget as decoding it alone —
    the reference's per-CB early stop + max-iteration cap
    (ldpc_decoder_impl.cpp:125-133).  Regression for the bug where
    stragglers ran up to 2x num_iters (sub-batch while + full-batch
    backstop), decoding CBs the reference declares failed."""
    bg, zc, b, iters = 2, 16, 20, 6
    monkeypatch.setenv("SRSRAN_TPU_DECODE_REFINE", "8")
    msgs, llr = _awgn_batch(bg, zc, b, snr_db=2.0)
    decoder.TRIP_SINK = sink = []
    try:
        hard, ok = decoder.decode(jnp.asarray(llr), bg, zc, num_iters=iters,
                                  schedule="layered_rolls_bf16")
    finally:
        decoder.TRIP_SINK = None
    ok = np.asarray(ok)
    hard = np.asarray(hard)
    # No while loop (sub or backstop) may run more than the num_iters-head
    # budget — the cap that bounds every CB's total sweeps.
    assert all(int(t) <= iters - 1 for t in sink), sink
    # Decoded CBs carry the right payload.
    np.testing.assert_array_equal(hard[ok], msgs[ok])
    # Per-CB oracle: each codeblock decoded ALONE (B=1 never triggers the
    # refine path) with the same budget — exactly the reference per-CB
    # semantics.  The batched refine path must declare the same ok set.
    for i in range(b):
        _, ok1 = decoder.decode(jnp.asarray(llr[i:i + 1]), bg, zc,
                                num_iters=iters,
                                schedule="layered_rolls_bf16")
        assert bool(np.asarray(ok1)[0]) == bool(ok[i]), i


def test_refine_compaction_default_shape_on_off(monkeypatch):
    """Exercise the refine=128 path at a production-like batch (B > 256 —
    the argsort/gather/scatter merge) and A/B against
    SRSRAN_TPU_DECODE_REFINE=0 (the default): identical ok sets and
    payloads at an SNR where every CB converges within budget."""
    bg, zc, b, iters = 2, 16, 288, 8
    msgs, llr = _awgn_batch(bg, zc, b, snr_db=4.0, seed=7)
    monkeypatch.setenv("SRSRAN_TPU_DECODE_REFINE", "128")
    hard_on, ok_on = decoder.decode(jnp.asarray(llr), bg, zc,
                                    num_iters=iters,
                                    schedule="layered_rolls_bf16")
    monkeypatch.setenv("SRSRAN_TPU_DECODE_REFINE", "0")
    hard_off, ok_off = decoder.decode(jnp.asarray(llr), bg, zc,
                                      num_iters=iters,
                                      schedule="layered_rolls_bf16")
    ok_on, ok_off = np.asarray(ok_on), np.asarray(ok_off)
    np.testing.assert_array_equal(ok_on, ok_off)
    assert ok_on.all()
    np.testing.assert_array_equal(np.asarray(hard_on)[ok_on], msgs[ok_on])
    np.testing.assert_array_equal(np.asarray(hard_off)[ok_off], msgs[ok_off])


def test_wire_i8s_int8_storage_roundtrip_matches_wire():
    """layered_rolls_wire_i8s (int8 L/R storage, bf16 compute) is bit-
    identical to layered_rolls_wire: every wire value is an integer within
    int8 range so the storage round-trip is lossless."""
    bg, zc = 1, 32
    g = graph.get_graph(bg, zc)
    rng = np.random.default_rng(5)
    msgs = rng.integers(0, 2, size=(6, g.k), dtype=np.int8)
    cw = np.asarray(encoder.encode(jnp.asarray(msgs), bg, zc))
    tx = cw[:, 2 * zc:].astype(np.float32)
    sigma = 0.9
    y = (1 - 2 * tx) + rng.normal(size=tx.shape) * sigma
    # int8 wire domain (demap clip +-20 -> +-120)
    llr = np.clip(np.round(np.clip(2 * y / sigma**2, -20, 20) * 6), -120,
                  120).astype(np.float32)
    full = np.concatenate([np.zeros((6, 2 * zc), np.float32), llr], axis=1)
    for es in (False, True):
        h_w, ok_w = decoder.decode(jnp.asarray(full), bg, zc, num_iters=6,
                                   schedule="layered_rolls_wire",
                                   early_stop=es)
        h_i, ok_i = decoder.decode(jnp.asarray(full), bg, zc, num_iters=6,
                                   schedule="layered_rolls_wire_i8s",
                                   early_stop=es)
        np.testing.assert_array_equal(np.asarray(h_w), np.asarray(h_i))
        np.testing.assert_array_equal(np.asarray(ok_w), np.asarray(ok_i))
