#!/usr/bin/env python3
"""Headline benchmark: FULL gNB slot pipeline throughput on one TPU chip.

Config matches the reference's 20 MHz zmq-mode cell (106 PRB @ 23.04 Msps,
4 UEs — BASELINE.md), but unlike round 1 the timed slot is the reference's
COMPLETE per-slot workload (cell_scheduler.cpp:117-138 +
downlink_processor_single_executor_impl.h:88-98 +
uplink_processor_impl.cpp:70-154), not just the data plane:

  DL TX (timed): PDSCH encode for 4 UEs + PDCCH CORESET with 8 DCIs/slot
  (2 per UE) + SS/PBCH block every 10 ms (SSB slots carry the shortened
  PDSCH sub-batch shape) -> grids -> OFDM modulate.

  UL RX (timed): OFDM demodulate -> PUSCH (chest+MMSE+demap+descramble+
  dematch+layered min-sum decode+CRC) for 4 UEs with HARQ soft-buffer carry
  through the program (soft state in/out every batch, new_data mask) +
  PUCCH F1 ACK detection every slot + PUCCH F2 CSI decode every 5th slot +
  SRS snapshots and PRACH occasion demod + 64-preamble detection every
  10th slot.

The UE-side UL generation (PUSCH+PUCCH+SRS+PRACH transmit) happens ONCE at
setup — the gNB does not generate uplink — and the timed step re-noises it
with a sign-alternated pre-generated AWGN tensor (25 dB), exactly as the
radio would hand new noisy samples each slot.  Payload/ACK/CSI/PRACH
correctness is asserted on the setup run.

Timing methodology: every iteration chains data dependencies through the
previous iteration (payload XOR, noise sign flip, HARQ soft state) — the
TPU relay on this machine caches identical execution requests — and the DL
transmit feeds the chain through a full power reduction so XLA cannot
dead-code any channel.  Host sync only at the end.

Metric: processed baseband samples per second per chip (23040 samples per
1 ms slot, DL+UL both processed => 23.04e6 = exactly real-time).
vs_baseline divides by the reference system's real-time operating point:
how many 20 MHz 4-UE full-duplex cells' PHY one chip sustains.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Flags: --sbatch=N (slots per dispatch, default 256), --data-only (the
round-1 data-plane-only pipeline for A/B), --fft=impl, --clean (no AWGN).
"""

import functools
import json
import os
import sys
import time

import numpy as np

ITERS = 30
# Full-cell config overrides (e.g. the 256QAM / MCS-table-2 operating
# point via --qam256); applied wherever a FullCellConfig is built.
FC_KW: dict = {}


def bench_full_cell(s_batch: int, snr_db: float | None):
    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.parallel import full_cell as fcell
    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    fc = fcell.FullCellConfig(**FC_KW)
    t = fc.timing
    u = fc.nof_ue
    s = s_batch
    rng = np.random.default_rng(0)

    cell_n, cell_s, cell_u = fc.dl_cell(), fc.dl_cell_ssb(), fc.ul_cell()
    tbs_n, tbs_s, tbs_u = (cell_n.derived_tbs(), cell_s.derived_tbs(),
                           cell_u.derived_tbs())
    norm_idx, ssb_idx = fc.norm_slots(s), fc.ssb_slots(s)
    seg_u, _ = sp._plans(cell_u, 0)

    pay_n = jnp.asarray(rng.integers(0, 2, (len(norm_idx), u, tbs_n),
                                     dtype=np.int8))
    pay_s = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), u, tbs_s),
                                     dtype=np.int8))
    dci = jnp.asarray(rng.integers(0, 2, (s, 2 * u, fc.dci_bits),
                                   dtype=np.int8))
    pbch = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), 24), dtype=np.int8))
    pay_u = jnp.asarray(rng.integers(0, 2, (s, u, tbs_u), dtype=np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (s, u, 2), dtype=np.int8))
    csi = jnp.asarray(rng.integers(0, 2, (len(fc.csi_slots(s)), u,
                                          fc.csi_bits), dtype=np.int8))

    # UE-side UL generation + AWGN planes, once at setup (planar f32: a c64
    # argument to the timed step costs a per-iteration layout copy).
    @jax.jit
    def make_ul(p, a, c, key):
        td = fcell.ue_ul_slot_batch(p, a, c, fc, s)
        re, im = jnp.real(td), jnp.imag(td)
        if snr_db is None:
            z = jnp.zeros((), jnp.float32)
            return re, im, z, z
        sig_pow = jnp.mean(re * re + im * im)
        sigma = jnp.sqrt(sig_pow * 10.0 ** (-snr_db / 10.0) / 2.0)
        n = jax.random.normal(key, td.shape + (2,), jnp.float32) * sigma
        return re, im, n[..., 0], n[..., 1]

    ul_re, ul_im, nre, nim = make_ul(pay_u, ack, csi,
                                     jax.random.key(42, impl="rbg"))

    nd_ones = jnp.ones((s, u), jnp.float32)

    num_iters = int(os.environ.get("BENCH_NUM_ITERS", "0")) or None
    no_carry = os.environ.get("BENCH_NO_CARRY") == "1"
    no_es = os.environ.get("BENCH_NO_EARLYSTOP") == "1"

    # Donate the HARQ soft state: it is ~121 MB at S=256 and feeds straight
    # back into the next dispatch — donation lets XLA update it in place
    # instead of allocating + copying a fresh output buffer every step.
    @functools.partial(jax.jit, donate_argnums=(4,))
    def step(pn, ps, eps, flip, soft):
        """One full-cell DL TX + UL RX slot batch, chained."""
        pn = jnp.bitwise_xor(pn, eps)
        td = fcell.gnb_dl_slot_batch(pn, ps, dci, pbch, fc, s)
        # Full power reduction: forces the complete DL transmit (nothing
        # dead-codes) at the cost of one cheap reduce.
        dl_pow = jnp.mean(jnp.real(td) ** 2 + jnp.imag(td) ** 2)
        rx = jax.lax.complex(ul_re + nre * flip, ul_im + nim * flip)
        kw = {} if num_iters is None else {"num_iters": num_iters}
        if no_es:
            kw["early_stop"] = False
        res = fcell.gnb_ul_slot_batch(rx, fc, s,
                                      soft_in=None if no_carry else soft,
                                      new_data=None if no_carry else nd_ones,
                                      soft_flat=True, **kw)
        eps_next = (res["payload"][0, 0, 0] & jnp.int8(0)) | \
            (dl_pow > jnp.float32(1e30)).astype(jnp.int8)
        return res, eps_next, -flip

    eps = jnp.int8(0)
    flip = jnp.float32(1.0)
    soft = jnp.zeros((s * u * seg_u.c, sp._plans(cell_u, 0)[1].n_cb),
                     jnp.int8)

    res, eps, flip = step(pay_n, pay_s, eps, flip, soft)
    ok = np.asarray(res["tb_ok"])
    assert ok.all(), f"PUSCH CRC failed: {ok.sum()}/{ok.size}"
    assert (np.asarray(res["payload"]) == np.asarray(pay_u)).all()
    assert (np.asarray(res["ack_bits"]) == np.asarray(ack)).all(), \
        "PUCCH F1 ACK mismatch"
    assert np.asarray(res["csi_ok"]).all()
    assert (np.asarray(res["csi_bits"]) == np.asarray(csi)).all(), \
        "PUCCH F2 CSI mismatch"
    det = np.asarray(res["prach_detected"])
    assert det[:, 7].all() and not det[:, np.arange(64) != 7].any(), \
        f"PRACH detection wrong: {np.nonzero(det)}"

    iters = ITERS
    t0 = time.perf_counter()
    for _ in range(iters):
        res, eps, flip = step(pay_n, pay_s, eps, flip, res["soft"])
    _ = int(eps)  # host sync through the dependency chain
    res["tb_ok"].block_until_ready()
    slot_s = (time.perf_counter() - t0) / (iters * s)
    return slot_s, t, (f"full gNB slot, S={s}: TBS dl {tbs_n}/{tbs_s} ul "
                       f"{tbs_u} x {u} UE; 8 DCI/slot, SSB/10, F1/slot, "
                       f"F2/5, SRS/10, PRACH/10; HARQ soft carry "
                       f"{s}x{u * seg_u.c}x{sp._plans(cell_u, 0)[1].n_cb}")


def bench_streaming(s_batch: int, snr_db: float | None, depth: int = 2,
                    n_batches: int = 400):
    """Bounded-latency streaming mode: small slot batches dispatched
    double-buffered (depth-2 pipeline — batch k+1 is enqueued while batch k
    computes on the chip; JAX async dispatch + on-device chaining means no
    host sync between submits).  The TPU analogue of the reference's
    nof_slot_tti_in_advance run-ahead
    (downlink_processor_baseband_impl.cpp:47 /
    lower_phy_baseband_processor.h:40-197): the radio must buffer
    [p99 latency] of samples; sustained throughput must stay >= 1x.

    Reports sustained x-real-time and p50/p99 submit->complete latency of
    the FULL gNB slot batch (DL TX + UL RX with HARQ carry).
    """
    import collections

    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.parallel import full_cell as fcell
    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    fc = fcell.FullCellConfig(**FC_KW)
    t = fc.timing
    u = fc.nof_ue
    s = s_batch
    rng = np.random.default_rng(0)
    cell_n, cell_s, cell_u = fc.dl_cell(), fc.dl_cell_ssb(), fc.ul_cell()
    norm_idx, ssb_idx = fc.norm_slots(s), fc.ssb_slots(s)
    seg_u, rm_u = sp._plans(cell_u, 0)

    pay_n = jnp.asarray(rng.integers(0, 2, (len(norm_idx), u,
                                            cell_n.derived_tbs()), np.int8))
    pay_s = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), u,
                                            cell_s.derived_tbs()), np.int8))
    dci = jnp.asarray(rng.integers(0, 2, (s, 2 * u, fc.dci_bits), np.int8))
    pbch = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), 24), np.int8))
    pay_u = jnp.asarray(rng.integers(0, 2, (s, u, cell_u.derived_tbs()),
                                     np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (s, u, 2), np.int8))
    csi = jnp.asarray(rng.integers(0, 2, (len(fc.csi_slots(s)), u,
                                          fc.csi_bits), np.int8))

    @jax.jit
    def make_ul(p, a, c, key):
        td = fcell.ue_ul_slot_batch(p, a, c, fc, s)
        re, im = jnp.real(td), jnp.imag(td)
        sig_pow = jnp.mean(re * re + im * im)
        sigma = jnp.sqrt(sig_pow * 10.0 ** (-(snr_db or 25.0) / 10.0) / 2.0)
        n = jax.random.normal(key, td.shape + (2,), jnp.float32) * sigma
        return re, im, n[..., 0], n[..., 1]

    ul_re, ul_im, nre, nim = make_ul(pay_u, ack, csi,
                                     jax.random.key(42, impl="rbg"))
    nd_ones = jnp.ones((s, u), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(3,))  # donate HARQ soft state
    def step(pn, eps, flip, soft):
        pn = jnp.bitwise_xor(pn, eps)
        td = fcell.gnb_dl_slot_batch(pn, pay_s, dci, pbch, fc, s)
        dl_pow = jnp.mean(jnp.real(td) ** 2 + jnp.imag(td) ** 2)
        rx = jax.lax.complex(ul_re + nre * flip, ul_im + nim * flip)
        res = fcell.gnb_ul_slot_batch(rx, fc, s, soft_in=soft,
                                      new_data=nd_ones, soft_flat=True)
        eps_next = (res["payload"][0, 0, 0] & jnp.int8(0)) | \
            (dl_pow > jnp.float32(1e30)).astype(jnp.int8)
        return res, eps_next, -flip

    eps = jnp.int8(0)
    flip = jnp.float32(1.0)
    soft = jnp.zeros((s * u * seg_u.c, rm_u.n_cb), jnp.int8)
    res, eps, flip = step(pay_n, eps, flip, soft)
    assert np.asarray(res["tb_ok"]).all()

    inflight: collections.deque = collections.deque()
    lat = []
    t_start = time.perf_counter()
    for _ in range(n_batches):
        t_sub = time.perf_counter()
        res, eps, flip = step(pay_n, eps, flip, res["soft"])
        inflight.append((t_sub, res["tb_ok"]))
        if len(inflight) >= depth:
            t0, ok0 = inflight.popleft()
            ok0.block_until_ready()
            lat.append(time.perf_counter() - t0)
    while inflight:
        t0, ok0 = inflight.popleft()
        ok0.block_until_ready()
        lat.append(time.perf_counter() - t0)
    wall = time.perf_counter() - t_start

    lat_ms = np.asarray(lat) * 1e3
    slot_s = wall / (n_batches * s)

    # Dispatch-overhead decomposition (VERDICT r2 weak #5): time the SAME
    # program deep-chained with host sync only at the end — that is pure
    # program time; the streaming p50 batch latency minus it is the
    # submit->result overhead (host dispatch + relay RTT on this machine,
    # tens of microseconds on a directly-attached chip).
    k = 30
    t0 = time.perf_counter()
    for _ in range(k):
        res, eps, flip = step(pay_n, eps, flip, res["soft"])
    _ = int(eps)
    res["tb_ok"].block_until_ready()
    compute_ms = (time.perf_counter() - t0) / k * 1e3
    p50 = float(np.percentile(lat_ms, 50))
    desc = (f"STREAMING full gNB slot, S={s} depth={depth}: sustained "
            f"{1e-3 / slot_s:.2f}x real-time; batch latency p50 "
            f"{p50:.2f} ms / p99 {np.percentile(lat_ms, 99):.2f} ms "
            f"(run-ahead budget = {np.percentile(lat_ms, 99) + s:.1f} ms "
            f"incl. the {s} ms batch fill); decomposition: program compute "
            f"{compute_ms:.2f} ms/batch, submit->result overhead "
            f"{p50 - compute_ms:.2f} ms (dispatch + relay RTT)")
    return slot_s, t, desc


def bench_mimo(s_batch: int, n_layers: int, snr_db: float | None):
    """Multi-layer data plane: LxL spatial channel per UE (layer-mapped
    single codeword, CDM DM-RS, LxP whitened-Gram MMSE) — the MIMO rows
    for BASELINE.md (VERDICT item 3)."""
    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    cell = sp.CellConfig(nof_prb=106, nfft=1536, nof_ue=4, prb_per_ue=26,
                         modulation="qam64", target_rate=0.5,
                         n_layers=n_layers)
    t = cell.timing
    tbs = cell.derived_tbs()
    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 2, (s_batch, 4, tbs),
                                        dtype=np.int8))
    rntis = jnp.asarray((0x4601 + np.arange(4)).astype(np.uint32))
    # Well-conditioned static spatial mixing (blend of random + DFT).
    a_np = ((rng.normal(size=(n_layers, n_layers))
             + 1j * rng.normal(size=(n_layers, n_layers))) / np.sqrt(2))
    f = np.exp(-2j * np.pi * np.outer(np.arange(n_layers),
                                      np.arange(n_layers)) / n_layers)
    a_re = (0.35 * a_np + f / np.sqrt(n_layers)).astype(np.complex64)
    a_r, a_i = jnp.asarray(a_re.real), jnp.asarray(a_re.imag)

    @jax.jit
    def make_noise(p, key):
        td = sp.dl_slot_batch_mimo(p, rntis, cell)
        sig_pow = jnp.mean(jnp.abs(td) ** 2)
        sigma = jnp.sqrt(sig_pow * 10.0 ** (-snr_db / 10.0) / 2.0)
        n = jax.random.normal(key, td.shape + (2,), jnp.float32) * sigma
        return n[..., 0], n[..., 1]

    noise = (make_noise(payloads, jax.random.key(42, impl="rbg"))
             if snr_db is not None
             else (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)))

    @jax.jit
    def step(p, eps, flip, noise):
        p = jnp.bitwise_xor(p, eps)
        td = sp.dl_slot_batch_mimo(p, rntis, cell)     # (S, L, total)
        a = jax.lax.complex(a_r, a_i)
        rx = jnp.einsum("pl,slt->spt", a, td)
        if snr_db is not None:
            nr, ni = noise
            rx = jax.lax.complex(jnp.real(rx) + nr * flip,
                                 jnp.imag(rx) + ni * flip)
        hat, tb_ok, nv, cfo, _ = sp.ul_slot_batch_mimo(rx, rntis, cell)
        return hat, tb_ok, (hat[0, 0, 0] & jnp.int8(0)), -flip

    eps = jnp.int8(0)
    key = jnp.float32(1.0)
    hat, tb_ok, eps, key = step(payloads, eps, key, noise)
    ok = np.asarray(tb_ok)
    assert ok.all(), f"MIMO loopback CRC failed: {ok.mean()}"
    assert (np.asarray(hat) == np.asarray(payloads)).all()

    iters = ITERS
    t0 = time.perf_counter()
    for _ in range(iters):
        hat, tb_ok, eps, key = step(payloads, eps, key, noise)
    _ = int(eps)
    tb_ok.block_until_ready()
    slot_s = (time.perf_counter() - t0) / (iters * s_batch)
    return slot_s, t, (f"{n_layers}x{n_layers} MIMO data plane, "
                       f"S={s_batch}, TBS {tbs} x 4 UE (single codeword, "
                       f"{n_layers} layers, LxP MMSE)")


def bench_full_cell_mimo(s_batch: int, n_layers: int, snr_db: float | None):
    """FULL gNB slot with the MIMO data plane: the bench_full_cell workload
    (PDCCH/SSB DL control, PUCCH F1+F2/SRS/PRACH UL control, HARQ soft
    carry) with PDSCH/PUSCH at L layers per UE through an LxL spatial
    channel (full_cell.gnb_*_slot_batch_mimo)."""
    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.parallel import full_cell as fcell
    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    fc = fcell.FullCellConfig(n_layers=n_layers, **FC_KW)
    t = fc.timing
    u = fc.nof_ue
    s = s_batch
    rng = np.random.default_rng(0)

    cell_n, cell_s = fc.dl_cell_mimo(), fc.dl_cell_ssb_mimo()
    cell_u = fc.ul_cell()
    tbs_n, tbs_s, tbs_u = (cell_n.derived_tbs(), cell_s.derived_tbs(),
                           cell_u.derived_tbs())
    norm_idx, ssb_idx = fc.norm_slots(s), fc.ssb_slots(s)
    seg_u, _ = sp._plans(cell_u, 0)

    pay_n = jnp.asarray(rng.integers(0, 2, (len(norm_idx), u, tbs_n),
                                     dtype=np.int8))
    pay_s = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), u, tbs_s),
                                     dtype=np.int8))
    dci = jnp.asarray(rng.integers(0, 2, (s, 2 * u, fc.dci_bits),
                                   dtype=np.int8))
    pbch = jnp.asarray(rng.integers(0, 2, (len(ssb_idx), 24), dtype=np.int8))
    pay_u = jnp.asarray(rng.integers(0, 2, (s, u, tbs_u), dtype=np.int8))
    ack = jnp.asarray(rng.integers(0, 2, (s, u, 2), dtype=np.int8))
    csi = jnp.asarray(rng.integers(0, 2, (len(fc.csi_slots(s)), u,
                                          fc.csi_bits), dtype=np.int8))

    # Well-conditioned static LxL spatial channel (blend of random + DFT).
    a_np = ((rng.normal(size=(n_layers, n_layers))
             + 1j * rng.normal(size=(n_layers, n_layers))) / np.sqrt(2))
    f = np.exp(-2j * np.pi * np.outer(np.arange(n_layers),
                                      np.arange(n_layers)) / n_layers)
    a_re = (0.35 * a_np + f / np.sqrt(n_layers)).astype(np.complex64)
    a_r, a_i = jnp.asarray(a_re.real), jnp.asarray(a_re.imag)

    @jax.jit
    def make_ul(p, a, c, key):
        td = fcell.ue_ul_slot_batch_mimo(p, a, c, fc, s)    # (S, L, total)
        mix = jax.lax.complex(a_r, a_i)
        rx = jnp.einsum("pl,slt->spt", mix, td)
        re, im = jnp.real(rx), jnp.imag(rx)
        if snr_db is None:
            z = jnp.zeros((), jnp.float32)
            return re, im, z, z
        sig_pow = jnp.mean(re * re + im * im)
        sigma = jnp.sqrt(sig_pow * 10.0 ** (-snr_db / 10.0) / 2.0)
        n = jax.random.normal(key, rx.shape + (2,), jnp.float32) * sigma
        return re, im, n[..., 0], n[..., 1]

    ul_re, ul_im, nre, nim = make_ul(pay_u, ack, csi,
                                     jax.random.key(42, impl="rbg"))
    nd_ones = jnp.ones((s, u), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(4,))
    def step(pn, ps, eps, flip, soft):
        pn = jnp.bitwise_xor(pn, eps)
        td = fcell.gnb_dl_slot_batch_mimo(pn, ps, dci, pbch, fc, s)
        dl_pow = jnp.mean(jnp.real(td) ** 2 + jnp.imag(td) ** 2)
        rx = jax.lax.complex(ul_re + nre * flip, ul_im + nim * flip)
        res = fcell.gnb_ul_slot_batch_mimo(rx, fc, s, soft_in=soft,
                                           new_data=nd_ones, soft_flat=True)
        eps_next = (res["payload"][0, 0, 0] & jnp.int8(0)) | \
            (dl_pow > jnp.float32(1e30)).astype(jnp.int8)
        return res, eps_next, -flip

    eps = jnp.int8(0)
    flip = jnp.float32(1.0)
    soft = jnp.zeros((s * u * seg_u.c, sp._plans(cell_u, 0)[1].n_cb),
                     jnp.int8)
    res, eps, flip = step(pay_n, pay_s, eps, flip, soft)
    ok = np.asarray(res["tb_ok"])
    assert ok.all(), f"MIMO PUSCH CRC failed: {ok.sum()}/{ok.size}"
    assert (np.asarray(res["payload"]) == np.asarray(pay_u)).all()
    assert (np.asarray(res["ack_bits"]) == np.asarray(ack)).all()
    assert np.asarray(res["csi_ok"]).all()
    det = np.asarray(res["prach_detected"])
    assert det[:, 7].all() and not det[:, np.arange(64) != 7].any()

    iters = ITERS
    t0 = time.perf_counter()
    for _ in range(iters):
        res, eps, flip = step(pay_n, pay_s, eps, flip, res["soft"])
    _ = int(eps)
    res["tb_ok"].block_until_ready()
    slot_s = (time.perf_counter() - t0) / (iters * s)
    return slot_s, t, (f"FULL gNB slot, {n_layers}x{n_layers} MIMO data "
                       f"plane, S={s}: TBS dl {tbs_n}/{tbs_s} ul {tbs_u} "
                       f"x {u} UE ({n_layers} layers); 8 DCI/slot, SSB/10, "
                       f"F1/slot, F2/5, SRS/10, PRACH/10; HARQ carry")


def bench_data_plane(s_batch: int, n_cells: int, snr_db: float | None):
    """Round-1 data-plane-only pipeline (PDSCH+PUSCH, no control) for A/B."""
    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    cell = sp.CellConfig(nof_prb=106, nfft=1536, nof_ue=4, prb_per_ue=26,
                         modulation="qam64", target_rate=0.5)
    t = cell.timing
    tbs = cell.derived_tbs()
    rng = np.random.default_rng(0)
    pshape = ((s_batch, 4, tbs) if n_cells == 1
              else (n_cells, s_batch, 4, tbs))
    payloads = jnp.asarray(rng.integers(0, 2, pshape, dtype=np.int8))
    rntis = jnp.asarray((0x4601 + np.arange(4 * n_cells)).astype(np.uint32))
    if n_cells > 1:
        rntis = rntis.reshape(n_cells, 4)

    @jax.jit
    def make_noise(p, key):
        td = (sp.dl_slot_batch(p, rntis, cell) if n_cells == 1
              else sp.multi_cell_dl_slot_batch(p, rntis, cell))
        sig_pow = jnp.mean(jnp.abs(td) ** 2)
        sigma = jnp.sqrt(sig_pow * 10.0 ** (-snr_db / 10.0) / 2.0)
        n = jax.random.normal(key, td.shape + (2,), jnp.float32) * sigma
        return n[..., 0], n[..., 1]

    noise = (make_noise(payloads, jax.random.key(42, impl="rbg"))
             if snr_db is not None else None)

    @jax.jit
    def step(p, eps, flip, noise):
        p = jnp.bitwise_xor(p, eps)
        nr, ni = noise

        def add_noise(td):
            if snr_db is None:
                return td
            return jax.lax.complex(jnp.real(td) + nr * flip,
                                   jnp.imag(td) + ni * flip)

        if n_cells == 1:
            td = add_noise(sp.dl_slot_batch(p, rntis, cell))
            payload_hat, tb_ok, nv, cfo, _ = sp.ul_slot_batch(td, rntis, cell)
            eps_next = (payload_hat[0, 0, 0] & jnp.int8(0))
        else:
            td = add_noise(sp.multi_cell_dl_slot_batch(p, rntis, cell))
            payload_hat, tb_ok, nv, cfo, _ = sp.multi_cell_ul_slot_batch(
                td, rntis, cell)
            eps_next = (payload_hat[0, 0, 0, 0] & jnp.int8(0))
        return payload_hat, tb_ok, eps_next, -flip

    if noise is None:
        noise = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    eps = jnp.int8(0)
    key = jnp.float32(1.0)
    payload_hat, tb_ok, eps, key = step(payloads, eps, key, noise)
    ok = np.asarray(tb_ok)
    assert ok.all(), f"loopback CRC failed: {ok}"
    assert (np.asarray(payload_hat) == np.asarray(payloads)).all()

    iters = ITERS
    t0 = time.perf_counter()
    for _ in range(iters):
        payload_hat, tb_ok, eps, key = step(payloads, eps, key, noise)
    _ = int(eps)
    tb_ok.block_until_ready()
    slot_s = (time.perf_counter() - t0) / (iters * s_batch * n_cells)
    return slot_s, t, (f"data-plane only, S={s_batch} x {n_cells} cell(s), "
                       f"TBS {tbs} x 4 UE")


def main():
    s_batch = 256
    n_cells = 1
    mimo = 0
    mimo_full = 0
    streaming = 0
    data_only = "--data-only" in sys.argv
    global ITERS
    for a in sys.argv:
        if a.startswith("--sbatch="):
            s_batch = int(a.split("=")[1])
        if a.startswith("--iters="):
            ITERS = int(a.split("=")[1])
        if a.startswith("--cells="):
            n_cells = int(a.split("=")[1])
        if a.startswith("--mimo="):
            mimo = int(a.split("=")[1])
        if a.startswith("--mimo-full="):
            mimo_full = int(a.split("=")[1])
        if a.startswith("--streaming="):
            streaming = int(a.split("=")[1])
        if a.startswith("--fft="):
            from srsran_edgeric_5g_tpu.ops import ofdm as _ofdm
            spec = a.split("=")[1].split(":")
            _ofdm.set_fft_impl(spec[0], spec[1] if len(spec) > 1 else "default")
    if "--no-csirs" in sys.argv:
        # A/B: drop the NZP-CSI-RS occasion rows from the DL slot program
        # (the round-2 workload, before e21279e added CSI-RS).
        FC_KW.update(csi_rs_period=0)
    if "--qam256" in sys.argv:
        # MCS-table-2 operating point (TS 38.214 Table 5.1.3.1-2, MCS 20:
        # Qm 8, R 682.5/1024) on both directions at 33 dB: the post-eq SINR
        # is ~2.4 dB under nominal (pilot-noise estimation loss + overlay
        # power in the sigma), and at 30 dB this point sits on the
        # 6-iteration decode waterfall tail (~2% TB failures; 12 iterations
        # clears it) — 33 dB buys the assert margin.  The TA+smoothing
        # estimator chain recovers most of the pilot-noise loss (fewer
        # decode sweeps at r0.92); --chest=ls reverts to plain LS.
        FC_KW.update(dl_modulation="qam256", ul_modulation="qam256",
                     dl_target_rate=682.5 / 1024, ul_target_rate=682.5 / 1024)
        if "--chest=ls" not in sys.argv:
            FC_KW.update(ul_delay_spread_us=1.0)
    snr_db = None if "--clean" in sys.argv else (
        33.0 if "--qam256" in sys.argv else 25.0)

    if streaming:
        slot_s, t, desc = bench_streaming(streaming, snr_db)
        metric = "streaming_full_gnb_slot_samples_per_sec"
    elif mimo_full:
        slot_s, t, desc = bench_full_cell_mimo(s_batch, mimo_full, snr_db)
        metric = f"full_gnb_slot_mimo{mimo_full}x{mimo_full}_samples_per_sec"
    elif mimo:
        slot_s, t, desc = bench_mimo(s_batch, mimo, snr_db)
        metric = f"mimo{mimo}x{mimo}_slot_samples_per_sec"
    elif data_only or n_cells > 1:
        slot_s, t, desc = bench_data_plane(s_batch, n_cells, snr_db)
        metric = "slot_pipeline_samples_per_sec"
    else:
        slot_s, t, desc = bench_full_cell(s_batch, snr_db)
        metric = "full_gnb_slot_samples_per_sec"
    if "--qam256" in sys.argv:
        metric += "_qam256"

    slot_samples = t.cp.total  # 23040 @ 20 MHz
    samples_per_sec = slot_samples / slot_s
    realtime = slot_samples * 1000.0  # 1 ms slots => 23.04 Msps

    print(json.dumps({
        "metric": metric,
        "value": round(samples_per_sec, 1),
        "unit": "samples/s/chip (20MHz 4UE DL+UL)",
        "vs_baseline": round(samples_per_sec / realtime, 3),
    }))
    print(f"# chained timing, {desc}; {slot_s*1e3:.3f} ms/slot",
          file=sys.stderr)


if __name__ == "__main__":
    # Retry-or-diagnose (VERDICT r3 weak #1): the single-client axon relay
    # on this machine occasionally wedges and surfaces as
    # FAILED_PRECONDITION / TPU backend errors on the first dispatch —
    # transient state, not a code break (round 3 shipped a crashed bench
    # that ran green on re-execution).  A fresh PROCESS gets a fresh PJRT
    # client, which is the granularity that clears a wedged relay
    # connection, so retries re-exec rather than loop in-process.
    try:
        main()
    except Exception as e:
        import traceback
        traceback.print_exc()
        attempt = int(os.environ.get("BENCH_ATTEMPT", "0"))
        max_attempts = int(os.environ.get("BENCH_MAX_ATTEMPTS", "3"))
        if attempt + 1 >= max_attempts:
            print(f"# bench failed after {max_attempts} attempts; if the "
                  f"error above is FAILED_PRECONDITION/TPU backend, the "
                  f"relay is wedged — wait a few minutes, ensure no other "
                  f"TPU client is running, and re-run", file=sys.stderr)
            sys.exit(1)
        delay = 90 * (attempt + 1)
        print(f"# bench attempt {attempt + 1}/{max_attempts} crashed "
              f"({type(e).__name__}) — retrying with a fresh backend "
              f"client in {delay}s", file=sys.stderr)
        time.sleep(delay)
        os.environ["BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
