#!/usr/bin/env python3
"""Stage bisection of the full-gNB-slot bench step: time each channel's
sub-program separately (jitted once each) to rank where the full-slot
overhead over the data-plane-only pipeline lives.

Every timed loop chains an int8 flag computed INSIDE the jit from the
output (the axon relay caches identical execution requests, and eager
complex ops are unsupported on that backend).

Usage: python tools/tpu_full_bisect.py [--sbatch=N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.ops import ofdm, prach as prach_mod
    from srsran_edgeric_5g_tpu.parallel import full_cell as fcell
    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    s = 256
    for a in sys.argv:
        if a.startswith("--sbatch="):
            s = int(a.split("=")[1])

    fc = fcell.FullCellConfig()
    t = fc.timing
    u = fc.nof_ue
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

    rx = jax.jit(lambda p, a, c: fcell.ue_ul_slot_batch(p, a, c, fc, s)
                 )(pay_u, ack, csi)
    results = {}

    def loop(fn, first_args, next_args, iters=10):
        """fn returns (..., int8 flag); next_args(flag) builds next call."""
        out = fn(*first_args)
        out[-1].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*next_args(out[-1]))
        out[-1].block_until_ready()
        return (time.perf_counter() - t0) / iters

    # 1. Full DL TX (pdsch both shapes + pdcch + ssb)
    @jax.jit
    def f_dl(pn, eps):
        td = fcell.gnb_dl_slot_batch(jnp.bitwise_xor(pn, eps), pay_s, dci,
                                     pbch, fc, s)
        return td, (jnp.real(td[0, 0]) > 1e30).astype(jnp.int8)
    results["dl_full(pdsch+pdcch+ssb)"] = loop(
        f_dl, (pay_n, jnp.int8(0)), lambda f: (pay_n, f))

    # 2. DL PDSCH only (both sub-batch shapes, no control)
    @jax.jit
    def f_dl_data(pn, eps):
        syms_n = sp._dl_code(jnp.bitwise_xor(pn, eps).reshape(
            len(norm_idx) * u, -1), fc.rntis(), cell_n)
        syms_n = syms_n.reshape(len(norm_idx), u, -1)
        syms_s = sp._dl_code(pay_s.reshape(len(ssb_idx) * u, -1),
                             fc.rntis(), cell_s).reshape(len(ssb_idx), u, -1)
        td_n = jax.vmap(lambda sy: sp._dl_grid_ofdm(sy, cell_n,
                                                    dmrs_scale=1.0))(syms_n)
        td_s = jax.vmap(lambda sy: sp._dl_grid_ofdm(sy, cell_s,
                                                    dmrs_scale=1.0))(syms_s)
        return td_n, td_s, (jnp.real(td_n[0, 0]) > 1e30).astype(jnp.int8)
    results["dl_pdsch_only(2 shapes)"] = loop(
        f_dl_data, (pay_n, jnp.int8(0)), lambda f: (pay_n, f))

    # 3. UL full RX with soft carry
    soft0 = jnp.zeros((s, u * seg_u.c, rm_u.n_cb), jnp.float32)
    nd1 = jnp.ones((s, u), jnp.float32)
    @jax.jit
    def f_ul(r, sb):
        res = fcell.gnb_ul_slot_batch(r, fc, s, soft_in=sb, new_data=nd1)
        return res["soft"], res["tb_ok"].reshape(-1)[0].astype(jnp.int8)
    def ul_loop(iters=10):
        soft, flag = f_ul(rx, soft0)
        flag.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            soft, flag = f_ul(rx, soft)
        flag.block_until_ready()
        return (time.perf_counter() - t0) / iters
    results["ul_full(+soft carry)"] = ul_loop()

    # 4. UL full RX, no soft carry
    @jax.jit
    def f_ul_nc(r, eps):
        res = fcell.gnb_ul_slot_batch(
            jax.lax.complex(jnp.real(r) + eps.astype(jnp.float32),
                            jnp.imag(r)), fc, s)
        return res["tb_ok"], res["tb_ok"].reshape(-1)[0].astype(jnp.int8) & 0
    results["ul_full(no carry)"] = loop(
        f_ul_nc, (rx, jnp.int8(0)), lambda f: (rx, f))

    # 5. UL PUSCH only (no extra channels, no carry)
    @jax.jit
    def f_ul_data(r, eps):
        out = sp.ul_slot_batch(
            jax.lax.complex(jnp.real(r) + eps.astype(jnp.float32),
                            jnp.imag(r)), fc.rntis(), cell_u)
        return out[1], out[1].reshape(-1)[0].astype(jnp.int8) & 0
    results["ul_pusch_only"] = loop(
        f_ul_data, (rx, jnp.int8(0)), lambda f: (rx, f))

    # 6. Extra channels on a precomputed grid (constant input: relative
    # numbers only — each still chains through its own output).
    rx_grid = jax.jit(lambda r: ofdm.demodulate_slot(r, t, scale=1.0))(rx)
    csi_i = jnp.asarray(fc.csi_slots(s))
    srs_i = jnp.asarray(fc.srs_slots(s))
    pr_i = jnp.asarray(fc.prach_slots(s))
    info = fc.prach_info()

    @jax.jit
    def f_f1(g, eps):
        bits, m = fcell._f1_detect(
            g + eps.astype(jnp.float32), fc, s)
        return m, bits.reshape(-1)[0] & jnp.int8(0)
    results["f1_detect"] = loop(f_f1, (rx_grid, jnp.int8(0)),
                                lambda f: (rx_grid, f))

    @jax.jit
    def f_f2(g, eps):
        bits, ok = fcell._f2_decode(g[csi_i] + eps.astype(jnp.float32),
                                    fc, s)
        return ok, bits.reshape(-1)[0] & jnp.int8(0)
    results["f2_decode"] = loop(f_f2, (rx_grid, jnp.int8(0)),
                                lambda f: (rx_grid, f))

    @jax.jit
    def f_srs(g, eps):
        h, snr = fcell._srs_estimate(g[srs_i] + eps.astype(jnp.float32), fc)
        return snr, (snr.reshape(-1)[0] > 1e30).astype(jnp.int8)
    results["srs"] = loop(f_srs, (rx_grid, jnp.int8(0)),
                          lambda f: (rx_grid, f))

    @jax.jit
    def f_prach(r, eps):
        win = r[pr_i, :info.cp_samples + info.dft_size]
        win = jax.lax.complex(jnp.real(win) + eps.astype(jnp.float32),
                              jnp.imag(win))
        rf = prach_mod.ofdm_demodulate_prach(win, info)
        m, d, det = fcell._prach_detect_batch(rf, fc)
        return m, (m.reshape(-1)[0] > 1e30).astype(jnp.int8)
    results["prach"] = loop(f_prach, (rx, jnp.int8(0)), lambda f: (rx, f))

    @jax.jit
    def f_demod(r, eps):
        g = ofdm.demodulate_slot(
            jax.lax.complex(jnp.real(r) + eps.astype(jnp.float32),
                            jnp.imag(r)), t, scale=1.0)
        return g, (jnp.real(g[0, 0, 0]) > 1e30).astype(jnp.int8)
    results["ofdm_demod_alone"] = loop(f_demod, (rx, jnp.int8(0)),
                                       lambda f: (rx, f))

    @jax.jit
    def f_pdcch(d, eps):
        rows = fcell.pdcch_rows(jnp.bitwise_xor(d, eps), fc, s)
        return rows, (jnp.real(rows[0, 0]) > 1e30).astype(jnp.int8)
    results["pdcch_rows"] = loop(f_pdcch, (dci, jnp.int8(0)),
                                 lambda f: (dci, f))

    @jax.jit
    def f_ssb(p, eps):
        b = fcell.ssb_blocks(jnp.bitwise_xor(p, eps), fc, s)
        return b, (jnp.real(b[0, 0, 0]) > 1e30).astype(jnp.int8)
    results["ssb_blocks"] = loop(f_ssb, (pbch, jnp.int8(0)),
                                 lambda f: (pbch, f))

    print(f"S={s}; per-slot ms:")
    for k, v in results.items():
        print(f"  {k:28s} {v / s * 1e3:8.4f} ms/slot  ({v * 1e3:8.2f} ms/batch)",
              flush=True)


if __name__ == "__main__":
    main()
