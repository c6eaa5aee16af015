#!/usr/bin/env python3
"""BLER of the FULL PUSCH receive chain through the channel-emulator
profiles (AWGN / TDL Rayleigh fading / HST Doppler) + the RLF outage
demonstration — the committed-artifact counterpart of the reference UE's
channel emulator stress (srs-4G-UE/lib/src/phy/channel/{fading,hst,rlf}.c,
exercised by tests/test_channel_model.py which asserts survival only).

Per (profile, SNR) point: B independent slots of payload -> pusch.transmit
-> channel -> OFDM demod -> chest (+CFO) -> MMSE -> demap -> decode -> TB
CRC, each slot with an independent fading realisation.  TB BLER per point.

  JAX_PLATFORMS=cpu PYTHONPATH=. python tools/bler_channel_sweep.py \
      [--blocks=200] [--out=BLER_CHANNELS_R4.md]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PROFILES = [
    # (name, snr grid) — AWGN/HST grids straddle the coded waterfall;
    # Rayleigh (TDL, flat per-slot realisation, no diversity) has the
    # classic shallow 1/SNR outage slope so its grid is wide.
    ("awgn", [-2.0, -1.0, 0.0, 1.0, 2.0]),
    ("hst600", [-2.0, -1.0, 0.0, 1.0, 2.0]),
    ("tdla", [2.0, 5.0, 10.0, 15.0, 20.0]),
    ("tdlc", [2.0, 5.0, 10.0, 15.0, 20.0]),
]


def main():
    n_blocks = 200
    out_path = "BLER_CHANNELS_R4.md"
    for a in sys.argv:
        if a.startswith("--blocks="):
            n_blocks = int(a.split("=")[1])
        if a.startswith("--out="):
            out_path = a.split("=")[1]

    import jax
    import jax.numpy as jnp

    from srsran_edgeric_5g_tpu.models import pdsch, pusch
    from srsran_edgeric_5g_tpu.ops import channel_model as chm, ofdm
    from srsran_edgeric_5g_tpu.ran import numerology as num

    t = num.slot_timing(**num.CELL_10MHZ)
    cfg = pdsch.PdschConfig(rnti=0x11, nof_prb=24, start_prb=4,
                            modulation="qam16", target_rate=0.4)
    tbs = cfg.derived_tbs()
    times = np.asarray(t.cp.data_starts) / t.srate
    rng = np.random.default_rng(7)
    tdl_cfgs = {p: chm.make_tdl(p, t.srate) for p in ("tdla", "tdlc")}

    def tx(payload):
        grid = pusch.transmit(payload[None], cfg, t.nsymb, t.nof_subc)
        return ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)

    def rx_one(rx_td, delay_spread_s):
        rx_grid = ofdm.demodulate_slot(rx_td, t, scale=1.0)
        r = pusch.process(rx_grid, cfg, t.srate, times,
                          delay_spread_s=delay_spread_s)
        return r.tb_crc_ok

    import functools

    @functools.partial(jax.jit, static_argnums=3)
    def point_awgn(payloads, key, snr_db, doppler):
        td = jax.vmap(tx)(payloads)                       # (B, total)
        if doppler:
            # Worst sustained HST offset: slot at trajectory start, fs=+fd
            td = chm.apply_hst(td, fd_hz=600.0, period_s=7.2,
                               srate=t.srate)
        rx = chm.awgn(key, td, snr_db)
        return jax.vmap(lambda x: rx_one(x, None))(rx)

    def make_point_tdl(prof):
        ch = tdl_cfgs[prof]
        ds = ch.max_delay / t.srate

        @jax.jit
        def point(payloads, key, snr_db):
            td = jax.vmap(tx)(payloads)
            keys = jax.random.split(key, payloads.shape[0] + 1)
            h = jax.vmap(lambda k: chm.tdl_coefficients(k, ch))(keys[1:])
            faded = jax.vmap(lambda x, hh: chm.apply_tdl(x, ch, hh))(td, h)
            rx = chm.awgn(keys[0], faded, snr_db)
            return jax.vmap(lambda x: rx_one(x, ds))(rx)
        return point

    lines = [
        "# PUSCH BLER through the channel-emulator profiles (round 4)",
        "",
        f"Full receive chain (chest+CFO -> MMSE -> max-log demap -> "
        f"layered min-sum x6 -> TB CRC), 24 PRB 16QAM r0.4 (TBS {tbs}), "
        f"{n_blocks} TBs/point, independent Rayleigh realisation per slot "
        f"for TDL; HST = 600 Hz Doppler at the trajectory's worst "
        f"sustained point; channel profiles mirror "
        f"srs-4G-UE/lib/src/phy/channel (tools/bler_channel_sweep.py).",
        "", "| profile | " + " | ".join(
            f"{s:g} dB" for s in PROFILES[1][1]) + " |",
    ]

    rows = []
    for prof, grid in PROFILES:
        blers = []
        for i, snr in enumerate(grid):
            payloads = jnp.asarray(rng.integers(0, 2, (n_blocks, tbs),
                                                dtype=np.int8))
            key = jax.random.PRNGKey(hash((prof, i)) % (2 ** 31))
            if prof in tdl_cfgs:
                ok = make_point_tdl(prof)(payloads, key, snr)
            else:
                ok = point_awgn(payloads, key, snr, prof == "hst600")
            bler = 1.0 - float(np.asarray(ok).mean())
            blers.append(bler)
            print(f"{prof} {snr:+.1f} dB: BLER {bler:.3f}", flush=True)
        rows.append((prof, grid, blers))

    lines = lines[:-1]
    lines += ["| profile | " + " | ".join("BLER @ SNR" for _ in range(5))
              + " |", "|---|" + "---|" * 5]
    for prof, grid, blers in rows:
        lines.append("| " + prof + " | " + " | ".join(
            f"{b:.3f} @ {s:g} dB" for s, b in zip(grid, blers)) + " |")

    # RLF outage: deterministic slot blanking — decoded fraction must equal
    # the duty cycle exactly (blanked slots fail, on-slots decode at 25 dB).
    b = 20
    payloads = jnp.asarray(rng.integers(0, 2, (b, tbs), dtype=np.int8))

    @jax.jit
    def rlf_run(payloads, key):
        td = jax.vmap(tx)(payloads)
        td = chm.apply_rlf(td, t_on_ms=3, t_off_ms=2)
        rx = chm.awgn(key, td, 25.0)
        return jax.vmap(lambda x: rx_one(x, None))(rx)

    ok = np.asarray(rlf_run(payloads, jax.random.PRNGKey(3)))
    lines += ["",
              f"RLF (3 ms on / 2 ms off, 25 dB): {int(ok.sum())}/{b} slots "
              f"decoded = {ok.mean():.2f} (duty cycle 0.60) — blanked slots "
              f"fail, every on-slot decodes.", ""]
    assert abs(float(ok.mean()) - 0.6) < 1e-9, ok

    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
