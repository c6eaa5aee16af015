#!/usr/bin/env python3
"""Quantify the scheduled/hetero path (VERDICT item 6): run the PF
scheduler under Poisson traffic + CQI churn for N slots, count the
distinct RBG-quantized grant layouts (each layout = one jitted hetero-PHY
compilation), and optionally compile+time the hetero PHY per layout.

Usage:
  python tools/sched_churn.py [--slots=1000] [--compile] [--phy-slots=K]

--compile builds a HeteroCellProcessor per distinct layout on the current
backend and reports compile seconds + steady-state ms/slot of the most
frequent layouts (run on the TPU for the BASELINE.md numbers).
"""

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_scheduler(n_slots: int, nof_ue: int = 4, nof_prb: int = 106,
                  seed: int = 0):
    from srsran_edgeric_5g_tpu.mac import scheduler as mac
    from srsran_edgeric_5g_tpu.runtime.edgeric import cqi_from_sinr_db

    rng = np.random.default_rng(seed)
    rntis = [0x4601 + u for u in range(nof_ue)]
    scfg = mac.SchedulerConfig(nof_prb=nof_prb, policy="time_pf",
                               rbg_size=mac.rbg_size_for_bwp(nof_prb))
    sched = mac.CellScheduler(scfg, rntis)
    sinr = {r: 25.0 for r in rntis}
    for r in rntis:
        sched.handle_csi(r, cqi_from_sinr_db(sinr[r]), sinr[r])
    mean_arrival = [2000 * (u + 1) for u in range(nof_ue)]

    layouts = Counter()
    first_seen = {}
    for slot in range(n_slots):
        for r, lam in zip(rntis, mean_arrival):
            sched.update_buffer(
                r, dl_bytes=sched.ues[r].dl_buffer + int(rng.poisson(lam)))
        grants = sched.run_slot()
        if not grants:
            continue
        key = tuple((g.rnti, g.start_prb, g.nof_prb, g.qm, g.target_rate)
                    for g in grants)
        if key not in layouts:
            first_seen[key] = slot
        layouts[key] += 1
        # CQI random walk (SINR wanders +-0.5 dB/TTI within 18..30 dB);
        # run_slot already drained buffers and rolled the PF averages.
        for r in rntis:
            sinr[r] = float(np.clip(sinr[r] + rng.uniform(-0.5, 0.5),
                                    18.0, 30.0))
            sched.handle_csi(r, cqi_from_sinr_db(sinr[r]), sinr[r])
    return sched, layouts, first_seen


def main():
    n_slots = 1000
    do_compile = "--compile" in sys.argv
    phy_slots = 50
    top_n = None      # --top=N bounds compile mode (relay compiles are
    for a in sys.argv:  # minutes each; the tail layouts extrapolate)
        if a.startswith("--slots="):
            n_slots = int(a.split("=")[1])
        if a.startswith("--phy-slots="):
            phy_slots = int(a.split("=")[1])
        if a.startswith("--top="):
            top_n = int(a.split("=")[1])

    t0 = time.perf_counter()
    sched, layouts, first_seen = run_scheduler(n_slots)
    t_sched = time.perf_counter() - t0
    total = sum(layouts.values())
    print(f"{n_slots} PF slots (4 UE, 106 PRB, RBG snap, Poisson traffic, "
          f"CQI walk): {len(layouts)} distinct grant layouts over {total} "
          f"scheduled slots; scheduler host time "
          f"{t_sched / max(n_slots, 1) * 1e6:.0f} us/slot", flush=True)
    seen_curve = sorted(first_seen.values())
    marks = [s for s in (10, 50, 100, 250, 500, 1000, 2000, 5000)
             if s <= n_slots]
    for m in marks:
        print(f"  layouts discovered by slot {m}: "
              f"{sum(1 for v in seen_curve if v < m)}", flush=True)
    top = layouts.most_common(5)
    cum = sum(c for _, c in top) / total
    print(f"  top-5 layouts cover {cum:.1%} of scheduled slots", flush=True)

    if not do_compile:
        return

    import jax.numpy as jnp
    from srsran_edgeric_5g_tpu.mac import scheduler as mac
    from srsran_edgeric_5g_tpu.models.hetero_cell import HeteroCellProcessor
    from srsran_edgeric_5g_tpu.ran import numerology as num

    t = num.slot_timing(nof_prb=106, nfft=1536)
    rng = np.random.default_rng(1)
    print("compiling the DL+DLRX hetero programs per layout "
          "(most frequent first):", flush=True)
    compile_times = []
    steady = []
    for i, (key, count) in enumerate(
            layouts.most_common(top_n or len(layouts))):
        grants = [mac.DlGrant(rnti=r, start_prb=sp_, nof_prb=np_, mcs=0,
                              qm=qm, target_rate=tr,
                              tbs=0)
                  for (r, sp_, np_, qm, tr) in key]
        cfgs = mac.CellScheduler(
            mac.SchedulerConfig(nof_prb=106), [g.rnti for g in grants]
        ).to_pdsch_configs(grants)
        proc = HeteroCellProcessor(t, cfgs)
        payloads = [jnp.asarray(rng.integers(0, 2, (1, n), dtype=np.int8))
                    for n in proc.tbs]
        c0 = time.perf_counter()
        td = proc.process_dl_slot(payloads)
        outs = proc.process_dl_rx_slot(td)
        np.asarray(outs[0][1])
        c1 = time.perf_counter()
        compile_times.append(c1 - c0)
        if i < 3:   # steady-state timing for the top layouts
            reps = phy_slots
            s0 = time.perf_counter()
            for _ in range(reps):
                td = proc.process_dl_slot(payloads)
                outs = proc.process_dl_rx_slot(td)
            np.asarray(outs[0][1])
            steady.append((time.perf_counter() - s0) / reps * 1e3)
        print(f"  layout {i} (used {count}x): compile+first-run "
              f"{c1 - c0:.1f} s" +
              (f", steady {steady[-1]:.2f} ms/slot" if i < 3 else ""),
              flush=True)
    n_c = len(compile_times)
    est_all = sum(compile_times) / n_c * len(layouts)
    print(f"compile wall time: {sum(compile_times):.0f} s for the top "
          f"{n_c} layouts (mean {sum(compile_times) / n_c:.1f} s/layout); "
          f"extrapolated {est_all:.0f} s for all {len(layouts)}, amortized "
          f"over {total} slots = {est_all / total * 1e3:.1f} ms/slot",
          flush=True)


if __name__ == "__main__":
    main()
