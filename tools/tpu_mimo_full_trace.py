#!/usr/bin/env python3
"""xplane per-op profile of the FULL gNB slot MIMO step
(bench.bench_full_cell_mimo's program).

Usage: python tools/tpu_mimo_full_trace.py [--layers=N] [--sbatch=N] [--iters=N]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_profile_trace import summarize


def main():
    import jax

    import bench

    s = 64
    n_layers = 2
    for a in sys.argv:
        if a.startswith("--sbatch="):
            s = int(a.split("=")[1])
        if a.startswith("--iters="):
            bench.ITERS = int(a.split("=")[1])
        if a.startswith("--layers="):
            n_layers = int(a.split("=")[1])

    trace_dir = tempfile.mkdtemp(prefix="mimo_full_trace_")
    with jax.profiler.trace(trace_dir):
        slot_s, t, desc = bench.bench_full_cell_mimo(s, n_layers, 25.0)
    print(f"{desc}; {slot_s*1e3:.3f} ms/slot "
          f"({t.cp.total / slot_s / 1e6:.1f} Msamp/s)", flush=True)
    summarize(trace_dir)


if __name__ == "__main__":
    main()
