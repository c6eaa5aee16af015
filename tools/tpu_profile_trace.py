#!/usr/bin/env python3
"""Per-op XLA profile of the headline DL+UL slot-batch step (bench.py step)
via jax.profiler xplane capture + xprof conversion.

This is the trace-level DL-blob dissection called for in NOTES_ROUND1.md:
stage bisection can't see through XLA fusion, so we capture a device trace
of the real jitted program and rank HLO ops by self time.

Usage: python tools/tpu_profile_trace.py [--sbatch=N] [--clean] [--iters=N]
"""

import glob
import os
import sys
import time


def run_step_traced(s_batch: int, clean: bool, iters: int, trace_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp

    cell = sp.CellConfig(nof_prb=106, nfft=1536, nof_ue=4, prb_per_ue=26,
                         modulation="qam64", target_rate=0.5)
    tbs = cell.derived_tbs()
    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 2, (s_batch, 4, tbs), dtype=np.int8))
    rntis = jnp.asarray((0x4601 + np.arange(4)).astype(np.uint32))
    snr_db = None if clean else 25.0

    def awgn(td, key):
        key, sub = jax.random.split(key)
        sig_pow = jnp.mean(jnp.abs(td) ** 2)
        sigma = jnp.sqrt(sig_pow * 10.0 ** (-snr_db / 10.0) / 2.0)
        n = jax.random.normal(sub, td.shape + (2,), jnp.float32) * sigma
        return td + jax.lax.complex(n[..., 0], n[..., 1]), key

    @jax.jit
    def step(p, eps, key):
        p = jnp.bitwise_xor(p, eps)
        td = sp.dl_slot_batch(p, rntis, cell)
        if snr_db is not None:
            td, key = awgn(td, key)
        payload_hat, tb_ok, nv, cfo, _ = sp.ul_slot_batch(td, rntis, cell)
        eps_next = (payload_hat[0, 0, 0] & jnp.int8(0))
        return payload_hat, tb_ok, eps_next, key

    eps = jnp.int8(0)
    key = jax.random.PRNGKey(42)
    payload_hat, tb_ok, eps, key = step(payloads, eps, key)
    tb_ok.block_until_ready()
    print(f"warmed up; tracing {iters} iters at S={s_batch} "
          f"({'clean' if clean else '25 dB AWGN'})", flush=True)

    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for _ in range(iters):
            payload_hat, tb_ok, eps, key = step(payloads, eps, key)
        _ = int(eps)
        tb_ok.block_until_ready()
        dt = (time.perf_counter() - t0) / (iters * s_batch)
    print(f"traced: {dt*1e3:.3f} ms/slot", flush=True)


def summarize(trace_dir: str, top: int = 40):
    """Convert the captured xplane to HLO op stats and print top self-time."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([path], "framework_op_stats", {})
    import csv
    import io
    if isinstance(data, bytes):
        data = data.decode()
    rows = list(csv.DictReader(io.StringIO(data)))
    # columns vary by version; find the self-time and name columns
    if not rows:
        print("no rows in op stats; raw keys unavailable")
        return
    cols = rows[0].keys()
    print(f"columns: {sorted(cols)}", flush=True)
    name_c = next(c for c in cols if "operation" in c.lower()
                  or c.lower() in ("op_name", "name"))
    self_c = next(c for c in cols if "self" in c.lower()
                  and "time" in c.lower() and "%" not in c
                  and "fraction" not in c.lower())
    type_c = next((c for c in cols if "type" in c.lower()), None)
    dev_c = next((c for c in cols if "host" in c.lower()
                  and "device" in c.lower()), None)

    def val(r, c):
        try:
            return float(r[c])
        except (ValueError, TypeError):
            return 0.0

    rows = [r for r in rows
            if dev_c is None or "device" in str(r.get(dev_c, "")).lower()]
    rows.sort(key=lambda r: -val(r, self_c))
    total = sum(val(r, self_c) for r in rows)
    print(f"\ntotal device self time: {total/1e6:.3f} s-units; top {top} ops:")
    acc = 0.0
    for r in rows[:top]:
        v = val(r, self_c)
        acc += v
        t = (r.get(type_c, "") or "")[:18] if type_c else ""
        print(f"{v/total*100:6.2f}% (cum {acc/total*100:5.1f}%)  {t:18s} "
              f"{str(r[name_c])[:120]}")


def main():
    s_batch, iters, clean = 64, 10, "--clean" in sys.argv
    for a in sys.argv:
        if a.startswith("--sbatch="):
            s_batch = int(a.split("=")[1])
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])
    trace_dir = "/tmp/tpu_trace"
    if "--summarize-only" not in sys.argv:
        os.system(f"rm -rf {trace_dir}")
        run_step_traced(s_batch, clean, iters, trace_dir)
    summarize(trace_dir)


if __name__ == "__main__":
    main()
