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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    # Mirrors bench.py: pre-generated device-resident noise applied with
    # one fused add (generation is harness, not pipeline).
    @jax.jit
    def make_noise(p, key):
        td = sp.dl_slot_batch(p, rntis, cell)
        sig_pow = jnp.mean(jnp.abs(td) ** 2)
        sigma = jnp.sqrt(sig_pow * 10.0 ** (-snr_db / 10.0) / 2.0)
        n = jax.random.normal(key, td.shape + (2,), jnp.float32) * sigma
        return n[..., 0], n[..., 1]  # planar f32: mirrors bench.py

    noise = (make_noise(payloads, jax.random.key(42, impl="rbg"))
             if snr_db is not None
             else (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)))

    @jax.jit
    def step(p, eps, flip, noise):
        p = jnp.bitwise_xor(p, eps)
        td = sp.dl_slot_batch(p, rntis, cell)
        if snr_db is not None:
            nr, ni = noise
            td = jax.lax.complex(jnp.real(td) + nr * flip,
                                 jnp.imag(td) + ni * flip)
        payload_hat, tb_ok, nv, cfo, _ = sp.ul_slot_batch(td, rntis, cell)
        eps_next = (payload_hat[0, 0, 0] & jnp.int8(0))
        return payload_hat, tb_ok, eps_next, -flip

    eps = jnp.int8(0)
    key = jnp.float32(1.0)
    payload_hat, tb_ok, eps, key = step(payloads, eps, key, noise)
    tb_ok.block_until_ready()
    print(f"warmed up; tracing {iters} iters at S={s_batch} "
          f"({'clean' if clean else '25 dB AWGN'})", flush=True)

    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for _ in range(iters):
            payload_hat, tb_ok, eps, key = step(payloads, eps, key, noise)
        _ = int(eps)
        tb_ok.block_until_ready()
        dt = (time.perf_counter() - t0) / (iters * s_batch)
    print(f"traced: {dt*1e3:.3f} ms/slot", flush=True)


def summarize(trace_dir: str, top: int = 45):
    """Parse the captured xplane directly (the xprof CSV converter is broken
    in this env) and rank XLA ops on the TPU device plane by total time,
    grouped by op name with trailing .NNN ids stripped."""
    import re
    from collections import defaultdict

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")
    from tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if p.name.startswith("/device:TPU"))
    md = plane.event_metadata

    groups = defaultdict(lambda: [0.0, 0, ""])  # key -> [ps, count, example]
    total_ps = 0.0
    shape_re = re.compile(r"=\s*(\(?[a-z0-9]+\[[^\]{]*\])")
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            m = md[ev.metadata_id]
            kind = re.sub(r"[.\d]+$", "", m.display_name or m.name)
            sm = shape_re.search(m.name or "")
            key = f"{kind} {sm.group(1) if sm else '?'}"
            g = groups[key]
            g[0] += ev.duration_ps
            g[1] += 1
            if not g[2]:
                # first ~160 chars of the HLO text carry shape info
                g[2] = (m.name or "").split(", calls=")[0][:160]
            total_ps += ev.duration_ps

    ranked = sorted(groups.items(), key=lambda kv: -kv[1][0])
    print(f"\ntotal device op time: {total_ps/1e12:.4f} s; "
          f"{len(ranked)} op groups; top {top}:")
    acc = 0.0
    for key, (ps, n, example) in ranked[:top]:
        acc += ps
        print(f"{ps/total_ps*100:6.2f}% (cum {acc/total_ps*100:5.1f}%) "
              f"x{n:5d}  {ps/1e9:8.3f} ms  {key}")
        print(f"        {example}")


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
