#!/usr/bin/env python3
"""Decoder BLER parity: identical noisy int8 LLR realizations through the
reference LDPC decoder (native/refharness `decode_llrs`, compiled from
/root/reference) and through this framework's production decode schedules.

Per MCS operating point, the Python side generates the full TX chain
(segment -> LDPC encode -> rate match -> QAM -> AWGN -> reference-exact
int8 demap -> rate dematch into the int8 N-domain buffer) and feeds the
SAME buffers to:
  * the reference ldpc_decoder (generic or AVX2, 6 iterations, alpha 0.8),
  * layered_rolls_bf16 (the production TPU schedule),
  * layered_rolls_i8 (reference fixed-point semantics — bit-identical to
    the reference by construction, a protocol sanity check).

Block criterion: exact K-bit codeblock match (common to all three); TB
BLER = any codeblock failed.  Writes the overlay table to BLER_R2.md.

Run on the TPU for the production-schedule curve:
    python tools/bler_parity.py [--blocks=1000] [--impl=avx2] [--out=BLER_R2.md]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HARNESS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "build", "refharness", "refharness")

# (mcs_idx, label, SNR grid) — 0.25 dB steps around each waterfall (placed
# by a coarse reference-decoder sweep at 32 TBs: 0.84->0 across [-1,0],
# 1->0 across [8,10], 1->0 across [16,17]).
CASES = [
    (4, "QPSK r0.30", np.arange(-1.75, 0.30, 0.25)),
    (15, "16QAM r0.60", np.arange(7.75, 10.05, 0.25)),
    (24, "64QAM r0.75", np.arange(15.25, 17.30, 0.25)),
]


def build_point(mcs_idx, n_blocks, rng, nof_prb=52):
    """TX chain up to the (B*C, cols*Zc) int8 N-domain LLR template parts:
    returns (seg, rm, tx_cbs, symbols)."""
    import jax.numpy as jnp
    from srsran_edgeric_5g_tpu.ops import modulation
    from srsran_edgeric_5g_tpu.ops.ldpc import encoder, rate_match, segmenter
    from srsran_edgeric_5g_tpu.ran import tbs as tbs_mod

    mcs = tbs_mod.mcs_config(mcs_idx, "qam64")
    nre = tbs_mod.nof_re(nof_prb, 12, 12)
    a = tbs_mod.tbs(nre, mcs.target_rate, mcs.qm)
    g_total = nre * mcs.qm
    bg = segmenter.select_base_graph(a, mcs.target_rate)
    seg = segmenter.get_segment_plan(a, bg, g_total, mcs.qm)
    rm = rate_match.get_rate_match_plan(seg.bg, seg.zc, seg.e[0], 0, mcs.qm,
                                        seg.k_prime)
    payload = jnp.asarray(rng.integers(0, 2, (n_blocks, a), dtype=np.int8))
    cbs = segmenter.segment_tb(payload, seg)            # (B*C, K)
    cw = encoder.encode(cbs, seg.bg, seg.zc)
    bits = rate_match.rate_match(cw, rm)                # (B*C, E)
    syms = np.asarray(modulation.modulate(bits, mcs.modulation))
    return mcs, a, seg, rm, np.asarray(cbs), syms


def llr_buffer(seg, rm, syms, snr_db, rng):
    """AWGN + reference-exact int8 demap + dematch -> int8 (B*C, cols*Zc)."""
    import jax.numpy as jnp
    from srsran_edgeric_5g_tpu.ops import modulation
    from srsran_edgeric_5g_tpu.ops.ldpc import rate_match

    nv = 10 ** (-snr_db / 10)
    noise = rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape)
    y = jnp.asarray((syms + noise * np.sqrt(nv / 2)).astype(np.complex64))
    mod_name = {2: "qpsk", 4: "qam16", 6: "qam64"}[rm.qm]
    llr = modulation.demodulate_soft(y, jnp.float32(nv), mod_name)  # int8 wire
    full = rate_match.rate_dematch(llr.astype(jnp.float32), rm)
    # int8 N-domain buffer (E < N at these points: pure placement, no
    # accumulation — the cast is exact; fillers saturate to +127, punctured
    # systematic positions stay 0, matching the reference rx_buffer domain).
    return np.clip(np.round(np.asarray(full)), -127, 127).astype(np.int8)


def decode_ref(buf_i8, seg, iters, impl):
    """Reference decoder via refharness decode_llrs."""
    nmsg, n_full = buf_i8.shape
    r = subprocess.run(
        [HARNESS, "decode_llrs", str(seg.bg), str(seg.zc), str(nmsg),
         str(iters), impl],
        input=buf_i8.tobytes(), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, check=True)
    kb = 22 if seg.bg == 1 else 10
    k = kb * seg.zc
    hards = np.frombuffer(r.stdout[:nmsg * k], np.uint8).reshape(nmsg, k)
    return hards


_RUN_CACHE = {}


def _decode_program(seg_bg, seg_zc, n_full, iters, schedule):
    """Build (and memoize) the jitted unpack->decode->pack program: tracing
    the unrolled 46-row decode costs minutes per call at the 512-CB case
    shapes — the per-(point, schedule) rebuild dominated the sweep's wall
    time before this cache."""
    import functools

    import jax
    import jax.numpy as jnp
    from srsran_edgeric_5g_tpu.ops.ldpc import decoder

    key = (seg_bg, seg_zc, n_full, iters, schedule)
    if key in _RUN_CACHE:
        return _RUN_CACHE[key]

    k = (22 if seg_bg == 1 else 10) * seg_zc
    k32 = -(-k // 32) * 32

    @functools.partial(jax.jit, static_argnums=())
    def run(packed):
        # uint32 -> 4 sign-extended int8 lanes -> f32 LLRs
        sh = jnp.asarray([0, 8, 16, 24], jnp.uint32)
        v = (packed[:, :, None] >> sh[None, None, :]) & jnp.uint32(0xFF)
        v = v.reshape(packed.shape[0], -1)[:, :n_full]
        llr = (v.astype(jnp.int32) + 128) % 256 - 128
        # The buffer is ALREADY in the reference's int8 wire domain
        # (demap clip +-20 -> +-120).  The i8 schedule must see int8
        # dtype or it re-applies the wire quantization (x6) and
        # saturates everything flat; the float schedules consume the
        # +-120-domain values directly (min-sum is scale-invariant).
        llr = (llr.astype(jnp.int8) if schedule.endswith("_i8")
               else llr.astype(jnp.float32))
        hard, _ = decoder.decode(llr, seg_bg, seg_zc,
                                 num_iters=iters, schedule=schedule)
        # pack hard bits 32/word for the downlink
        hp = jnp.pad(hard.astype(jnp.uint32), ((0, 0), (0, k32 - k)))
        w = jnp.asarray(1, jnp.uint32) << jnp.arange(32, dtype=jnp.uint32)
        return jnp.sum(hp.reshape(hard.shape[0], -1, 32) * w[None, None, :],
                       axis=-1, dtype=jnp.uint32)

    _RUN_CACHE[key] = run
    return run


def decode_ours(buf_i8, seg, iters, schedule, chunk=512):
    """Chunked decode: one multi-thousand-CB batch makes XLA-CPU's LLVM JIT
    run out of code-section mappings at the MCS-24 shapes (observed
    'Unable to allocate section memory'); <=512-CB calls compile once and
    reuse.

    Wire format through the (slow, single-client) axon relay: int8 LLRs
    packed 4-per-uint32 up (int8 transfers are unimplemented on that
    backend and f32 would be 4x the bytes), hard bits packed 32-per-uint32
    down — together ~25x less relay traffic per point than the naive
    f32-up/f32-down form."""
    import jax.numpy as jnp

    n_full = buf_i8.shape[1]
    n4 = -(-n_full // 4) * 4
    k = (22 if seg.bg == 1 else 10) * seg.zc
    k32 = -(-k // 32) * 32
    run = _decode_program(seg.bg, seg.zc, n_full, iters, schedule)

    outs = []
    for i in range(0, buf_i8.shape[0], chunk):
        part = buf_i8[i:i + chunk]
        pad = np.zeros((part.shape[0], n4), np.uint8)
        pad[:, :n_full] = part.view(np.uint8)
        packed = np.ascontiguousarray(pad).view(np.uint32)
        words = np.asarray(run(jnp.asarray(packed)))
        bits = ((words[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1)
        outs.append(bits.reshape(part.shape[0], k32)[:, :k].astype(np.uint8))
    return np.concatenate(outs, axis=0)


def tb_bler(hards, tx_cbs, c):
    ok_cb = (hards == tx_cbs).all(axis=1)
    ok_tb = ok_cb.reshape(-1, c).all(axis=1)
    return 1.0 - ok_tb.mean()


def main():
    n_blocks = 1000
    impl = "avx2"
    out_path = "BLER_R2.md"
    iters = 6
    case_idx = None
    schedules = ["layered_rolls_wire", "layered_rolls_bf16",
                 "layered_rolls_i8"]
    for a in sys.argv:
        if a.startswith("--blocks="):
            n_blocks = int(a.split("=")[1])
        if a.startswith("--impl="):
            impl = a.split("=")[1]
        if a.startswith("--out="):
            out_path = a.split("=")[1]
        if a.startswith("--schedules="):
            schedules = a.split("=")[1].split(",")
        if a.startswith("--case="):
            case_idx = int(a.split("=")[1])

    if case_idx is None:
        # Driver mode: one fresh process per MCS case.  XLA:CPU's LLVM JIT
        # reserves a bounded contiguous code-section pool per process;
        # three cases' worth of compiled decode/chain programs exhaust it
        # ('Unable to allocate section memory') — per-case subprocesses
        # keep each pool small and make the sweep restartable.
        frags = []
        for i in range(len(CASES)):
            frag = f"{out_path}.case{i}"
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), f"--case={i}",
                 f"--blocks={n_blocks}", f"--impl={impl}", f"--out={frag}",
                 "--schedules=" + ",".join(schedules)])
            if r.returncode != 0:
                sys.exit(r.returncode)
            frags.append(frag)
        with open(out_path, "w") as f:
            f.write("\n".join(open(p).read().rstrip("\n") for p in frags)
                    + "\n")
        for p in frags:
            os.unlink(p)
        print(f"wrote {out_path}", flush=True)
        return

    import jax
    # Under the axon TPU relay, int8 and complex64 device->host transfers
    # are unimplemented and eager complex ops fail — run the TX-chain
    # synthesis (segment/encode/modulate/demap/dematch) on the CPU backend
    # and reserve the TPU for the decode calls.
    if os.environ.get("JAX_PLATFORMS", "") == "axon":
        jax.config.update("jax_platforms", "axon,cpu")
    cpu0 = jax.devices("cpu")[0]
    backend = jax.default_backend()
    lines = [] if case_idx else [
        "# BLER decoder parity vs the reference LDPC decoder",
        "",
        f"Identical noisy int8 LLR realizations (reference demap "
        f"quantization, clip ±20 -> ±120; 52 PRB 12-symbol allocation, "
        f"AWGN) into the reference `ldpc_decoder_{impl}` and this "
        f"framework's schedules; {iters} iterations, alpha 0.8 both sides; "
        f"{n_blocks} TBs/point; block = exact K-bit codeblock match, TB = "
        f"all its codeblocks.  Our decoders ran on the `{backend}` backend "
        f"(tools/bler_parity.py).", ""]

    for mcs_idx, label, grid in [CASES[case_idx]]:
        rng = np.random.default_rng(1000 + mcs_idx)
        with jax.default_device(cpu0):
            mcs, a, seg, rm, tx_cbs, syms = build_point(mcs_idx, n_blocks,
                                                        rng)
        c = seg.c
        hdr = (f"## MCS {mcs_idx} ({label}) — TBS {a}, C={c}, Zc={seg.zc}, "
               f"BG{seg.bg}, E={rm.e}")
        print(hdr, flush=True)
        lines += [hdr, "",
                  "| SNR (dB) | reference | " + " | ".join(schedules) + " |",
                  "|---|---|" + "---|" * len(schedules)]
        for snr in grid:
            with jax.default_device(cpu0):
                buf = llr_buffer(seg, rm, syms, float(snr), rng)
            row = [f"| {snr:+.2f} "]
            ref_b = tb_bler(decode_ref(buf, seg, iters, impl), tx_cbs, c)
            row.append(f"| {ref_b:.4f} ")
            ours = []
            for sch in schedules:
                b = tb_bler(decode_ours(buf, seg, iters, sch), tx_cbs, c)
                ours.append(b)
                row.append(f"| {b:.4f} ")
            lines.append("".join(row) + "|")
            print(f"  {snr:+.2f} dB: ref {ref_b:.4f} " +
                  " ".join(f"{s}={b:.4f}" for s, b in zip(schedules, ours)),
                  flush=True)
        lines.append("")

    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
