"""LDPC layered normalized-min-sum decoder (TS 38.212 base graphs).

Counterpart of the reference's layered min-sum decoder
(srsRAN-5G-ER/lib/phy/upper/channel_coding/ldpc/ldpc_decoder_impl.cpp:60-185,
scaling_factor 0.8 per ldpc_decoder_impl.h:186), re-designed for XLA/TPU:

  * The layer schedule (one layer per base-graph check row) is a
    `lax.fori_loop` over static per-layer gather/scatter index tensors padded
    to the max row degree — no data-dependent control flow.
  * The Zc lifting dimension and the codeblock batch are the vector lanes
    (the reference pads nodes to SIMD width; here Zc*B fills the VPU).
  * Early termination mirrors the reference's CRC early stop
    (ldpc_decoder_impl.cpp:125-133) at batch granularity: after each sweep a
    device-side syndrome check runs, and a `lax.while_loop` exits once EVERY
    codeblock in the call satisfies parity (per-CB exits would serialize the
    batch).  At operating SNR this cuts the average sweep count from 6 to
    2-3; worst case is unchanged.

State per layer r: posterior LLRs L (B, cols*Zc) and check-to-variable
messages R (B, rows, max_deg, Zc).  Update:
    t = L[edges(r)] - R[r]           (variable-to-check, extrinsic)
    R'[e] = 0.8 * sign_prod/sign(t_e) * min_{e' != e} |t_{e'}|
    L[edges(r)] = t + R'
LLR convention: positive <=> bit 0 (matches ops.modulation).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .graph import get_graph

DEFAULT_SCALING = 0.8
DEFAULT_ITERS = 6  # reference default (ldpc_decoder_impl.h:216)

# Every schedule name decode() accepts (incl. the dispatch aliases); the
# SRSRAN_TPU_DECODE_SCHEDULE A/B override is validated against this set so
# a typo'd env var errors instead of silently decoding with the gather
# fallback's different semantics.
_KNOWN_SCHEDULES = frozenset({
    "auto", "wire_auto", "pallas", "flooding",
    "layered", "layered_wire",
    "layered_rolls", "layered_rolls_bf16", "layered_rolls_wire",
    "layered_rolls_wire_i8s", "layered_rolls_mixed", "layered_rolls_i8",
    "layered_rolls_cr", "layered_rolls_cr_f32",
    "layered_waves", "layered_waves_bf16",
})


@dataclasses.dataclass(frozen=True)
class DecodePlan:
    bg: int
    zc: int
    rows: int
    cols: int
    kb: int
    max_deg: int
    gather_idx: np.ndarray   # (rows, max_deg*Zc) int32 into flat L; pad -> cols*Zc
    mask: np.ndarray         # (rows, max_deg) bool

    def __hash__(self):
        return hash((self.bg, self.zc))


@functools.lru_cache(maxsize=None)
def get_decode_plan(bg: int, zc: int) -> DecodePlan:
    g = get_graph(bg, zc)
    deg = np.bincount(g.edge_row, minlength=g.rows)
    max_deg = int(deg.max())
    z = np.arange(zc)
    n_full = g.cols * zc
    # Padded gather indices: padding points at n_full (one-past-the-end) so
    # scatters drop it and gathers (clipped) read a dummy slot we ignore via
    # the mask.
    idx = np.full((g.rows, max_deg, zc), n_full, dtype=np.int32)
    mask = np.zeros((g.rows, max_deg), dtype=bool)
    slot = np.zeros(g.rows, dtype=np.int64)
    for r, c, s in zip(g.edge_row, g.edge_col, g.edge_shift):
        j = slot[r]
        idx[r, j] = c * zc + (z + s) % zc
        mask[r, j] = True
        slot[r] += 1
    return DecodePlan(bg=bg, zc=zc, rows=g.rows, cols=g.cols, kb=g.kb,
                      max_deg=max_deg,
                      gather_idx=idx.reshape(g.rows, max_deg * zc),
                      mask=mask)


def decode(llrs: jnp.ndarray, bg: int, zc: int,
           num_iters: int = DEFAULT_ITERS,
           scaling: float = DEFAULT_SCALING,
           schedule: str = "auto",
           early_stop: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decode (B, cols*Zc) float LLRs -> (hard message bits (B, kb*Zc),
    parity_ok (B,) bool).

    Input covers the full codeword including the 2*Zc punctured systematic
    positions (rate dematching fills those with 0) and filler positions
    (large positive LLR).

    ``schedule``:
      * 'auto' (default): 'layered_rolls_bf16' on TPU, 'layered' on CPU (the
        unrolled program compiles slowly on the CPU backend).
      * 'layered_rolls': reference-equivalent layered convergence, formulated
        as static slices + lane rotations (no gathers) — the fast XLA path on
        TPU (~6x the gather formulation), f32 message storage.
      * 'layered_rolls_bf16': same, with bf16 posterior/message storage
        (halves the HBM traffic of the R tensor — the decode hot loop is
        bandwidth-bound on it; 1.30x at the pipeline decode shape, and
        bf16's 8-bit mantissa still exceeds the reference's int8 wire).
      * 'layered_rolls_i8': reference fixed-point semantics (the reference
        decoder IS int8: saturating int8 posteriors + messages,
        ldpc_decoder_impl.cpp int8 LLR clamp; wire quantization clip +-20 ->
        +-120 per demodulation_mapper int8 quantizer) — 4x less message
        bandwidth.
      * 'layered': same algorithm via dynamic gather/scatter index tensors.
      * 'flooding': all rows parallel per iteration; needs ~2x iterations
        for equal BLER.
    """
    if os.environ.get("SRSRAN_TPU_DECODE_SCHEDULE"):
        # Perf A/B: force a schedule regardless of the caller's request
        # (e.g. =layered_rolls_bf16 to measure the wire-semantics cost).
        # Read at TRACE time: set it before the first decode of a process —
        # changing it after jit caching has no effect on cached programs.
        forced = os.environ["SRSRAN_TPU_DECODE_SCHEDULE"]
        if forced not in _KNOWN_SCHEDULES:
            raise ValueError(
                f"SRSRAN_TPU_DECODE_SCHEDULE={forced!r} is not a known "
                f"schedule; valid: {sorted(_KNOWN_SCHEDULES)}")
        schedule = forced
    if os.environ.get("SRSRAN_TPU_DECODE_FIXED"):
        # Perf A/B: fixed sweep count, no early-stop while (bounds the
        # while-loop's carry overhead vs its saved sweeps).
        num_iters = int(os.environ["SRSRAN_TPU_DECODE_FIXED"])
        early_stop = False
    if schedule == "auto":
        if jax.default_backend() == "tpu":
            # Measured on v5e at the pipeline decode shape (512 CBs, BG1
            # Zc=224, 25 dB wire): flat rolls_bf16 0.095 ms/slot vs pallas
            # 0.41 — the XLA-level roll-syndrome early stop (2-3 sweeps vs
            # the kernel's fixed 6) plus bf16 storage beats the VMEM-resident
            # kernel, which only wins for full-iteration workloads (request
            # schedule='pallas' explicitly for those).
            schedule = "layered_rolls_bf16"
        else:
            schedule = "layered"
    if schedule == "wire_auto":
        # Reference-production semantics for int8-wire-domain inputs, on
        # the backend-appropriate formulation.
        schedule = ("layered_rolls_wire" if jax.default_backend() == "tpu"
                    else "layered_wire")
    if schedule == "pallas":
        from .decoder_pallas import decode_pallas
        return decode_pallas(llrs, bg, zc, num_iters, scaling)
    if schedule == "flooding":
        return _decode_flooding(llrs, bg, zc, num_iters, scaling)
    if schedule == "layered_rolls":
        return _decode_layered_rolls(llrs, bg, zc, num_iters, scaling,
                                     early_stop)
    if schedule == "layered_rolls_bf16":
        return _decode_layered_rolls(llrs, bg, zc, num_iters, scaling,
                                     early_stop, msg_dtype=jnp.bfloat16)
    if schedule == "layered_rolls_wire":
        # Reference-PRODUCTION (avx2) semantics in bf16 storage: expects
        # inputs in the int8 wire domain (demap clip ±20 -> ±120 ints —
        # modulation.demodulate_soft(quantize=True) or wire_quantize).
        # Integers ≤ 255 are exact in bf16, the ±64 load clamp and ±120
        # v2c saturation bound every intermediate, and the truncating
        # scale matches scale_epi8 — decode is then BIT-IDENTICAL to the
        # reference ldpc_decoder_avx2 (tests/test_reference_parity.py),
        # inheriting its ~0.3-0.5 dB waterfall advantage over plain
        # normalized min-sum (see _minsum scale_floor).
        return _decode_layered_rolls(llrs, bg, zc, num_iters, scaling,
                                     early_stop, msg_dtype=jnp.bfloat16,
                                     sat_limits=(64, 120), scale_floor=True)
    if schedule == "layered_rolls_wire_i8s":
        # Wire semantics with int8 STORAGE, bf16 compute: every wire value
        # is an integer (|R| <= floor(120*alpha) = 96, |L| <= 127), so the
        # int8 round-trip is lossless and halves the HBM traffic of the
        # dominant (B, edges, Zc) R tensor vs bf16 — still BIT-IDENTICAL
        # to the reference avx2 decoder.
        return _decode_layered_rolls(llrs, bg, zc, num_iters, scaling,
                                     early_stop, msg_dtype=jnp.bfloat16,
                                     sat_limits=(64, 120), scale_floor=True,
                                     store_dtype=jnp.int8)
    if schedule == "layered_rolls_mixed":
        # bf16 R storage (the bandwidth win) + f32 posterior (the accuracy).
        return _decode_layered_rolls(llrs, bg, zc, num_iters, scaling,
                                     early_stop, msg_dtype=jnp.bfloat16,
                                     post_dtype=jnp.float32)
    if schedule == "layered_waves":
        return _decode_layered_waves(llrs, bg, zc, num_iters, scaling,
                                     early_stop)
    if schedule == "layered_waves_bf16":
        return _decode_layered_waves(llrs, bg, zc, num_iters, scaling,
                                     early_stop, msg_dtype=jnp.bfloat16)
    if schedule == "layered_rolls_cr":
        return _decode_layered_rolls_cr(llrs, bg, zc, num_iters, scaling,
                                        early_stop, msg_dtype=jnp.bfloat16)
    if schedule == "layered_rolls_cr_f32":
        return _decode_layered_rolls_cr(llrs, bg, zc, num_iters, scaling,
                                        early_stop, msg_dtype=jnp.float32)
    if schedule == "layered_rolls_i8":
        return _decode_layered_rolls_i8(llrs, bg, zc, num_iters, scaling,
                                        early_stop)
    if schedule not in ("layered", "layered_wire"):
        raise ValueError(f"unknown decode schedule {schedule!r}; valid: "
                         f"{sorted(_KNOWN_SCHEDULES)}")
    # 'layered'/'layered_wire': the gather-based formulation (CPU default).
    # _wire applies the reference-production semantics (±64 load clamp,
    # ±120 v2c saturation, truncating scale) for int8-wire-domain inputs.
    wire = schedule == "layered_wire"
    plan = get_decode_plan(bg, zc)
    b = llrs.shape[0]
    zc_, rows, max_deg = plan.zc, plan.rows, plan.max_deg
    n_full = plan.cols * zc_
    big = jnp.float32(1e30)

    gather_idx = jnp.asarray(plan.gather_idx)          # (rows, max_deg*Zc)
    mask = jnp.asarray(plan.mask[None, :, :, None])    # (1, rows, max_deg, 1)

    # One dummy slot at the end absorbs padded gathers.
    l_in = llrs.astype(jnp.float32)
    if wire:
        l_in = jnp.clip(l_in, -64.0, 64.0)       # soft_bits_clamp at load
    l0 = jnp.concatenate([l_in, jnp.zeros((b, 1), jnp.float32)], axis=-1)
    r0 = jnp.zeros((b, rows, max_deg, zc_), jnp.float32)

    def layer_step(r_idx, state):
        l, r_msgs = state
        idx = gather_idx[r_idx]                        # (max_deg*Zc,)
        lmask = mask[:, r_idx]                         # (1, max_deg, 1)
        lg = l[:, idx].reshape(b, max_deg, zc_)
        t = lg - r_msgs[:, r_idx]
        if wire:
            t = jnp.clip(t, -120.0, 120.0)       # v2c saturation
            frozen = jnp.abs(lg) > 120.0         # ±127-pinned posteriors
            t = jnp.where(frozen, lg, t)
        r_new = _minsum(t, lmask, scaling, deg_axis=1, scale_floor=wire)
        l_new = t + r_new
        if wire:
            # promotion_sum incl. infinite addends (avx2 compute_soft_bits):
            # |sum| > 120 pins at ±127; an infinite t or c2v forces its
            # sign unless both are infinite with opposite signs.
            t_p, t_n = t > 120.0, t < -120.0
            r_p, r_n = r_new > 120.0, r_new < -120.0
            l_new = jnp.where(l_new > 120.0, 127.0,
                              jnp.where(l_new < -120.0, -127.0, l_new))
            l_new = jnp.where((t_p & ~r_n) | (r_p & ~t_n), 127.0, l_new)
            l_new = jnp.where((t_n & ~r_p) | (r_n & ~t_p), -127.0, l_new)
        l = l.at[:, idx].set(l_new.reshape(b, -1), mode="drop")
        r_msgs = r_msgs.at[:, r_idx].set(r_new)
        return l, r_msgs

    def sweep(state):
        return jax.lax.fori_loop(0, rows, layer_step, state)

    def hard_of(l):
        # Hard decision maps LLR == 0 to bit 1 (srsran hard_decision:
        # cmpgt(1, soft) — integer-domain posteriors hit exact zero).
        return (l[:, :n_full] <= 0).astype(jnp.int8)

    l = _iterate(sweep, (l0, r0), num_iters, early_stop,
                 lambda s: check_parity(hard_of(s[0]), bg, zc))[0]
    hard = hard_of(l)
    ok = check_parity(hard, bg, zc)
    return hard[:, :plan.kb * zc_], ok


def _iterate(sweep, state, num_iters: int, early_stop: bool, parity_fn,
             done0=None):
    """Run ``sweep`` num_iters times, exiting early once every codeword in
    the batch satisfies parity (the reference's CRC early stop,
    ldpc_decoder_impl.cpp:125-133, at batch granularity).

    ``done0``: convergence state of ``state`` as given (used when the caller
    already ran a specialized first sweep outside the loop)."""
    if not early_stop:
        out = jax.lax.fori_loop(0, num_iters, lambda _, s: sweep(s), state)
        _record_trips(jnp.int32(num_iters))
        return out

    def cond(carry):
        i, done, _ = carry
        return jnp.logical_and(i < num_iters, jnp.logical_not(done))

    def body(carry):
        i, _, s = carry
        s = sweep(s)
        return i + 1, jnp.all(parity_fn(s)), s

    init_done = jnp.bool_(False) if done0 is None else done0
    carry = jax.lax.while_loop(cond, body, (0, init_done, state))
    _record_trips(carry[0])
    return carry[2]


# Diagnostic hook: when a list is installed here, _iterate appends the
# (traced) while trip count of each decode it runs — lets probes return
# the actual sweep count from inside a jitted program (the early-stop
# loop's behavior is otherwise invisible; see tools/tpu_decode_probe.py).
TRIP_SINK: list | None = None


def _record_trips(i):
    if TRIP_SINK is not None:
        TRIP_SINK.append(i)


def _minsum(t: jnp.ndarray, lmask: jnp.ndarray, scaling: float,
            deg_axis: int, scale_floor: bool = False) -> jnp.ndarray:
    """Normalized min-sum check update along ``deg_axis``.

    ``scale_floor`` replicates the reference avx2 scale_epi8 exactly in
    float: floor(mag * floor(scaling * 2^16) / 2^16) — a truncating scale
    whose implicit offset (vs rounding) measures ~0.3-0.5 dB of BLER at
    the QPSK r0.30 waterfall (avx2 0.031 vs generic 0.375 at 6 iters).
    Only meaningful when the inputs are in the reference's integer wire
    domain (magnitudes are then exact in f32/bf16)."""
    big = jnp.float32(1e30)
    at = jnp.where(lmask, jnp.abs(t), big)
    if scale_floor:
        # The reference resets its min/second-min trackers to LLR_MAX=120
        # (update_check_to_variable_messages srsvec::fill), so a tracked
        # magnitude can never exceed 120 — a ±127 frozen message competes
        # (and is emitted) as 120.
        at = jnp.where(lmask, jnp.minimum(at, jnp.asarray(120.0, at.dtype)),
                       big)
    st = jnp.where(t < 0, -1.0, 1.0)
    m1 = jnp.min(at, axis=deg_axis, keepdims=True)
    # First-min selection via argmin (ties -> lowest index, same semantics
    # as the old is_min & cumsum(is_min)==1 form): the cumsum materialized
    # a full s32 (B, deg, Zc) scan per row — ~5% of the slot step in the
    # xplane profile — while the argmin is one reduce and the iota compare
    # fuses into the surrounding elementwise blob.
    amin = jnp.argmin(at, axis=deg_axis)
    iota = jax.lax.broadcasted_iota(jnp.int32, at.shape, deg_axis)
    first_min = iota == jnp.expand_dims(amin, deg_axis)
    m2 = jnp.min(jnp.where(first_min, big, at), axis=deg_axis, keepdims=True)
    mag = jnp.where(first_min, m2, m1)
    if scale_floor:
        # scale_epi8 semantics incl. its a > max passthrough: an infinite
        # (±127-frozen) message rides through unscaled.
        sf16 = np.float32(int(scaling * 65536))
        mag = jnp.where(mag > 120.0,
                        mag, jnp.floor(mag * sf16 * np.float32(1.0 / 65536.0)))
    else:
        mag = scaling * mag
    sign_all = jnp.prod(jnp.where(lmask, st, 1.0), axis=deg_axis, keepdims=True)
    return jnp.where(lmask, (sign_all * st) * mag, 0.0)


def _decode_flooding(llrs, bg, zc, num_iters, scaling):
    """Flooding schedule: one fused update for all check rows per iteration.

    Per iteration:  t = (Lch + scatter_add(R))[edges] - R;  R' = minsum(t);
    i.e. two big gathers, one scatter-add and one vectorised min-sum — no
    per-layer serialization, so the whole (B, rows, max_deg, Zc) tensor hits
    the VPU at once.
    """
    plan = get_decode_plan(bg, zc)
    b = llrs.shape[0]
    zc_, rows, max_deg = plan.zc, plan.rows, plan.max_deg
    n_full = plan.cols * zc_

    flat_idx = jnp.asarray(plan.gather_idx.reshape(-1))      # (rows*deg*Zc,)
    lmask = jnp.asarray(plan.mask[None, :, :, None])          # (1,rows,deg,1)

    lch = jnp.concatenate([llrs.astype(jnp.float32),
                           jnp.zeros((b, 1), jnp.float32)], axis=-1)
    r0 = jnp.zeros((b, rows, max_deg, zc_), jnp.float32)

    def iteration(_, r_msgs):
        l_tot = lch.at[:, flat_idx].add(r_msgs.reshape(b, -1), mode="drop")
        t = (l_tot[:, flat_idx].reshape(b, rows, max_deg, zc_) - r_msgs)
        return _minsum(t, lmask, scaling, deg_axis=2)

    r_final = jax.lax.fori_loop(0, num_iters, iteration, r0)
    l = lch.at[:, flat_idx].add(r_final.reshape(b, -1), mode="drop")[:, :n_full]

    hard = (l <= 0).astype(jnp.int8)
    ok = check_parity(hard, bg, zc)
    return hard[:, :plan.kb * zc_], ok


def _row_edge_lists(g):
    """Per-row static edge lists: (edge_id, col, shift)."""
    row_edges: list[list[tuple[int, int, int]]] = [[] for _ in range(g.rows)]
    for eid, (r, c, s) in enumerate(zip(g.edge_row, g.edge_col, g.edge_shift)):
        row_edges[int(r)].append((eid, int(c), int(s)))
    return row_edges


@functools.lru_cache(maxsize=None)
def _wave_schedule(bg: int):
    """Pack column-disjoint check rows into waves (list scheduling).

    Layered updates of two rows that share no base-graph column COMMUTE
    (they touch disjoint L blocks and distinct R slots), so any schedule
    that keeps every column-sharing pair in its original relative order is
    bit-identical to the sequential layer-per-row sweep.  List scheduling
    (wave(r) = 1 + max wave of earlier conflicting rows) achieves that and
    is near-optimal here: the punctured systematic columns of BG1 appear in
    ~30 rows, lower-bounding any exact schedule.  Result: BG1 46 rows -> 32
    waves, BG2 42 -> 28, with <=5% padded-edge overhead.

    Returns a list of waves; each wave is a list of row indices.
    """
    from .graph import get_graph

    g = get_graph(bg, 2)  # columns/rows are Zc-independent
    row_cols = [set() for _ in range(g.rows)]
    for r, c in zip(g.edge_row, g.edge_col):
        row_cols[int(r)].add(int(c))
    wave = [0] * g.rows
    for r in range(g.rows):
        w = 0
        for rp in range(r):
            if row_cols[r] & row_cols[rp]:
                w = max(w, wave[rp] + 1)
        wave[r] = w
    waves = [[] for _ in range(max(wave) + 1)]
    for r, w in enumerate(wave):
        waves[w].append(r)
    return waves


def _decode_layered_waves(llrs, bg, zc, num_iters, scaling,
                          early_stop: bool = True,
                          msg_dtype=jnp.float32):
    """Wave-packed layered min-sum: bit-identical to `_decode_layered_rolls`
    but column-disjoint layers run as ONE widened min-sum step (BG1: 46
    sequential steps -> 32; see `_wave_schedule`).

    R is stored wave-major and padded to each wave's max row degree, so the
    per-wave message read/update is a single static slice +
    dynamic-update-slice (XLA aliases it in place inside the while body)
    instead of per-edge scatters; padded slots hold 0 and never reach L.

    MEASURED DEAD END on v5e (kept as a tested opt-in): at the pipeline
    decode shape (2048 CBs, BG1 Zc=224, 6 iters) waves_bf16 runs 0.213
    ms/slot and waves_f32 0.111 vs rolls_bf16 0.084 — the wave-wide
    (B, k, deg_w, Zc) stacks and the block dus R writes materialize MORE
    HBM traffic than the unrolled per-row steps, whose small tensors XLA
    keeps fused; fewer sequential steps doesn't matter when the loop is
    bandwidth- not latency-bound.  bf16 waves can also flip post-
    convergence ties vs rolls on TPU (different fusion rounding order).
    """
    from .graph import get_graph

    g = get_graph(bg, zc)
    plan = get_decode_plan(bg, zc)
    b = llrs.shape[0]
    row_edges = _row_edge_lists(g)
    waves = _wave_schedule(bg)

    # Wave-major padded R layout: wave w owns slots [off_w, off_w + k*deg_w).
    wave_meta = []          # (offset, rows, deg_w, mask(1,k,deg_w,1))
    total = 0
    for wrows in waves:
        deg_w = max(len(row_edges[r]) for r in wrows)
        m = np.zeros((1, len(wrows), deg_w, 1), dtype=bool)
        for i, r in enumerate(wrows):
            m[0, i, :len(row_edges[r])] = True
        wave_meta.append((total, wrows, deg_w, jnp.asarray(m)))
        total += len(wrows) * deg_w

    l0 = llrs.astype(msg_dtype).reshape(b, g.cols, zc)
    zero = jnp.zeros((b, zc), msg_dtype)

    def sweep_body(l, r_msgs, first):
        r_parts = [] if first else None
        for off, wrows, deg_w, lmask in wave_meta:
            k = len(wrows)
            cells = []
            for r in wrows:
                edges = row_edges[r]
                cells += [jnp.roll(l[:, c], -s, axis=-1)
                          for (_, c, s) in edges]
                cells += [zero] * (deg_w - len(edges))
            lg = jnp.stack(cells, axis=1).reshape(b, k, deg_w, zc)
            if first:
                t = lg
            else:
                t = lg - r_msgs[:, off:off + k * deg_w].reshape(
                    b, k, deg_w, zc)
            r_new = _minsum(t, lmask, scaling, deg_axis=2).astype(msg_dtype)
            v = t + r_new
            if first:
                r_parts.append(r_new.reshape(b, k * deg_w, zc))
            else:
                r_msgs = jax.lax.dynamic_update_slice(
                    r_msgs, r_new.reshape(b, k * deg_w, zc), (0, off, 0))
            for i, r in enumerate(wrows):
                for j, (_, c, s) in enumerate(row_edges[r]):
                    l = l.at[:, c].set(jnp.roll(v[:, i, j], s, axis=-1))
        if first:
            r_msgs = jnp.concatenate(r_parts, axis=1)
        return l, r_msgs

    def sweep(state):
        return sweep_body(state[0], state[1], first=False)

    def parity(state):
        l = state[0]
        viol = None
        for r in range(g.rows):
            row_par = None
            for (_, c, s) in row_edges[r]:
                bit = jnp.roll(l[:, c], -s, axis=-1) <= 0
                row_par = bit if row_par is None else row_par ^ bit
            if row_par is not None:
                viol = row_par if viol is None else viol | row_par
        return jnp.logical_not(jnp.any(viol, axis=-1))

    state = sweep_body(l0, None, first=True)
    done0 = jnp.all(parity(state)) if early_stop else None
    l, _ = _iterate(sweep, state, num_iters - 1, early_stop, parity, done0)
    l = l.reshape(b, g.cols * zc)
    hard = (l <= 0).astype(jnp.int8)
    ok = check_parity(hard, bg, zc)
    return hard[:, :plan.kb * zc], ok


def _decode_layered_rolls(llrs, bg, zc, num_iters, scaling,
                          early_stop: bool = True,
                          msg_dtype=jnp.float32, post_dtype=None,
                          sat_limits=None, scale_floor: bool = False,
                          store_dtype=None):
    """Layered min-sum with NO gathers: the lifted-graph cyclic shifts become
    static `jnp.roll` lane rotations and block accesses become static slices.

    This is the TPU-shaped formulation of the reference's node-parallel SIMD
    layout (ldpc_decoder_avx2.cpp): the Zc dimension fills the vector lanes,
    the codeblock batch fills the sublanes, and the whole layer schedule is
    unrolled at trace time from the static edge list.  XLA keeps L and the
    per-edge messages in registers/VMEM across the unrolled sweep.

    ``msg_dtype`` selects the posterior/message STORAGE dtype (f32 default;
    bf16 halves the HBM traffic of the dominant (B, edges, Zc) R tensor —
    the hot loop is bandwidth-bound on it, per the xplane profile).
    """
    from .graph import get_graph

    g = get_graph(bg, zc)
    plan = get_decode_plan(bg, zc)
    b = llrs.shape[0]
    rows = g.rows
    row_edges = _row_edge_lists(g)

    # ``post_dtype`` keeps the posterior L separate from the R message
    # storage: L is ~5x smaller than R ((B, cols, Zc) vs (B, edges, Zc)), so
    # an f32 posterior costs little extra bandwidth while removing the
    # accumulated bf16 rounding of 46 rows x num_iters posterior updates
    # (measured ~0.25 dB of BLER vs the reference decoder at QPSK r0.30
    # when L is also bf16 — see BLER_R2.md).
    l0 = llrs.astype(post_dtype or msg_dtype).reshape(b, g.cols, zc)
    # Reference-style saturation (ldpc_decoder_impl / log_likelihood_ratio
    # semantics expressed in float): ``sat_limits = (load_clamp, msg_sat)``
    # in the input LLR domain — posteriors clamp at load, v2c messages
    # saturate per sweep.  The clipping nonlinearity is part of the
    # reference algorithm's BLER behavior (its saturating int8 min-sum
    # MEASURES ~0.25 dB better than clean float min-sum at QPSK r0.30 —
    # overconfident wrong messages get bounded); only meaningful when the
    # input scale is normalized (the ±120 int8 wire domain).
    if sat_limits is not None:
        l0 = jnp.clip(l0, -sat_limits[0], sat_limits[0])
    # ``store_dtype`` (int8 with wire semantics): L and R live in HBM as
    # int8 — every wire value is an integer (|R| <= floor(alpha*120),
    # |L| <= 127), so the round-trip is exact — and the compute widens to
    # msg_dtype per row.  Halves the dominant R stream vs bf16.
    cdt = post_dtype or msg_dtype
    if store_dtype is not None:
        l0 = l0.astype(store_dtype)

    def sweep_body(l, r_msgs, first):
        """One layered sweep.  ``first=True`` specializes R==0: no R reads
        and the R tensor is BUILT from the sweep's outputs (stacked in edge
        order) instead of scatter-updating a zero-initialized carry — saving
        the (B, edges, Zc) zero broadcast and one full R read (the hot loop
        is HBM-bound on R, per the xplane profile)."""
        r_out = [None] * g.num_edges if first else None
        for r in range(rows):
            edges = row_edges[r]
            le = jnp.stack([jnp.roll(l[:, c], -s, axis=-1)
                            for (_, c, s) in edges], axis=1)  # (B, deg, Zc)
            if store_dtype is not None:
                le = le.astype(cdt)
            t = le if first else le - jnp.stack(
                [r_msgs[:, eid] for (eid, _, _) in edges],
                axis=1).astype(cdt)
            if sat_limits is not None:
                t = jnp.clip(t, -sat_limits[1], sat_limits[1])
                # Promotion freezing (log_likelihood_ratio promotion_sum):
                # a posterior pinned at ±127 broadcasts its certainty
                # unclipped, exactly like the reference int8 semantics.
                frozen = jnp.abs(le) > sat_limits[1]
                t = jnp.where(frozen, le, t)
            r_new = _minsum(t, jnp.bool_(True), scaling, deg_axis=1,
                            scale_floor=scale_floor).astype(msg_dtype)
            v = t + r_new
            if sat_limits is not None:
                # promotion_sum: |sum| > 120 pins at ±127, and an INFINITE
                # addend (frozen posterior OR ±127 c2v message) forces the
                # sum infinite with its sign — unless both are infinite
                # with opposite signs (then the plain saturating sum
                # stands).  avx2 compute_soft_bits mask logic.
                lim = jnp.asarray(sat_limits[1], v.dtype)
                pin = jnp.asarray(127.0, v.dtype)
                t_p, t_n = t > lim, t < -lim
                r_p, r_n = r_new > lim, r_new < -lim
                v = jnp.where(v > lim, pin, jnp.where(v < -lim, -pin, v))
                v = jnp.where((t_p & ~r_n) | (r_p & ~t_n), pin, v)
                v = jnp.where((t_n & ~r_p) | (r_n & ~t_p), -pin, v)
            if store_dtype is not None:
                v = v.astype(store_dtype)
                r_new = r_new.astype(store_dtype)
            for j, (eid, c, s) in enumerate(edges):
                l = l.at[:, c].set(jnp.roll(v[:, j], s, axis=-1))
                if first:
                    r_out[eid] = r_new[:, j]
                else:
                    r_msgs = r_msgs.at[:, eid].set(r_new[:, j])
        if first:
            r_msgs = jnp.stack(r_out, axis=1)
        return l, r_msgs

    def sweep(state):
        return sweep_body(state[0], state[1], first=False)

    def parity(state):
        # Roll-based syndrome (no gathers): XOR the rotated hard bits per
        # check row, accumulate violations.  Much cheaper than check_parity's
        # gather formulation when evaluated every sweep.
        l = state[0]
        viol = None
        for r in range(rows):
            row_par = None
            for (_, c, s) in row_edges[r]:
                bit = jnp.roll(l[:, c], -s, axis=-1) <= 0
                row_par = bit if row_par is None else row_par ^ bit
            if row_par is not None:
                viol = row_par if viol is None else viol | row_par
        return jnp.logical_not(jnp.any(viol, axis=-1))

    state = sweep_body(l0, None, first=True)
    # Head-unroll: run the first few sweeps OUTSIDE the early-stop while.
    # The while's (L, R) carry is ~300 MB at the pipeline decode shape and
    # each trip pays carry bookkeeping the unrolled form doesn't (measured
    # 0.077 -> 0.071 ms/slot on the full-gNB bench when the batch needs 2
    # sweeps); at good SNR the while then usually runs zero trips and only
    # backstops bad slots.  Parity is checked once after the unrolled head
    # (a batch converged at sweep 1 thus runs one extra sweep vs stopping
    # there -- same batch-granularity semantics as the while's all-CB exit).
    # Convergence compaction default: OFF.  Measured on the v5e chip at the
    # production bench point (25 dB, B=2048, stragglers ~0): the refine
    # machinery (argsort + R gather/scatter + two extra parity sweeps + the
    # sub while) costs 0.069 vs 0.060 ms/slot with the plain head-unroll +
    # full-batch-while form — at operating SNR the whole batch converges in
    # the unrolled head sweeps and the while runs zero trips, so there is
    # nothing for the compaction to save.  Set SRSRAN_TPU_DECODE_REFINE=K
    # for low-SNR workloads where a small straggler set needs many sweeps
    # (K least-converged CBs then re-iterate at K/B of the sweep cost).
    refine = int(os.environ.get("SRSRAN_TPU_DECODE_REFINE", "0"))
    use_refine = early_stop and refine > 0 and b > 2 * refine
    head = min(int(os.environ.get("SRSRAN_TPU_DECODE_UNROLL",
                                  "1" if use_refine else "2")),
               num_iters) - 1
    for _ in range(head):
        state = sweep(state)
    left = num_iters - 1 - head
    if use_refine and left > 0:
        # Convergence COMPACTION — the TPU answer to the reference's
        # per-CB early stop (ldpc_decoder_impl.cpp:125-133).  At operating
        # SNR ~99% of the batch satisfies parity after the first sweep;
        # the full-batch while would keep sweeping EVERYONE (B/refine x
        # the work) until the last straggler converges.  Instead: gather
        # the `refine` least-converged CBs into a fixed-shape sub-batch
        # (static K -- no dynamic shapes under jit), run the early-stop
        # while there at K/B of the sweep cost, scatter L AND R back
        # (message state stays exactly "this CB ran more sweeps").  The
        # full-batch while below remains as a backstop for genuinely bad
        # batches (> `refine` stragglers) and usually runs zero trips.
        par = parity(state)                           # (B,) True=converged
        order = jnp.argsort(par)                      # stragglers first
        idx = order[:refine]
        sub = tuple(x[idx] for x in state)
        done_s = jnp.all(parity(sub))
        sub = _iterate(sweep, sub, left, True, parity, done_s)
        state = tuple(x.at[idx].set(v) for x, v in zip(state, sub))
        # The sub-batch CBs have now had their FULL iteration budget
        # (head + sub while ≤ num_iters): freeze them through the backstop
        # so no codeblock ever exceeds the reference's max-iteration cap
        # (ldpc_decoder_impl.cpp — over-iterating stragglers decoded CBs
        # the reference declares failed and skewed low-SNR BLER parity).
        # Non-sub stragglers (> `refine` of them, i.e. a genuinely bad
        # batch) still get their full remaining budget here, and the exit
        # condition ignores frozen CBs so a failed sub CB can't keep the
        # backstop spinning.
        frozen = jnp.zeros((b,), bool).at[idx].set(True)
        fmask = frozen.reshape((b,) + (1,) * (state[0].ndim - 1))

        def bs_cond(carry):
            i, done, _ = carry
            return jnp.logical_and(i < left, jnp.logical_not(done))

        def bs_body(carry):
            i, _, s = carry
            s_new = sweep(s)
            s = tuple(jnp.where(fmask, x, xn) for x, xn in zip(s, s_new))
            return i + 1, jnp.all(parity(s) | frozen), s

        done0 = jnp.all(parity(state) | frozen)
        carry = jax.lax.while_loop(
            bs_cond, bs_body, (jnp.int32(0), done0, state))
        _record_trips(carry[0])
        l = carry[2][0].reshape(b, g.cols * zc)
        hard = (l <= 0).astype(jnp.int8)
        ok = check_parity(hard, bg, zc)
        return hard[:, :plan.kb * zc], ok
    done0 = jnp.all(parity(state)) if early_stop else None
    l, _ = _iterate(sweep, state, left, early_stop, parity, done0)
    l = l.reshape(b, g.cols * zc)
    hard = (l <= 0).astype(jnp.int8)
    ok = check_parity(hard, bg, zc)
    return hard[:, :plan.kb * zc], ok


def _decode_layered_rolls_cr(llrs, bg, zc, num_iters, scaling,
                             early_stop: bool = True,
                             msg_dtype=jnp.bfloat16):
    """Compressed-R layered min-sum: bit-identical to `_decode_layered_rolls`
    but the check-to-variable messages are stored PER ROW instead of per edge.

    Min-sum row outputs have only two magnitudes — m1 everywhere, m2 at the
    (first) minimum slot — and per-edge signs, so the (B, edges, Zc) R tensor
    (the decode loop's dominant HBM stream; 316 edges for BG1) collapses to
    four (B, rows, Zc) lanes: scaled m1/m2 (msg_dtype), the first-min slot
    (int8), and the edge sign bits packed into one int32 (row degree <= 19).
    BG1: 316 edges x 2 B -> 46 rows x 9 B, ~1.5x less R traffic; R[e] is
    reconstructed exactly at read (sign_e = popcount-parity ^ bit_e, mag_e =
    m2 if e is the stored argmin else m1 — the same f32-computed, msg_dtype-
    rounded values the per-edge store would hold, so the iteration is
    bit-identical).

    MEASURED DEAD END on v5e (kept as a tested opt-in): 0.094 (bf16) /
    0.120 (f32) vs 0.084 ms/slot for the per-edge store at the pipeline
    decode shape — the per-edge reconstruction (bit extract, popcount,
    argmin select as materialized (B, deg, Zc) temporaries) costs more than
    the shrunken R carry saves, i.e. the while body is fusion/compute-
    limited at this point, not R-carry-bandwidth-limited.
    """
    from .graph import get_graph

    g = get_graph(bg, zc)
    plan = get_decode_plan(bg, zc)
    b = llrs.shape[0]
    rows = g.rows
    row_edges = _row_edge_lists(g)

    l0 = llrs.astype(msg_dtype).reshape(b, g.cols, zc)
    big = jnp.float32(1e30)

    def row_minsum(t):
        """_minsum numerics (f32 compute of the msg_dtype inputs, one
        msg_dtype round at the end) + the compressed row state."""
        at = jnp.abs(t).astype(jnp.float32)
        st_neg = t < 0
        st = jnp.where(st_neg, -1.0, 1.0)
        m1 = jnp.min(at, axis=1, keepdims=True)
        is_min = at == m1
        first_min = is_min & (jnp.cumsum(is_min, axis=1) == 1)
        m2 = jnp.min(jnp.where(first_min, big, at), axis=1, keepdims=True)
        mag = jnp.where(first_min, m2, m1)
        sign_all = jnp.prod(st, axis=1, keepdims=True)
        r_new = (scaling * (sign_all * st) * mag).astype(msg_dtype)
        deg = t.shape[1]
        w = jnp.asarray([1 << j for j in range(deg)],
                        jnp.int32)[None, :, None]
        cr_row = ((scaling * m1[:, 0]).astype(msg_dtype),
                  (scaling * m2[:, 0]).astype(msg_dtype),
                  jnp.argmax(first_min, axis=1).astype(jnp.int8),
                  jnp.sum(st_neg.astype(jnp.int32) * w, axis=1))
        return r_new, cr_row

    def reconstruct(cr, r, deg):
        m1s, m2s, am, sb = (c[:, r][:, None, :] for c in cr)
        j = jnp.arange(deg, dtype=jnp.int32)[None, :, None]
        bit = (sb >> j) & 1
        par = jax.lax.population_count(sb) & 1
        mag = jnp.where(j == am.astype(jnp.int32), m2s, m1s)
        return jnp.where((bit ^ par) == 1, -mag, mag)

    def sweep_body(l, cr, first):
        parts = ([], [], [], []) if first else None
        for r in range(rows):
            edges = row_edges[r]
            t = jnp.stack([jnp.roll(l[:, c], -s, axis=-1)
                           for (_, c, s) in edges], axis=1)   # (B, deg, Zc)
            if not first:
                t = t - reconstruct(cr, r, len(edges))
            r_new, cr_row = row_minsum(t)
            v = t + r_new
            for j, (_, c, s) in enumerate(edges):
                l = l.at[:, c].set(jnp.roll(v[:, j], s, axis=-1))
            if first:
                for p, x in zip(parts, cr_row):
                    p.append(x)
            else:
                cr = tuple(c.at[:, r].set(x) for c, x in zip(cr, cr_row))
        if first:
            cr = tuple(jnp.stack(p, axis=1) for p in parts)
        return l, cr

    def sweep(state):
        return sweep_body(state[0], state[1], first=False)

    def parity(state):
        l = state[0]
        viol = None
        for r in range(rows):
            row_par = None
            for (_, c, s) in row_edges[r]:
                bit = jnp.roll(l[:, c], -s, axis=-1) <= 0
                row_par = bit if row_par is None else row_par ^ bit
            if row_par is not None:
                viol = row_par if viol is None else viol | row_par
        return jnp.logical_not(jnp.any(viol, axis=-1))

    state = sweep_body(l0, None, first=True)
    done0 = jnp.all(parity(state)) if early_stop else None
    l, _ = _iterate(sweep, state, num_iters - 1, early_stop, parity, done0)
    l = l.reshape(b, g.cols * zc)
    hard = (l <= 0).astype(jnp.int8)
    ok = check_parity(hard, bg, zc)
    return hard[:, :plan.kb * zc], ok


def _decode_layered_rolls_i8(llrs, bg, zc, num_iters, scaling,
                             early_stop: bool = True):
    """Fixed-point layered min-sum with the reference's int8 semantics.

    The reference decoder runs entirely in saturating int8 lanes
    (ldpc_decoder_avx2.cpp; int8 LLR clamp per ldpc_decoder_impl.cpp) on a
    wire quantized by the demapper to clip(+-20) -> +-120
    (demodulation_mapper_qam16.cpp:36, LLR_MAX=120).  Its exact fixed-point
    semantics (log_likelihood_ratio.h:44, .cpp promotion_sum):
      * finite LLRs live in [-120, 120]; +-127 = LLR_INFTY marks a FIXED bit;
      * load clamps posteriors to +-64 (soft_bits_clamp, decoder_impl.h:193);
      * v2c = soft - c2v saturates at +-120, but an infinite soft stays
        infinite (frozen bits keep broadcasting certainty);
      * the min-sum scaling skips infinities (scale_llr);
      * the posterior update is a PROMOTION sum: |v2c + c2v| > 120 pins the
        bit to +-127 forever — this freezing is what keeps the saturated
        fixed-point iteration stable after convergence.
    Posteriors L and messages R are STORED int8 (4x less HBM traffic than
    f32 on the dominant (B, edges, Zc) R tensor); arithmetic runs widened
    to int32 on the VPU.  scaling 0.8 becomes round(mag * 205 / 256).
    """
    from .graph import get_graph

    g = get_graph(bg, zc)
    plan = get_decode_plan(bg, zc)
    b = llrs.shape[0]
    rows = g.rows
    row_edges = _row_edge_lists(g)

    if llrs.dtype == jnp.int8:
        q = llrs.astype(jnp.int32)
    else:
        # Reference wire quantization (clip +-20 -> +-120).
        from ..modulation import LLR_MAX, RANGE_LIMIT
        q = jnp.clip(jnp.round(llrs.astype(jnp.float32)
                               * (LLR_MAX / RANGE_LIMIT)),
                     -LLR_MAX, LLR_MAX).astype(jnp.int32)
    q = jnp.clip(q, -64, 64)                 # soft_bits_clamp at load

    # avx2_support.h scale_epi8: fixed-point multiply by sf * 2^16, TRUNCATED
    # (mulhi_epu16) — NOT rounded like the generic impl's scale_llr.  The
    # truncation matters: floor(0.8 * m) kills magnitude-1 messages and
    # shaves ~0.4 off every message on average — an implicit offset-min-sum
    # that measures ~0.3-0.5 dB BETTER than the rounded form at the QPSK
    # r0.30 waterfall (reference avx2 BLER 0.031 vs generic 0.375 at the
    # same 6 iterations, identical inputs).  We follow the reference's
    # PRODUCTION (avx2) semantics.
    scale16 = int(scaling * 65536)
    maxv = jnp.int32(120)                    # LLR_MAX
    inf = jnp.int32(127)                     # LLR_INFTY (fixed bit)
    # Storage dtype int32, not int8: XLA:CPU's narrow-int vectorized
    # roll/select path MISCOMPILES at some batch shapes (observed:
    # identical inputs decode differently at B=4 vs B=1 — bits flipped
    # only in some batch rows; int16 reduces but does not eliminate it).
    # Values stay in int8 range; this schedule is the reference-parity
    # oracle, not the production path (layered_rolls_wire keeps the bf16
    # storage win with the same reference-exact arithmetic).
    l0 = q.reshape(b, g.cols, zc).astype(jnp.int32)
    r0 = jnp.zeros((b, g.num_edges, zc), jnp.int32)

    def sweep(state):
        l, r_msgs = state
        for r in range(rows):
            edges = row_edges[r]
            le = jnp.stack(
                [jnp.roll(l[:, c], -s, axis=-1) for (_, c, s) in edges],
                axis=1).astype(jnp.int32)                    # (B, deg, Zc)
            re_old = jnp.stack([r_msgs[:, eid] for (eid, _, _) in edges],
                               axis=1).astype(jnp.int32)
            l_inf = jnp.abs(le) >= inf
            t = jnp.clip(le - re_old, -maxv, maxv)
            t = jnp.where(l_inf, le, t)                      # inf propagates
            at = jnp.minimum(jnp.abs(t), maxv)   # min trackers init at 120
            m1 = jnp.min(at, axis=1, keepdims=True)
            is_min = at == m1
            first_min = is_min & (jnp.cumsum(is_min, axis=1) == 1)
            m2 = jnp.min(jnp.where(first_min, inf, at), axis=1, keepdims=True)
            mag = jnp.where(first_min, m2, m1)
            mag = jnp.where(mag >= inf, inf,
                            (mag * scale16) >> 16)    # scale_epi8 (floor)
            neg = t < 0
            sign_all = (jnp.sum(neg, axis=1, keepdims=True) & 1) == 1
            r_new = jnp.where(sign_all ^ neg, -mag, mag)
            # promotion_sum: beyond +-120 the bit freezes at +-127; an
            # already-fixed v2c stays fixed regardless of the message.
            v = t + r_new
            t_p, t_n = t > maxv, t < -maxv
            r_p, r_n = r_new > maxv, r_new < -maxv
            v = jnp.where(v > maxv, inf, jnp.where(v < -maxv, -inf, v))
            v = jnp.where((t_p & ~r_n) | (r_p & ~t_n), inf, v)
            v = jnp.where((t_n & ~r_p) | (r_n & ~t_p), -inf, v)
            for j, (eid, c, s) in enumerate(edges):
                l = l.at[:, c].set(
                    jnp.roll(v[:, j].astype(jnp.int32), s, axis=-1))
                r_msgs = r_msgs.at[:, eid].set(
                    r_new[:, j].astype(jnp.int32))
        return l, r_msgs

    def parity(state):
        l = state[0]
        viol = None
        for r in range(rows):
            row_par = None
            for (_, c, s) in row_edges[r]:
                bit = jnp.roll(l[:, c], -s, axis=-1) <= 0
                row_par = bit if row_par is None else row_par ^ bit
            if row_par is not None:
                viol = row_par if viol is None else viol | row_par
        return jnp.logical_not(jnp.any(viol, axis=-1))

    l, _ = _iterate(sweep, (l0, r0), num_iters, early_stop, parity)
    l = l.reshape(b, g.cols * zc)
    hard = (l <= 0).astype(jnp.int8)
    ok = check_parity(hard, bg, zc)
    return hard[:, :plan.kb * zc], ok


def check_parity(hard_bits: jnp.ndarray, bg: int, zc: int) -> jnp.ndarray:
    """Syndrome check on device: all checks satisfied per codeword (B,)->bool.

    Uses the decode plan's gather indices: row sums of the hard bits over each
    check row must be even.
    """
    plan = get_decode_plan(bg, zc)
    b = hard_bits.shape[0]
    ext = jnp.concatenate([hard_bits.astype(jnp.float32),
                           jnp.zeros((b, 1), jnp.float32)], axis=-1)
    gathered = ext[:, jnp.asarray(plan.gather_idx.reshape(-1))]
    gathered = gathered.reshape(b, plan.rows, plan.max_deg, plan.zc)
    sums = jnp.sum(jnp.where(jnp.asarray(plan.mask[None, :, :, None]),
                             gathered, 0.0), axis=2)
    return jnp.all(jnp.mod(sums, 2.0) < 0.5, axis=(1, 2))
