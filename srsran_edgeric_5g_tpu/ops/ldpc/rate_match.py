"""LDPC rate matching / dematching (TS 38.212 §5.4.2).

Counterpart of the reference's ldpc_rate_matcher_impl.cpp (k0 table :60-91,
filler-skipping bit selection :102-148, Qm interleaver :149-290) and
ldpc_rate_dematcher_*.cpp (LLR deinterleave + soft-combine accumulate).

TPU design: for each static configuration (BG, Zc, E, rv, Qm, filler span,
N_cb) the whole select-skip-wrap-interleave composition collapses into ONE
precomputed index vector, so rate matching is a single gather and rate
dematching is a single segment-sum (scatter-add) of LLRs into the circular
buffer — soft combining across retransmissions comes free from the add.
(An inverse-gather-per-wrap dematch exists behind ``use_gather`` — see the
layout note at the call site for why the scatter stays default.)

Alternative formulation (``use_runs=True``): the Qm-wise interleaver is a
pure (rows, Qm) transpose, and the filler-skipping circular bit selection is
PIECEWISE CONTIGUOUS — it breaks only at the filler span and at buffer
wraps — so the plan also carries the few (src, dst, len) runs, letting both
directions run as static slices + one transpose with no gather/scatter at
all.  Measured on v5e this LOSES to the fused gather in the jitted pipeline
(see `_MAX_RUNS` note), so it stays default-off: an equivalence-tested
record of the experiment and an option for backends where gathers are slow.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from .graph import get_graph

# k0 numerators per TS 38.212 Table 5.4.2.1-2 (k0 = Zc*floor(num*Ncb/(den*Zc))).
_K0_FRAC = {1: {0: 0, 1: 17, 2: 33, 3: 56}, 2: {0: 0, 1: 13, 2: 25, 3: 43}}
_K0_DEN = {1: 66, 2: 50}

FILLER_LLR = 127.0  # effectively-infinite positive LLR for known-zero fillers


def k0_offset(bg: int, rv: int, n_cb: int, zc: int) -> int:
    return zc * ((_K0_FRAC[bg][rv] * n_cb) // (_K0_DEN[bg] * zc))


def lbrm_n_cb(bg: int, zc: int, nof_cb: int, tbs_lbrm: int) -> int:
    """Limited-buffer rate matching buffer size (TS 38.212 §5.4.2.1).

    N_cb = min(N, N_ref) with N_ref = floor(TBS_LBRM / (C * 2/3)); the
    reference derives TBS_LBRM from the max supported TB size
    (lib/ran/sch/sch_segmentation / pdsch defaults).
    """
    from .graph import get_graph

    n = get_graph(bg, zc).n
    n_ref = (3 * tbs_lbrm) // (2 * nof_cb)
    return min(n, n_ref)


@dataclasses.dataclass(frozen=True)
class RateMatchPlan:
    bg: int
    zc: int
    e: int                    # rate-matched output length
    rv: int
    qm: int
    k_prime: int              # message bits incl. CRC, excl. fillers
    n_cb: int
    select_idx: np.ndarray    # (E,) indices into the N_cb circular buffer
    runs: tuple               # ((src, dst, len), ...) contiguous spans of
                              # select_idx in pre-interleave (e-domain) order
    inv_idx: np.ndarray       # (n_wraps, N_cb) int32: for each buffer
                              # position, the k-th output index selecting it
                              # (sentinel E -> a zero pad slot).  Lets the
                              # dematch run as n_wraps GATHERS instead of one
                              # scatter-add — scatters are the slow path on
                              # TPU (5.3% of the pipeline step in the xplane
                              # profile; usually n_wraps == 1).
    key: tuple

    def __hash__(self):
        return hash(self.key)


@functools.lru_cache(maxsize=None)
def get_rate_match_plan(bg: int, zc: int, e: int, rv: int, qm: int,
                        k_prime: int, n_cb: int | None = None) -> RateMatchPlan:
    """Build the fused selection+interleave index vector.

    The circular buffer holds N_cb = N = (cols-2)*Zc bits (LBRM would shorten
    it); positions [k_prime - 2*Zc, K - 2*Zc) are filler bits, skipped by
    selection.  The output interleaver writes e_k column-major into an
    (E/Qm, Qm) array read row-major (TS 38.212 §5.4.2.2).
    """
    g = get_graph(bg, zc)
    n = g.n
    n_cb = n if n_cb is None else n_cb
    assert e % qm == 0, (e, qm)
    f_begin = k_prime - 2 * zc           # filler span start in the buffer
    f_end = g.k - 2 * zc                 # filler span end

    k0 = k0_offset(bg, rv, n_cb, zc)
    sel = np.empty(e, dtype=np.int32)
    k, j = 0, 0
    while k < e:
        idx = (k0 + j) % n_cb
        if not (f_begin <= idx < f_end):
            sel[k] = idx
            k += 1
        j += 1
    # Interleave: f(i + j*Qm) = e(i*(E/Qm) + j)  =>  gather order below.
    rows = e // qm
    i, jj = np.meshgrid(np.arange(qm), np.arange(rows), indexing="ij")
    order = (i * rows + jj).T.reshape(-1)   # output position p -> e index
    fused = sel[order]
    # Contiguous runs of the pre-interleave selection: (src, dst, len).
    breaks = np.flatnonzero(np.diff(sel) != 1) + 1
    starts = np.concatenate([[0], breaks, [e]])
    runs = tuple((int(s), int(sel[s]), int(t - s))
                 for s, t in zip(starts[:-1], starts[1:]))
    # Inverse map for the gather-formulated dematch: occurrence k of buffer
    # position p -> output index (sentinel e for "no k-th contribution").
    count = np.zeros(n_cb, dtype=np.int64)
    np.add.at(count, fused, 1)
    n_wraps = max(1, int(count.max()))
    inv = np.full((n_wraps, n_cb), e, dtype=np.int32)
    occ = np.zeros(n_cb, dtype=np.int64)
    for p_out, bufpos in enumerate(fused):
        inv[occ[bufpos], bufpos] = p_out
        occ[bufpos] += 1
    return RateMatchPlan(bg=bg, zc=zc, e=e, rv=rv, qm=qm, k_prime=k_prime,
                         n_cb=n_cb, select_idx=fused, runs=runs, inv_idx=inv,
                         key=(bg, zc, e, rv, qm, k_prime, n_cb))


# The slice+transpose formulation exists as a tested ALTERNATIVE, default
# OFF: measured in the full pipeline on v5e it REGRESSES the slot time 0.077
# -> 0.102 ms (the last-minor-dim transpose of the Qm deinterleave and the
# serialized run-slice adds both cost more than the single fused gather /
# scatter-add with a trace-time-constant index vector, which XLA fuses into
# the surrounding blob).  Keep use_runs=False on hot paths.
_MAX_RUNS = 8


def rate_match(full_codeword: jnp.ndarray, plan: RateMatchPlan,
               use_runs: bool = False) -> jnp.ndarray:
    """(B, cols*Zc) encoder output -> (B, E) transmitted bits.

    Drops the first 2*Zc systematic bits (puncture) then applies the fused
    selection/interleave gather (or, with ``use_runs``, static slices + one
    transpose — see the note above `_MAX_RUNS`).
    """
    buf = full_codeword[:, 2 * plan.zc: 2 * plan.zc + plan.n_cb]
    if not use_runs or len(plan.runs) > _MAX_RUNS:
        return buf[:, jnp.asarray(plan.select_idx)]
    b = buf.shape[0]
    rows = plan.e // plan.qm
    e_sel = jnp.concatenate([buf[:, d:d + ln] for (_, d, ln) in plan.runs],
                            axis=-1)
    return e_sel.reshape(b, plan.qm, rows).transpose(0, 2, 1).reshape(b, plan.e)


def rate_dematch(llrs: jnp.ndarray, plan: RateMatchPlan,
                 soft_buffer: jnp.ndarray | None = None,
                 use_runs: bool = False,
                 use_gather: bool = False,
                 dtype=jnp.float32,
                 saturate: bool = False) -> jnp.ndarray:
    """(B, E) LLRs -> (B, cols*Zc) decoder input, soft-combining into
    ``soft_buffer`` (HARQ) when given.

    Repeated buffer positions accumulate (matching the reference's
    accumulate-on-wrap), punctured systematic positions stay 0, fillers get
    +FILLER_LLR (known zero).

    ``dtype``/``saturate``: the int8-wire-domain pipeline path runs the
    combine in bf16 (every value is an integer; |llr| <= 120, |soft| <= 127,
    so sums <= 247 are bf16-exact) and clips the combined buffer to ±127 —
    the reference's SATURATED LLR sum (log_likelihood_ratio.h:98-109, used
    by ldpc_rate_dematcher_impl::combine_softbits) — which also makes the
    (B, cols*Zc) decoder input and the HARQ carry half/quarter the HBM
    bytes of the f32 form.
    """
    g = get_graph(plan.bg, plan.zc)
    b = llrs.shape[0]
    zc = plan.zc
    buf = jnp.zeros((b, plan.n_cb), dtype) if soft_buffer is None \
        else soft_buffer.astype(dtype)
    if use_runs and len(plan.runs) <= _MAX_RUNS:
        # Deinterleave = one transpose; un-select = static slice adds (the
        # accumulate across wrap runs is the reference's soft combine on
        # repeated positions).
        rows = plan.e // plan.qm
        deint = llrs.astype(dtype).reshape(b, rows, plan.qm) \
            .transpose(0, 2, 1).reshape(b, plan.e)
        for (s, d, ln) in plan.runs:
            buf = buf.at[:, d:d + ln].add(deint[:, s:s + ln])
    elif use_gather:
        # Gather formulation of the scatter-add: per wrap layer, gather each
        # buffer position's contribution (sentinel -> appended zero slot) and
        # add.  Usually one wrap; repetition (E > N_cb) adds layers.
        # Default OFF on the pipeline path: the gather demands a row-major
        # (B, E) operand, and in the fused UL program that forces a full
        # transpose copy of the demapper output (29% of device time on v5e;
        # the scatter tolerates the demapper's native layout).
        ext = jnp.concatenate(
            [llrs.astype(dtype), jnp.zeros((b, 1), dtype)],
            axis=-1)
        for k in range(plan.inv_idx.shape[0]):
            buf = buf + ext[:, jnp.asarray(plan.inv_idx[k])]
    else:
        # No wraps (E <= N_cb) => the selection is injective: tell XLA so
        # (unique_indices skips collision handling), and with no HARQ
        # buffer to combine into the add degenerates to a SET into the
        # zero-initialized buffer (no read-modify-write).
        uniq = plan.inv_idx.shape[0] == 1
        idx = jnp.asarray(plan.select_idx)
        if uniq and soft_buffer is None:
            buf = buf.at[:, idx].set(llrs.astype(dtype),
                                     unique_indices=True,
                                     mode="promise_in_bounds")
        else:
            buf = buf.at[:, idx].add(llrs.astype(dtype),
                                     unique_indices=uniq,
                                     mode="promise_in_bounds")

    if saturate:
        # Reference saturated LLR sum: one clip per combine event (each
        # slot-batch step combines ONE new transmission into the buffer,
        # the same granularity as the reference's per-retx combine).
        buf = jnp.clip(buf, -FILLER_LLR, FILLER_LLR)
    f_begin = plan.k_prime - 2 * zc
    f_end = g.k - 2 * zc
    pos = np.arange(plan.n_cb)
    filler = jnp.asarray((pos >= f_begin) & (pos < f_end))
    buf = jnp.where(filler, FILLER_LLR, buf)

    return jnp.concatenate(
        [jnp.zeros((b, 2 * zc), dtype), buf,
         jnp.zeros((b, g.n_full - 2 * zc - plan.n_cb), dtype)], axis=-1)
