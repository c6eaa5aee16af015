"""UL-SCH multiplexing/demultiplexing: UCI piggybacked on PUSCH.

Counterpart of the reference's ulsch_demultiplex_impl.cpp (TS 38.212 §6.2.7):
coded HARQ-ACK (and CSI part 1) bits occupy REs inside the PUSCH allocation;
the receive side splits the equalized LLR stream into SCH and UCI branches.

Exact reference placement (cross-validated position-for-position against
ulsch_demultiplex_impl in test_reference_parity.py::test_ulsch_demux_parity):

  * HARQ-ACK REs: walking data symbols from l1 (the first symbol after the
    first DM-RS symbol), each symbol takes take = min(M, remaining) REs at
    stride d = floor(M / take): RE indices j*d.
  * CSI part 1: same walk from l1_csi (the first data symbol), over the
    symbol's REs EXCLUDING the ACK REs AND the reserved REs; positions
    avail[j*d] with d = floor(len(avail) / take).
  * CSI part 2: same walk from l1_csi over the symbol's REs excluding ACK
    and CSI part 1 — but NOT excluding reserved REs (the reference's
    configure_csi_part2_current_ofdm_symbol selects from the post-step-2/3
    uci_re_set, which still contains the reserved set,
    ulsch_demultiplex_impl.cpp:450-473).
  * O_ack > 2 (or no reserved REs): the SCH stream SKIPS the UCI REs —
    the UL-SCH is rate-matched to G_sch = G - G_ack - G_csi1 - G_csi2.
  * O_ack <= 2 with reserved REs: G_rvd reserved REs are placed like ACK
    REs; the SCH maps through ALL non-CSI positions and the ACK punctures
    the subset reserved[j*floor(n_rvd/n_ack)], which the receiver zeroes
    (erasures) in whichever stream holds each punctured position (SCH, or
    CSI part 2 when it landed on a reserved RE).

Everything is a precomputed static index plan -> TX multiplex is static
scatters, RX demultiplex is static gathers (+ erasure zeroing in the
reserved mode).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UlschDemuxPlan:
    g_total: int
    qm: int
    ack_positions: np.ndarray    # (G_ack,) bit positions in the G stream
    csi1_positions: np.ndarray   # (G_csi1,)
    csi2_positions: np.ndarray   # (G_csi2,)
    csi2_erased: np.ndarray      # bool (G_csi2,) True where ACK punctured
    sch_positions: np.ndarray    # (G_sch,) stream positions carrying SCH
    sch_erased: np.ndarray       # bool (G_sch,) True where ACK punctured
    key: tuple

    @property
    def sch_len(self) -> int:
        return len(self.sch_positions)

    def __hash__(self):
        return hash(self.key)


def _place_res(data_symbols: tuple[int, ...], m: int, first_symbol: int,
               n_re: int, excluded: set[int]) -> list[int]:
    """§6.2.7 per-symbol distribution -> stream RE indices (ascending)."""
    out = []
    need = n_re
    for s, l in enumerate(data_symbols):
        if l < first_symbol or need <= 0:
            continue
        avail = [r for r in range(m) if s * m + r not in excluded]
        if not avail:
            continue
        take = min(len(avail), need)
        d = len(avail) // take
        out.extend(s * m + avail[j * d] for j in range(take))
        need -= take
    assert need == 0, "allocation cannot hold the UCI payload"
    return out


@functools.lru_cache(maxsize=None)
def get_demux_plan(g_total: int, qm: int, re_per_symbol: int,
                   data_symbols: tuple[int, ...],
                   first_dmrs_symbol: int,
                   g_ack: int = 0, g_csi1: int = 0,
                   g_ack_rvd: int = 0, o_ack: int = 3,
                   g_csi2: int = 0) -> UlschDemuxPlan:
    """Build the §6.2.7 placement plan.

    ``re_per_symbol``: data REs per symbol in the allocation; the G stream is
    frequency-first within each symbol (matching the PUSCH mapper).
    ``o_ack``: HARQ-ACK payload bit count — <= 2 with ``g_ack_rvd`` > 0
    selects the reserved/puncture mode.
    """
    m = re_per_symbol
    assert g_total == qm * m * len(data_symbols)
    assert (g_ack % qm == 0 and g_csi1 % qm == 0 and g_ack_rvd % qm == 0
            and g_csi2 % qm == 0)

    def bits(res):
        r = np.asarray(sorted(res), dtype=np.int64)
        return (r[:, None] * qm + np.arange(qm)[None]).reshape(-1)

    # l1: first data symbol after the first DM-RS symbol.
    l1 = next(l for l in data_symbols if l > first_dmrs_symbol)
    l1_csi = data_symbols[0]

    reserved_mode = (o_ack <= 2) and g_ack_rvd > 0
    if reserved_mode:
        rvd_res = _place_res(data_symbols, m, l1, g_ack_rvd // qm, set())
        n_ack_re = g_ack // qm
        if n_ack_re:
            d = len(rvd_res) // n_ack_re
            ack_res = [sorted(rvd_res)[j * d] for j in range(n_ack_re)]
        else:
            ack_res = []
        # CSI part 1 avoids the reserved REs; CSI part 2 does NOT (it only
        # avoids REs already removed from the UCI set: DM-RS and CSI1).
        csi_res = _place_res(data_symbols, m, l1_csi, g_csi1 // qm,
                             set(rvd_res)) if g_csi1 else []
        csi2_res = _place_res(data_symbols, m, l1_csi, g_csi2 // qm,
                              set(csi_res)) if g_csi2 else []
        ack_pos = bits(ack_res)
        csi_pos = bits(csi_res)
        csi2_pos = bits(csi2_res)
        # SCH maps through everything except CSI1/CSI2; the step-5 ACK
        # punctures (erases) whichever stream holds each reserved position.
        keep = np.ones(g_total, dtype=bool)
        if len(csi_pos):
            keep[csi_pos] = False
        if len(csi2_pos):
            keep[csi2_pos] = False
        sch_positions = np.flatnonzero(keep).astype(np.int64)
        erased = np.zeros(g_total, dtype=bool)
        erased[ack_pos] = True
        sch_erased = erased[sch_positions]
        csi2_erased = erased[csi2_pos] if len(csi2_pos) \
            else np.zeros(0, dtype=bool)
    else:
        ack_res = _place_res(data_symbols, m, l1, g_ack // qm, set()) \
            if g_ack else []
        csi_res = _place_res(data_symbols, m, l1_csi, g_csi1 // qm,
                             set(ack_res)) if g_csi1 else []
        csi2_res = _place_res(data_symbols, m, l1_csi, g_csi2 // qm,
                              set(ack_res) | set(csi_res)) if g_csi2 else []
        ack_pos = bits(ack_res)
        csi_pos = bits(csi_res)
        csi2_pos = bits(csi2_res)
        keep = np.ones(g_total, dtype=bool)
        for pos in (ack_pos, csi_pos, csi2_pos):
            if len(pos):
                keep[pos] = False
        sch_positions = np.flatnonzero(keep).astype(np.int64)
        sch_erased = np.zeros(len(sch_positions), dtype=bool)
        csi2_erased = np.zeros(len(csi2_pos), dtype=bool)

    return UlschDemuxPlan(g_total=g_total, qm=qm,
                          ack_positions=ack_pos, csi1_positions=csi_pos,
                          csi2_positions=csi2_pos, csi2_erased=csi2_erased,
                          sch_positions=sch_positions, sch_erased=sch_erased,
                          key=(g_total, qm, re_per_symbol, data_symbols,
                               first_dmrs_symbol, g_ack, g_csi1, g_ack_rvd,
                               o_ack, g_csi2))


def multiplex(sch_bits: jnp.ndarray, plan: UlschDemuxPlan,
              ack_bits: jnp.ndarray | None = None,
              csi1_bits: jnp.ndarray | None = None,
              csi2_bits: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, G_sch) SCH bits + UCI bits -> the (B, G) transmitted stream.

    In the skip mode G_sch = G - G_uci and the SCH scatters around the UCI;
    in the reserved mode G_sch covers the reserved REs too and the ACK
    overwrites (punctures) its subset afterwards.
    """
    b = sch_bits.shape[0]
    out = jnp.zeros((b, plan.g_total), sch_bits.dtype)
    out = out.at[:, jnp.asarray(plan.sch_positions)].set(sch_bits)
    if csi1_bits is not None and len(plan.csi1_positions):
        out = out.at[:, jnp.asarray(plan.csi1_positions)].set(
            csi1_bits.astype(out.dtype))
    if csi2_bits is not None and len(plan.csi2_positions):
        out = out.at[:, jnp.asarray(plan.csi2_positions)].set(
            csi2_bits.astype(out.dtype))
    # ACK last: in the reserved mode it punctures SCH/CSI2 positions.
    if ack_bits is not None and len(plan.ack_positions):
        out = out.at[:, jnp.asarray(plan.ack_positions)].set(
            ack_bits.astype(out.dtype))
    return out


def demultiplex(llrs: jnp.ndarray, plan: UlschDemuxPlan
                ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                           jnp.ndarray]:
    """(B, G) LLRs -> ((B, G_sch) sch_llrs, ack_llrs, csi1_llrs, csi2_llrs).

    Reserved-mode ACK-punctured SCH/CSI2 positions become LLR 0 (erasures).
    """
    ack = llrs[:, jnp.asarray(plan.ack_positions)] if len(plan.ack_positions) \
        else llrs[:, :0]
    csi = llrs[:, jnp.asarray(plan.csi1_positions)] if len(plan.csi1_positions) \
        else llrs[:, :0]
    csi2 = llrs[:, jnp.asarray(plan.csi2_positions)] \
        if len(plan.csi2_positions) else llrs[:, :0]
    if plan.csi2_erased.any():
        csi2 = jnp.where(jnp.asarray(plan.csi2_erased)[None, :], 0.0,
                         csi2.astype(jnp.float32))
    sch = llrs[:, jnp.asarray(plan.sch_positions)].astype(jnp.float32)
    if plan.sch_erased.any():
        sch = jnp.where(jnp.asarray(plan.sch_erased)[None, :], 0.0, sch)
    return sch, ack, csi, csi2
