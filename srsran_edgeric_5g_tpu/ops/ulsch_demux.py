"""UL-SCH multiplexing/demultiplexing: UCI piggybacked on PUSCH.

Counterpart of the reference's ulsch_demultiplex_impl.cpp (TS 38.212 §6.2.7):
coded HARQ-ACK (and CSI part 1) bits occupy reserved REs inside the PUSCH
allocation; the receive side splits the equalized LLR stream into SCH and
UCI branches.

Placement model (the spec's structure, simplified to the single-hop,
type-1-DMRS, no-CSI2 configurations this framework schedules):
  * HARQ-ACK REs start at the first data symbol AFTER the first DM-RS symbol
    and spread over each symbol's REs with even stride until G_ack bits are
    placed (puncturing the SCH bits there — the <=2-bit ACK behaviour,
    generalised).
  * CSI part 1 starts at the first data symbol and spreads the same way over
    positions not taken by ACK.

Everything is a precomputed static index plan -> TX multiplex is one
scatter, RX demultiplex is two gathers + an erasure mask for the SCH
decoder's punctured positions.
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
    sch_erased: np.ndarray       # bool (G,) True where SCH bits were punctured
    key: tuple

    def __hash__(self):
        return hash(self.key)


@functools.lru_cache(maxsize=None)
def get_demux_plan(g_total: int, qm: int, re_per_symbol: int,
                   data_symbols: tuple[int, ...],
                   first_dmrs_symbol: int,
                   g_ack: int = 0, g_csi1: int = 0) -> UlschDemuxPlan:
    """Build the reserved-position plan.

    ``re_per_symbol``: data REs per symbol in the allocation; the G stream is
    frequency-first within each symbol (matching the PUSCH mapper).
    """
    assert g_total == qm * re_per_symbol * len(data_symbols)
    assert g_ack % qm == 0 and g_csi1 % qm == 0, "UCI lengths align to Qm"

    # RE index of (symbol position s, re r) in the stream.
    def re_bits(s, r):
        return (s * re_per_symbol + r) * qm

    taken = np.zeros((len(data_symbols), re_per_symbol), dtype=bool)

    def place(n_bits, start_symbol_positions):
        """Place n_bits/qm REs spread evenly from the given symbol order."""
        pos = []
        need = n_bits // qm
        for s in start_symbol_positions:
            if need <= 0:
                break
            free = np.nonzero(~taken[s])[0]
            if len(free) == 0:
                continue
            take = min(need, len(free))
            # Even spread across the free REs of this symbol (§6.2.7's d
            # spacing): pick `take` indices at uniform stride.
            sel = free[np.linspace(0, len(free) - 1, take).round().astype(int)]
            sel = np.unique(sel)[:take]
            taken[s, sel] = True
            pos.extend(re_bits(s, r) for r in sel)
            need -= len(sel)
        assert need == 0, "allocation cannot hold the UCI payload"
        bits = np.asarray(sorted(pos), dtype=np.int64)
        return (bits[:, None] + np.arange(qm)[None]).reshape(-1)

    # ACK: first data symbol at/after the first DM-RS symbol + 1.
    ack_order = [i for i, l in enumerate(data_symbols) if l > first_dmrs_symbol]
    ack_order += [i for i in range(len(data_symbols)) if i not in ack_order]
    ack_pos = place(g_ack, ack_order) if g_ack else np.empty(0, np.int64)
    csi_pos = place(g_csi1, range(len(data_symbols))) if g_csi1 \
        else np.empty(0, np.int64)

    erased = np.zeros(g_total, dtype=bool)
    erased[ack_pos] = True
    erased[csi_pos] = True
    return UlschDemuxPlan(g_total=g_total, qm=qm,
                          ack_positions=ack_pos, csi1_positions=csi_pos,
                          sch_erased=erased,
                          key=(g_total, qm, re_per_symbol, data_symbols,
                               first_dmrs_symbol, g_ack, g_csi1))


def multiplex(sch_bits: jnp.ndarray, plan: UlschDemuxPlan,
              ack_bits: jnp.ndarray | None = None,
              csi1_bits: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, G) SCH bits with UCI bits written over the reserved positions."""
    out = sch_bits
    if ack_bits is not None and len(plan.ack_positions):
        out = out.at[:, jnp.asarray(plan.ack_positions)].set(
            ack_bits.astype(out.dtype))
    if csi1_bits is not None and len(plan.csi1_positions):
        out = out.at[:, jnp.asarray(plan.csi1_positions)].set(
            csi1_bits.astype(out.dtype))
    return out


def demultiplex(llrs: jnp.ndarray, plan: UlschDemuxPlan
                ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, G) LLRs -> (sch_llrs with erasures zeroed, ack_llrs, csi1_llrs).

    Punctured SCH positions become LLR 0 (erasures) for the LDPC decoder.
    """
    ack = llrs[:, jnp.asarray(plan.ack_positions)] if len(plan.ack_positions) \
        else llrs[:, :0]
    csi = llrs[:, jnp.asarray(plan.csi1_positions)] if len(plan.csi1_positions) \
        else llrs[:, :0]
    sch = jnp.where(jnp.asarray(plan.sch_erased)[None, :], 0.0,
                    llrs.astype(jnp.float32))
    return sch, ack, csi
