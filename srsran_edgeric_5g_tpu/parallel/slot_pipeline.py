"""Full-cell slot pipeline: multi-UE DL encode + UL decode, mesh-sharded.

The TPU-native equivalent of the reference's per-slot hot loops (SURVEY.md
§3.2/§3.3): one jitted program per direction processes a whole slot for all
UEs of a cell.  UE allocations are uniform-width (the scheduler's PRB split
for the 4-UE zmq scenario), so every per-UE stage is vmappable; per-UE PRB
offsets, RNTIs and DM-RS sequences are runtime tensors.

Sharding (jax.sharding + with_sharding_constraint, XLA SPMD inserts the
collectives):
  * UE batch axis             -> P('ue')
  * codeblock batch (U*C, .)  -> P(('ue','cb'))  (flattened over both axes)
  * resource grid / samples   -> replicated (psum of per-UE contributions)

The DL direction is: segment -> LDPC encode -> rate match -> scramble ->
modulate -> place subgrids -> sum -> OFDM modulate.  The UL inverse:
OFDM demod -> DM-RS estimate -> MMSE equalize -> demap -> descramble ->
rate dematch -> LDPC decode -> TB CRC.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.pdsch import scrambling_c_init
from ..ops import channel_est, dmrs as dmrs_mod, equalizer, modulation, ofdm, sequences
from ..ops.ldpc import decoder, encoder, rate_match, segmenter
from ..ran.numerology import N_SC_PER_PRB, SlotTiming, slot_timing
from .mesh import CB_AXIS, UE_AXIS


@dataclasses.dataclass(frozen=True)
class CellConfig:
    """Uniform multi-UE cell configuration for one slot."""

    nof_prb: int                  # cell bandwidth
    nfft: int
    nof_ue: int
    prb_per_ue: int               # uniform allocation width
    modulation: str = "qam16"
    target_rate: float = 0.5
    first_symbol: int = 2
    nof_symbols: int = 12
    dmrs_symbols: tuple[int, ...] = (2, 11)
    n_id: int = 1
    slot: int = 0
    mu: int = 0

    @property
    def timing(self) -> SlotTiming:
        return slot_timing(nof_prb=self.nof_prb, nfft=self.nfft, mu=self.mu)

    @property
    def data_symbols(self) -> tuple[int, ...]:
        return tuple(s for s in range(self.first_symbol,
                                      self.first_symbol + self.nof_symbols)
                     if s not in self.dmrs_symbols)

    @property
    def qm(self) -> int:
        return modulation.QM[self.modulation]

    @property
    def ue_width_sc(self) -> int:
        return self.prb_per_ue * N_SC_PER_PRB

    @property
    def g_total(self) -> int:
        return len(self.data_symbols) * self.ue_width_sc * self.qm

    def derived_tbs(self) -> int:
        from ..ran.tbs import tbs as tbs_calc, nof_re
        nre = nof_re(self.prb_per_ue, self.nof_symbols,
                     12 * len(self.dmrs_symbols))
        return tbs_calc(nre, self.target_rate, self.qm)


@functools.lru_cache(maxsize=None)
def _plans(cell: CellConfig, rv: int = 0):
    tbs = cell.derived_tbs()
    bg = segmenter.select_base_graph(tbs, cell.target_rate)
    seg = segmenter.get_segment_plan(tbs, bg, cell.g_total, cell.qm)
    assert len(set(seg.e)) == 1, "uniform-E configs only in the cell pipeline"
    rm = rate_match.get_rate_match_plan(seg.bg, seg.zc, seg.e[0], rv, cell.qm,
                                        seg.k_prime)
    return seg, rm


def _dmrs_full_band(cell: CellConfig) -> jnp.ndarray:
    """(ndmrs, npilots_fullband) pilot sequences shared by all UEs."""
    rows = []
    for l in cell.dmrs_symbols:
        ci = jnp.asarray([dmrs_mod.dmrs_c_init(cell.slot, l, cell.n_id)],
                         dtype=jnp.uint32)
        rows.append(dmrs_mod.dmrs_sequence(ci, 6 * cell.nof_prb)[0])
    return jnp.stack(rows)


def shard(x, mesh, spec):
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def dl_slot(payloads: jnp.ndarray, start_sc: jnp.ndarray,
            rntis: jnp.ndarray, cell: CellConfig, rv: int = 0,
            mesh=None) -> jnp.ndarray:
    """DL direction: (U, TBS) payloads -> (total,) baseband samples.

    ``start_sc``: (U,) int32 first subcarrier of each UE's allocation.
    """
    seg, rm = _plans(cell, rv)
    t = cell.timing
    u = cell.nof_ue
    w = cell.ue_width_sc

    payloads = shard(payloads, mesh, (UE_AXIS,))

    # --- coding: all UEs' codeblocks as one batch over ('ue','cb') ---
    cbs = segmenter.segment_tb(payloads, seg)              # (U*C, K)
    cbs = shard(cbs, mesh, ((UE_AXIS, CB_AXIS),))
    cw = encoder.encode(cbs, seg.bg, seg.zc)               # (U*C, colsZc)
    bits = rate_match.rate_match(cw, rm)                   # (U*C, E)
    bits = bits.reshape(u, -1)                             # (U, G)
    bits = shard(bits, mesh, (UE_AXIS,))

    ci = (rntis.astype(jnp.uint32) << 15) + jnp.uint32(cell.n_id)
    bits = sequences.scramble_bits(bits, ci)
    syms = modulation.modulate(bits, cell.modulation)      # (U, G/Qm)
    data = syms.reshape(u, len(cell.data_symbols), w)

    pilots = _dmrs_full_band(cell)                         # (ndmrs, 6*nof_prb)

    # --- per-UE grid contribution, summed over UEs ---
    pat = dmrs_mod.dmrs_pattern(1, cell.prb_per_ue, port=0)
    data_sym_idx = np.asarray(cell.data_symbols, dtype=np.int32)
    pilot_rel = jnp.asarray(pat.subcarriers)

    def place(data_u, s0):
        g = jnp.zeros((t.nsymb, t.nof_subc), jnp.complex64)
        g = jax.lax.dynamic_update_slice(
            g, jnp.zeros((t.nsymb, w), jnp.complex64).at[jnp.asarray(data_sym_idx)]
            .set(data_u.astype(jnp.complex64)), (0, s0))
        # DM-RS: slice the full-band sequence at this UE's pilot offset.
        for i, l in enumerate(cell.dmrs_symbols):
            pil = jax.lax.dynamic_slice(pilots[i], (s0 // 2,), (len(pat.subcarriers),))
            row = jnp.zeros((t.nof_subc,), jnp.complex64)
            row = row.at[pilot_rel].set(pil)
            row = jnp.roll(row, s0)  # shift relative positions to absolute
            g = g.at[l].add(row)
        return g

    grids = jax.vmap(place)(data, start_sc)               # (U, nsymb, nsubc)
    grid = jnp.sum(grids, axis=0)                          # psum over 'ue'
    return ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)


def dl_slot_batch(payloads: jnp.ndarray, start_sc: jnp.ndarray,
                  rntis: jnp.ndarray, cell: CellConfig, rv: int = 0,
                  mesh=None) -> jnp.ndarray:
    """Slot-batched DL: (S, U, TBS) payloads -> (S, total) samples.

    Processing whole slot batches per dispatch is the TPU counterpart of the
    reference's run-ahead slot pipelining (nof_slot_tti_in_advance,
    downlink_processor_baseband_impl.cpp:47): it amortises per-op dispatch
    and fills the VPU (8x throughput at S=8 on one chip).
    """
    return jax.vmap(lambda p: dl_slot(p, start_sc, rntis, cell, rv, mesh))(payloads)


def ul_slot_batch(rx_samples: jnp.ndarray, start_sc: jnp.ndarray,
                  rntis: jnp.ndarray, cell: CellConfig, rv: int = 0,
                  num_iters: int = decoder.DEFAULT_ITERS, mesh=None):
    """Slot-batched UL: (S, total) samples -> per-slot decode results."""
    return jax.vmap(lambda s: ul_slot(s, start_sc, rntis, cell, rv,
                                      num_iters, mesh))(rx_samples)


def ul_slot(rx_samples: jnp.ndarray, start_sc: jnp.ndarray,
            rntis: jnp.ndarray, cell: CellConfig, rv: int = 0,
            num_iters: int = decoder.DEFAULT_ITERS, mesh=None):
    """UL direction: (total,) samples -> decoded (U, TBS), (U,) crc_ok,
    (U,) noise_var, (U,) cfo."""
    seg, rm = _plans(cell, rv)
    t = cell.timing
    u = cell.nof_ue
    w = cell.ue_width_sc

    rx_grid = ofdm.demodulate_slot(rx_samples, t, scale=1.0)

    pilots = _dmrs_full_band(cell)
    pat = dmrs_mod.dmrs_pattern(1, cell.prb_per_ue, port=0)
    data_sym_idx = np.asarray(cell.data_symbols, dtype=np.int32)
    times = np.asarray([t.cp.data_starts[l] for l in cell.dmrs_symbols]) / t.srate

    def extract(s0):
        """Per-UE rx pilots and data REs from the shared grid."""
        band = jax.lax.dynamic_slice(rx_grid, (0, s0), (t.nsymb, w))
        rx_p = jnp.stack([band[l, pilot_idx] for l, pilot_idx in
                          zip(cell.dmrs_symbols,
                              [jnp.asarray(pat.subcarriers)] * len(cell.dmrs_symbols))])
        ref_p = jax.vmap(lambda p: jax.lax.dynamic_slice(
            p, (s0 // 2,), (len(pat.subcarriers),)))(pilots)
        y = band[jnp.asarray(data_sym_idx)]
        return rx_p, ref_p, y

    rx_p, ref_p, y = jax.vmap(extract)(start_sc)
    rx_p = shard(rx_p, mesh, (UE_AXIS,))

    h, nv, cfo = channel_est.estimate_port(
        rx_p, ref_p, pat.subcarriers, w,
        dmrs_symbol_times_s=times if len(cell.dmrs_symbols) > 1 else None)
    # h: (U, w), nv: (U,)

    hh = jnp.broadcast_to(h[:, None, :], y.shape)
    x_hat, nv_out = equalizer.equalize_mmse_1xn(
        y[None], hh[None], nv[None, :, None, None])
    llr = modulation.demodulate_soft(x_hat.reshape(u, -1),
                                     nv_out.reshape(u, -1), cell.modulation,
                                     quantize=False)
    ci = (rntis.astype(jnp.uint32) << 15) + jnp.uint32(cell.n_id)
    llr = sequences.scramble_llrs(llr, ci)                 # (U, G)

    cb_llr = llr.reshape(u * seg.c, rm.e)
    full = rate_match.rate_dematch(cb_llr, rm)             # (U*C, colsZc)
    full = shard(full, mesh, ((UE_AXIS, CB_AXIS),))
    hard, cb_ok = decoder.decode(full, seg.bg, seg.zc, num_iters=num_iters)
    payload, tb_ok = segmenter.desegment_tb(hard, seg)
    payload = shard(payload, mesh, (UE_AXIS,))
    return payload, tb_ok, nv, cfo
