"""Full-cell slot pipeline: multi-UE DL encode + UL decode, mesh-sharded.

The TPU-native equivalent of the reference's per-slot hot loops (SURVEY.md
§3.2/§3.3): one jitted program per direction processes a whole slot for all
UEs of a cell.  UE allocations are uniform-width and CONTIGUOUS from a static
first PRB (the scheduler's equal PRB split for the 4-UE zmq scenario), which
turns every per-UE gather/scatter into a static slice + reshape — no dynamic
indexing anywhere on the hot path.  RNTIs (scrambling inits) stay runtime
tensors.

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
    first_prb: int = 0            # static start of the contiguous UE span
    # Channel-estimator options: 0 = plain LS + linear interpolation;
    # > 0 enables the reference's TA + frequency-smoothing estimator chain
    # with this expected delay spread (microseconds).
    delay_spread_us: float = 0.0
    # Limited-buffer rate matching: 0 = full buffer; > 0 = TBS_LBRM bits.
    tbs_lbrm: int = 0
    # Spatial layers per UE (1 = the SISO pipeline; 2/4 route through the
    # *_mimo slot programs: layer-mapped single codeword, type-1 CDM DM-RS
    # groups, LxN whitened-Gram MMSE).
    n_layers: int = 1
    # Grid subcarrier of the radio DC position (None = no zeroing — the ZMQ
    # loopback has no DC distortion).  Against a real radio set it to
    # nof_subc // 2: the UL front zeroes the channel estimate there
    # (pusch_processor_impl.cpp:184-199) so that RE's LLRs are erased.
    dc_position: int | None = None

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
        return tbs_calc(nre, self.target_rate, self.qm, self.n_layers)


@functools.lru_cache(maxsize=None)
def _plans(cell: CellConfig, rv: int = 0):
    tbs = cell.derived_tbs()
    bg = segmenter.select_base_graph(tbs, cell.target_rate)
    seg = segmenter.get_segment_plan(tbs, bg,
                                     cell.n_layers * cell.g_total, cell.qm)
    assert len(set(seg.e)) == 1, "uniform-E configs only in the cell pipeline"
    n_cb = (rate_match.lbrm_n_cb(seg.bg, seg.zc, seg.c, cell.tbs_lbrm)
            if cell.tbs_lbrm > 0 else None)
    rm = rate_match.get_rate_match_plan(seg.bg, seg.zc, seg.e[0], rv, cell.qm,
                                        seg.k_prime, n_cb=n_cb)
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


def _dl_code(payloads: jnp.ndarray, rntis: jnp.ndarray, cell: CellConfig,
             rv: int = 0, mesh=None, ci: jnp.ndarray | None = None,
             row_axes=(UE_AXIS,),
             cb_axes=((UE_AXIS, CB_AXIS),)) -> jnp.ndarray:
    """Coding front-end for a flat (B_tb, TBS) batch -> (B_tb, G/Qm) symbols.

    All codeblocks of all TBs (any number of slots — and, for multi-cell,
    any number of carriers flattened into the batch) go through segment ->
    encode -> rate match -> scramble -> modulate as one batch.  ``ci``
    overrides the per-row scrambling init (default: per-UE rntis tiled over
    slots); ``row_axes``/``cb_axes`` override the sharding specs of the TB
    and codeblock batch dims.
    """
    seg, rm = _plans(cell, rv)
    b_tb = payloads.shape[0]
    payloads = shard(payloads, mesh, row_axes)
    cbs = segmenter.segment_tb(payloads, seg)              # (B_tb*C, K)
    cbs = shard(cbs, mesh, cb_axes)
    cw = encoder.encode(cbs, seg.bg, seg.zc)               # (B_tb*C, colsZc)
    bits = rate_match.rate_match(cw, rm)                   # (B_tb*C, E)
    bits = bits.reshape(b_tb, -1)                          # (B_tb, G)
    bits = shard(bits, mesh, row_axes)
    if ci is None:
        u = cell.nof_ue
        reps = b_tb // u
        ci_row = (rntis.astype(jnp.uint32) << 15) + jnp.uint32(cell.n_id)
        # NOTE: c_init is slot-invariant, so the Gold matmul could be hoisted
        # to (U, G) and tiled — measured on v5e this PERTURBS XLA's layout
        # assignment into materializing full transpose copies of the bit/LLR
        # streams (57% of device time; 15.8x -> 7.0x), so the per-row
        # formulation stays: the xor fuses into the stream with no
        # transition.
        ci = jnp.tile(ci_row, reps)
    bits = sequences.scramble_bits(bits, ci)
    return modulation.modulate(bits, cell.modulation)      # (B_tb, G/Qm)


def _dl_grid(syms: jnp.ndarray, cell: CellConfig,
             dmrs_scale: float = float(np.sqrt(2.0)),
             add_rows: dict[int, jnp.ndarray] | None = None) -> jnp.ndarray:
    """(U, G/Qm) modulated symbols -> (nsymb, nsubc) resource grid.

    ``dmrs_scale``: DM-RS-to-data amplitude.  The default sqrt(2) is the
    PUSCH convention (TS 38.214 3 dB boost for 2 CDM groups w/o data, which
    the reference receiver assumes — dmrs_pusch_estimator scaling, interop-
    validated in test_reference_parity); DL PDSCH passes 1.0 (0 dB EPRE).

    ``add_rows``: symbol index -> (nsubc,) contribution ADDED to that
    symbol's row (control channels on disjoint REs: PDCCH, SSB, PUCCH…).
    """
    t = cell.timing
    u = cell.nof_ue
    w = cell.ue_width_sc
    span = u * w
    band0 = cell.first_prb * N_SC_PER_PRB
    ndata = len(cell.data_symbols)
    band = syms.reshape(u, ndata, w).transpose(1, 0, 2).reshape(ndata, span)
    band = band.astype(jnp.complex64)

    # DM-RS over the whole occupied span (all UEs share n_id -> one sequence;
    # type-1 port 0 = even subcarriers, built by interleaving with zeros).
    pilots = _dmrs_full_band(cell)                         # (ndmrs, 6*nof_prb)
    p0 = 6 * cell.first_prb
    npil_span = span // 2

    # Assemble the grid row-by-row with static concats (no scatters).
    left = jnp.zeros((band0,), jnp.complex64)
    right = jnp.zeros((t.nof_subc - band0 - span,), jnp.complex64)
    zero_row = jnp.zeros((t.nof_subc,), jnp.complex64)
    data_iter = iter(range(ndata))
    rows = []
    for l in range(t.nsymb):
        if l in cell.data_symbols:
            row = jnp.concatenate([left, band[next(data_iter)], right])
        elif l in cell.dmrs_symbols:
            i = cell.dmrs_symbols.index(l)
            pil = pilots[i, p0:p0 + npil_span] * np.float32(dmrs_scale)
            row_span = jnp.stack([pil, jnp.zeros_like(pil)], axis=-1).reshape(span)
            row = jnp.concatenate([left, row_span, right])
        else:
            row = zero_row
        if add_rows is not None and l in add_rows:
            row = row + add_rows[l].astype(jnp.complex64)
        rows.append(row)
    return jnp.stack(rows)


def _dl_grid_ofdm(syms: jnp.ndarray, cell: CellConfig,
                  dmrs_scale: float = float(np.sqrt(2.0)),
                  add_rows: dict[int, jnp.ndarray] | None = None
                  ) -> jnp.ndarray:
    """(U, G/Qm) modulated symbols -> (total,) time-domain samples."""
    t = cell.timing
    grid = _dl_grid(syms, cell, dmrs_scale, add_rows)
    return ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)


def dl_slot(payloads: jnp.ndarray, rntis: jnp.ndarray, cell: CellConfig,
            rv: int = 0, mesh=None) -> jnp.ndarray:
    """DL direction: (U, TBS) payloads -> (total,) baseband samples.

    UE u occupies PRBs [first_prb + u*prb_per_ue, ...) — static layout, so
    grid assembly is a transpose + one static slice write.
    """
    syms = _dl_code(payloads, rntis, cell, rv, mesh)
    return _dl_grid_ofdm(syms, cell)


def dl_slot_batch(payloads: jnp.ndarray, rntis: jnp.ndarray,
                  cell: CellConfig, rv: int = 0, mesh=None) -> jnp.ndarray:
    """Slot-batched DL: (S, U, TBS) payloads -> (S, total) samples.

    Processing whole slot batches per dispatch is the TPU counterpart of the
    reference's run-ahead slot pipelining (nof_slot_tti_in_advance,
    downlink_processor_baseband_impl.cpp:47).  The coding front-end runs as
    ONE flat (S*U) batch; only grid assembly + OFDM vmap over slots.
    """
    s, u, tbs = payloads.shape
    syms = _dl_code(payloads.reshape(s * u, tbs), rntis, cell, rv, mesh)
    syms = syms.reshape(s, u, -1)
    return jax.vmap(lambda sy: _dl_grid_ofdm(sy, cell))(syms)


def ul_slot_batch(rx_samples: jnp.ndarray, rntis: jnp.ndarray,
                  cell: CellConfig, rv: int = 0,
                  num_iters: int = decoder.DEFAULT_ITERS, mesh=None,
                  soft_buffer: jnp.ndarray | None = None):
    """Slot-batched UL: (S, total) samples -> per-slot decode results
    (payload, tb_ok, noise_var, cfo, soft) with soft the (S, U*C, n_cb)
    HARQ circular buffers (feed back as ``soft_buffer`` with the
    retransmission's ``rv`` for chase/IR combining).

    The whole batch — front-end (demod -> chest -> MMSE -> demap) AND the
    dematch/decode back-end — runs as ONE flat (S*U) TB batch: flattening
    the slot dim into the decode batch measured 1.8x faster than a vmapped
    per-slot decode on v5e (a vmapped early-stop while carries per-slot
    loop state that XLA must mask every sweep; one flat batch has a single
    loop counter and identical convergence, since the vmapped while already
    ran max-over-slots sweeps anyway).
    """
    s = rx_samples.shape[0]
    u = cell.nof_ue
    llr, nv, cfo = _ul_front(rx_samples, rntis, cell, rv, mesh)  # (S, U, G)
    seg, _ = _plans(cell, rv)
    sb_flat = None if soft_buffer is None else \
        soft_buffer.reshape(s * u * seg.c, -1)
    payload, tb_ok, soft = _ul_back(llr.reshape(s * u, -1), cell, rv,
                                    num_iters, mesh, sb_flat)
    return (payload.reshape(s, u, -1), tb_ok.reshape(s, u), nv, cfo,
            soft.reshape(s, u * seg.c, -1))


def ul_slot(rx_samples: jnp.ndarray, rntis: jnp.ndarray, cell: CellConfig,
            rv: int = 0, num_iters: int = decoder.DEFAULT_ITERS, mesh=None,
            soft_buffer: jnp.ndarray | None = None):
    """UL direction: (total,) samples -> decoded (U, TBS), (U,) crc_ok,
    (U,) noise_var, (U,) cfo, (U*C, n_cb) HARQ soft buffer."""
    llr, nv, cfo = _ul_front(rx_samples[None], rntis, cell, rv, mesh)
    payload, tb_ok, soft = _ul_back(llr[0], cell, rv, num_iters, mesh,
                                    soft_buffer)
    return payload, tb_ok, nv[0], cfo[0], soft


def _ul_front(rx_samples: jnp.ndarray, rntis: jnp.ndarray, cell: CellConfig,
              rv: int = 0, mesh=None, ci: jnp.ndarray | None = None,
              row_axes=(UE_AXIS,), rx_grid: jnp.ndarray | None = None):
    """OFDM demod -> chest -> MMSE -> demap -> descramble, natively batched:
    (S, total) samples -> ((S, U, G) LLRs, (S, U) noise_var, (S, U) cfo).
    ``ci``/``row_axes`` as in `_dl_code` (multi-cell flattens carriers into
    the S dim).  ``rx_grid`` skips the OFDM demodulation when the caller
    already demodulated the slot (full-cell pipeline shares one grid between
    PUSCH, PUCCH and SRS processing)."""
    seg, rm = _plans(cell, rv)
    t = cell.timing
    s = rx_samples.shape[0] if rx_samples is not None else rx_grid.shape[0]
    u = cell.nof_ue
    w = cell.ue_width_sc
    span = u * w
    band0 = cell.first_prb * N_SC_PER_PRB

    if rx_grid is None:
        rx_grid = ofdm.demodulate_slot(rx_samples, t, scale=1.0)  # (S, nsymb, nsubc)
    band = rx_grid[..., band0:band0 + span]                # (S, nsymb, span)

    pilots = _dmrs_full_band(cell)
    pat = dmrs_mod.dmrs_pattern(1, cell.prb_per_ue, port=0)
    span_pat = dmrs_mod.dmrs_pattern(1, u * cell.prb_per_ue, port=0)
    times = np.asarray([t.cp.data_starts[l] for l in cell.dmrs_symbols]) / t.srate
    npil_ue = len(pat.subcarriers)
    ndmrs = len(cell.dmrs_symbols)
    ndata = len(cell.data_symbols)

    # Static extraction: strided slices only (type-1 DM-RS on even
    # subcarriers of the span), no gathers.
    assert (span_pat.subcarriers == np.arange(0, u * w, 2)).all(), \
        "pipeline assumes type-1 port-0 DM-RS (even subcarriers)"
    rx_p = jnp.stack([band[:, l, 0::2] for l in cell.dmrs_symbols], axis=1)
    rx_p = rx_p.reshape(s, ndmrs, u, npil_ue).transpose(0, 2, 1, 3)
    rx_p = rx_p.reshape(s * u, ndmrs, npil_ue)
    p0 = 6 * cell.first_prb
    # Undo the TS 38.214 3 dB DM-RS boost (see TX side) on the RX pilots —
    # ls_estimate's conj-product convention needs unit-amplitude references.
    rx_p = rx_p * np.float32(1.0 / np.sqrt(2.0))
    ref_p = pilots[:, p0:p0 + len(span_pat.subcarriers)]
    ref_p = ref_p.reshape(ndmrs, u, npil_ue).transpose(1, 0, 2)
    ref_p = jnp.tile(ref_p, (s, 1, 1))                     # (S*U, ndmrs, npil)
    y = jnp.stack([band[:, l] for l in cell.data_symbols], axis=1)
    y = y.reshape(s, ndata, u, w).transpose(0, 2, 1, 3).reshape(s * u, ndata, w)
    rx_p = shard(rx_p, mesh, row_axes)

    times_opt = times if len(cell.dmrs_symbols) > 1 else None
    if cell.delay_spread_us > 0:
        scs_hz = 15e3 * (1 << cell.mu)
        h, nv, cfo, _ = channel_est.estimate_port_ta(
            rx_p, ref_p, pat.subcarriers, w, scs_hz,
            dmrs_symbol_times_s=times_opt,
            delay_spread_s=cell.delay_spread_us * 1e-6)
    else:
        h, nv, cfo = channel_est.estimate_port(
            rx_p, ref_p, pat.subcarriers, w,
            dmrs_symbol_times_s=times_opt)
    # h: (S*U, w), nv: (S*U,)

    # DC-position zeroing (pusch_processor_impl.cpp:184-199): rows are
    # slot-major (index = slot*U + ue), so the UE band containing DC is the
    # strided row slice [ue_dc::U]; a zero estimate makes the equalizer
    # erase that RE (abnormal-input rule).
    if cell.dc_position is not None and \
            band0 <= cell.dc_position < band0 + span:
        ue_dc, off_dc = divmod(cell.dc_position - band0, w)
        h = h.at[ue_dc::u, off_dc].set(0.0 + 0.0j)
    # (it derotates the pilots by their symbol times), so each data symbol
    # still carries e^{j2pi*cfo*t_l}.  The reference equivalently re-applies
    # the CFO ramp onto every symbol's channel estimate
    # (port_channel_estimator_average_impl.cpp:245-253) — same algebra,
    # |rot| = 1 so the noise statistics are untouched.
    if len(cell.dmrs_symbols) > 1:
        t_data = np.asarray([t.cp.data_starts[l] for l in cell.data_symbols],
                            np.float32) / np.float32(t.srate)
        ph = np.float32(-2.0 * np.pi) * cfo[:, None] * jnp.asarray(t_data)
        y = y * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))[:, :, None]

    hh = jnp.broadcast_to(h[:, None, :], y.shape)
    x_hat, nv_out = equalizer.equalize_mmse_1xn(
        y[None], hh[None], nv[None, :, None, None])
    llr = modulation.demodulate_soft(x_hat.reshape(s * u, -1),
                                     nv_out.reshape(s * u, -1),
                                     cell.modulation, quantize=False)
    # Reference int8 wire domain (float dtype): pairs with the decoder's
    # 'wire_auto' schedule for bit-identical reference-avx2 decode.
    llr = modulation.wire_quantize(llr, cell.modulation)
    if ci is None:
        ci_row = (rntis.astype(jnp.uint32) << 15) + jnp.uint32(cell.n_id)
        # Per-row Gold sequences (see the layout note in _dl_code: hoisting
        # the slot-invariant sequence perturbs layout assignment
        # catastrophically).
        ci = jnp.tile(ci_row, s)
    llr = sequences.scramble_llrs(llr, ci)                 # (S*U, G)
    g_len = llr.shape[-1]
    return (llr.reshape(s, u, g_len), nv.reshape(s, u), cfo.reshape(s, u))


def _ul_back(llr: jnp.ndarray, cell: CellConfig, rv: int = 0,
             num_iters: int = decoder.DEFAULT_ITERS, mesh=None,
             soft_buffer: jnp.ndarray | None = None,
             row_axes=(UE_AXIS,), cb_axes=((UE_AXIS, CB_AXIS),),
             new_data: jnp.ndarray | None = None,
             early_stop: bool = True):
    """Rate dematch (+ HARQ soft combine) + LDPC decode + TB CRC for a flat
    (B_tb, G) LLR batch.  Returns (payload, tb_ok, new_soft) where new_soft
    is the accumulated (B_tb*C, n_cb) circular buffer — the HBM-resident
    rx_buffer state the reference keeps per HARQ process
    (rx_buffer_pool_impl.cpp).

    ``new_data``: (B_tb,) float mask, 1.0 = first transmission of this TB.
    A new transmission zeroes its soft buffer before combining (the
    reference re-reserves a cleared rx_buffer per new TB,
    rx_buffer_pool_impl.cpp), so the HARQ state can stay resident in the
    jitted program across slot batches without host intervention.
    """
    seg, rm = _plans(cell, rv)
    b_tb = llr.shape[0]
    zc = seg.zc
    cb_llr = llr.reshape(b_tb * seg.c, rm.e)
    if soft_buffer is not None and new_data is not None:
        keep = (1.0 - new_data).astype(soft_buffer.dtype)
        keep = jnp.repeat(keep, seg.c)[:, None]            # (B_tb*C, 1)
        soft_buffer = soft_buffer * keep
    # Wire-domain combine: every LLR is an integer (demap clip ±20 -> ±120)
    # and the combined buffer SATURATES at ±127 — the reference's saturated
    # LLR sum (log_likelihood_ratio.h:98-109) — so the whole dematch +
    # HARQ-combine runs in bf16 (integers <= 247 are exact) and the carry
    # lives in HBM as int8: 2x/4x less traffic on the two largest tensors
    # of the UL back-end (the (B, cols*Zc) decoder input and the
    # (B, n_cb) soft state).
    full = rate_match.rate_dematch(cb_llr, rm, soft_buffer,
                                   dtype=jnp.bfloat16, saturate=True)
    full = shard(full, mesh, cb_axes)
    new_soft = full[:, 2 * zc:2 * zc + rm.n_cb].astype(jnp.int8)
    hard, cb_ok = decoder.decode(full, seg.bg, seg.zc, num_iters=num_iters,
                                 early_stop=early_stop, schedule="wire_auto")
    payload, tb_ok = segmenter.desegment_tb(hard, seg)
    payload = shard(payload, mesh, row_axes)
    return payload, tb_ok, new_soft


def _cell_ci(rntis: jnp.ndarray, cell: CellConfig, nc: int,
             s: int) -> jnp.ndarray:
    """(NC, U) rntis -> per-row scrambling inits for the (NC*S*U,) flat
    batch (row order cell-major, slot, UE)."""
    u = cell.nof_ue
    ci_rows = (rntis.astype(jnp.uint32) << 15) + jnp.uint32(cell.n_id)
    return jnp.broadcast_to(ci_rows[:, None, :], (nc, s, u)).reshape(-1)


def multi_cell_dl_slot_batch(payloads: jnp.ndarray, rntis: jnp.ndarray,
                             cell: CellConfig, rv: int = 0,
                             mesh=None) -> jnp.ndarray:
    """Multi-carrier DL: (NC, S, U, TBS) payloads + (NC, U) rntis ->
    (NC, S, total) samples.

    Cells are fully independent same-config carriers (the reference runs one
    upper/lower PHY instance per sector), so they FLATTEN into the slot
    batch: the coding front-end runs as one (NC*S*U) TB batch and grid/OFDM
    vmaps over NC*S slots.  (A per-cell vmap of the whole pipeline was
    measured 2.3x slower per cell-slot on v5e: vmapping serializes nothing
    but carries per-cell loop state through every decode sweep — the same
    pathology the flat S*U decode batch fixed.)  On a mesh, the flat dims
    shard over ('cell','ue') / ('cell','ue','cb') — still zero cross-cell
    collectives, since rows never mix across the flattened dim.
    """
    from .mesh import CELL_AXIS
    nc, s, u, tbs = payloads.shape
    payloads = shard(payloads, mesh, (CELL_AXIS,))
    row_axes = ((CELL_AXIS, UE_AXIS),)
    syms = _dl_code(payloads.reshape(nc * s * u, tbs), None, cell, rv, mesh,
                    ci=_cell_ci(rntis, cell, nc, s), row_axes=row_axes,
                    cb_axes=((CELL_AXIS, UE_AXIS, CB_AXIS),))
    syms = syms.reshape(nc * s, u, -1)
    td = jax.vmap(lambda sy: _dl_grid_ofdm(sy, cell))(syms)
    return shard(td.reshape(nc, s, -1), mesh, (CELL_AXIS,))


def multi_cell_ul_slot_batch(rx_samples: jnp.ndarray, rntis: jnp.ndarray,
                             cell: CellConfig, rv: int = 0,
                             num_iters: int = decoder.DEFAULT_ITERS,
                             mesh=None):
    """Multi-carrier UL: (NC, S, total) samples + (NC, U) rntis -> stacked
    per-cell ul_slot_batch results.  Carriers flatten into the slot batch
    (see `multi_cell_dl_slot_batch`) — ONE early-stop decode loop over all
    NC*S*U*C codeblocks."""
    from .mesh import CELL_AXIS
    nc, s, total = rx_samples.shape
    u = cell.nof_ue
    rx_samples = shard(rx_samples, mesh, (CELL_AXIS,))
    row_axes = ((CELL_AXIS, UE_AXIS),)
    llr, nv, cfo = _ul_front(rx_samples.reshape(nc * s, total), None, cell,
                             rv, mesh, ci=_cell_ci(rntis, cell, nc, s),
                             row_axes=row_axes)
    seg, _ = _plans(cell, rv)
    payload, tb_ok, soft = _ul_back(
        llr.reshape(nc * s * u, -1), cell, rv, num_iters, mesh, None,
        row_axes=row_axes, cb_axes=((CELL_AXIS, UE_AXIS, CB_AXIS),))
    return (shard(payload.reshape(nc, s, u, -1), mesh, (CELL_AXIS,)),
            tb_ok.reshape(nc, s, u), nv.reshape(nc, s, u),
            cfo.reshape(nc, s, u), soft.reshape(nc, s, u * seg.c, -1))


# ===================================================== multi-layer (MIMO)

def _span_dmrs(cell: CellConfig, port: int):
    """Static span-wide DM-RS geometry for one port: (span subcarrier
    offsets, wf per pilot, per-UE pair centers)."""
    u = cell.nof_ue
    span_pat = dmrs_mod.dmrs_pattern(1, u * cell.prb_per_ue, port=port)
    pat = dmrs_mod.dmrs_pattern(1, cell.prb_per_ue, port=port)
    centers = (pat.subcarriers[0::2] + pat.subcarriers[1::2]) // 2
    return span_pat.subcarriers, np.asarray(span_pat.wf), centers


def dl_slot_batch_mimo(payloads: jnp.ndarray, rntis: jnp.ndarray,
                       cell: CellConfig, rv: int = 0,
                       mesh=None,
                       extra_rows: jnp.ndarray | None = None,
                       return_grid: bool = False) -> jnp.ndarray:
    """Multi-layer DL/UE-TX: (S, U, TBS_L) payloads -> (S, L, total)
    per-port baseband samples.

    ``extra_rows``: optional (S, nsymb, nsubc) grid contribution ADDED to
    port 0 before OFDM (control channels transmitted single-port: PDCCH/
    SSB on the gNB side, PUCCH/SRS on the UE side — disjoint REs from the
    PDSCH/PUSCH band).

    One codeword per UE at L-layer TBS, layer mapping d(Li+l) -> layer l
    (TS 38.211 §7.3.1.3), identity precoding (port p = layer p), type-1
    CDM DM-RS (ports 0/1 on even subcarriers with frequency OCC [+,+]/
    [+,-]; ports 2/3 on odd, L=4) — the fused-pipeline form of
    models.mimo.process_mimo (reference: pusch_processor multi-port TX via
    channel_precoder, resource_grid_impl [sc x sym x port]).  DM-RS rides
    at data amplitude (models.mimo convention; the OCC estimator is
    amplitude-normalising either way).
    """
    L = cell.n_layers
    t = cell.timing
    s, u, tbs = payloads.shape
    w = cell.ue_width_sc
    span = u * w
    band0 = cell.first_prb * N_SC_PER_PRB
    ndata = len(cell.data_symbols)

    syms = _dl_code(payloads.reshape(s * u, tbs), rntis, cell, rv, mesh)
    # d(Li+l) -> layer l with ONE explicit 5D transpose straight into the
    # (S, L, ndata, span) band layout (UE bands adjacent along subcarriers).
    # The earlier per-slot/per-port formulation sliced layer p out of a
    # layer-MINOR (S, U, nw, L) tensor, which made XLA lay the whole DL
    # chain out with (S, U) on the (8,128) tile — 4 live lanes of 128
    # (~3% utilization) through the modulate/grid ops, plus a planar
    # re/im split fusion at the same starved layout.
    m5 = syms.reshape(s, u, ndata, w, L).astype(jnp.complex64)
    band = jnp.transpose(m5, (0, 4, 2, 1, 3)).reshape(s, L, ndata, span)

    pilots = _dmrs_full_band(cell)                  # (ndmrs, 6*nof_prb)
    p0 = 6 * cell.first_prb

    # Static per-(port, dmrs-symbol) full rows (L, ndmrs, nsubc): type-1 CDM
    # pilots with the port's frequency OCC, zero elsewhere.
    ndmrs = len(cell.dmrs_symbols)
    dmrs_rows = jnp.zeros((L, ndmrs, t.nof_subc), jnp.complex64)
    for p in range(L):
        sc_off, wf, _ = _span_dmrs(cell, p)
        vals = pilots[:, p0:p0 + len(sc_off)] * jnp.asarray(wf)
        dmrs_rows = dmrs_rows.at[p, :, jnp.asarray(sc_off) + band0].set(
            vals.astype(jnp.complex64).T)

    # Assemble (S, L, nsymb, nsubc) grids with wide batched rows: data rows
    # are one zero-pad of the whole (S, L, ndata, span) band; DM-RS rows
    # broadcast the static tables; everything keeps nsubc minor.
    zero_row = jnp.zeros((s, L, t.nof_subc), jnp.complex64)
    band_full = jnp.pad(band, ((0, 0), (0, 0), (0, 0),
                               (band0, t.nof_subc - band0 - span)))
    rows = []
    data_iter = iter(range(ndata))
    for l in range(t.nsymb):
        if l in cell.data_symbols:
            row = band_full[:, :, next(data_iter)]
        elif l in cell.dmrs_symbols:
            i = cell.dmrs_symbols.index(l)
            row = jnp.broadcast_to(dmrs_rows[None, :, i],
                                   (s, L, t.nof_subc))
        else:
            row = zero_row
        if extra_rows is not None:
            ex = extra_rows[:, None, l].astype(jnp.complex64)
            row = jnp.concatenate([row[:, :1] + ex, row[:, 1:]], axis=1)
        rows.append(row)
    grid = jnp.stack(rows, axis=2)                  # (S, L, nsymb, nsubc)
    if return_grid:
        # Caller merges grids (clean row-major) and runs ONE modulate over
        # the full slot batch — see gnb_dl_slot_batch's layout note.
        return grid
    return ofdm.modulate_slot(grid, t, scale=1.0 / t.nfft)  # (S, L, total)


def ul_slot_batch_mimo(rx_samples: jnp.ndarray, rntis: jnp.ndarray,
                       cell: CellConfig, rv: int = 0,
                       num_iters: int = decoder.DEFAULT_ITERS, mesh=None,
                       soft_buffer: jnp.ndarray | None = None,
                       new_data: jnp.ndarray | None = None,
                       early_stop: bool = True):
    """Multi-port UL RX: (S, P, total) antenna samples -> per-slot decode
    results (payload (S,U,TBS_L), tb_ok (S,U), noise_var (S,U),
    cfo (S,U), soft (S, U*C, n_cb)).

    ``soft_buffer``/``new_data``: HARQ soft-combining state, same contract
    as `ul_slot_batch`.
    """
    s = rx_samples.shape[0]
    u = cell.nof_ue
    seg, _ = _plans(cell, rv)
    llr, nv, cfo = _ul_front_mimo(rx_samples, rntis, cell, rv, mesh)
    sb_flat = None if soft_buffer is None else \
        soft_buffer.reshape(s * u * seg.c, -1)
    nd_flat = None if new_data is None else new_data.reshape(s * u)
    payload, tb_ok, soft = _ul_back(llr, cell, rv, num_iters, mesh, sb_flat,
                                    new_data=nd_flat, early_stop=early_stop)
    return (payload.reshape(s, u, -1), tb_ok.reshape(s, u), nv, cfo,
            soft.reshape(s, u * seg.c, -1))


def _ul_front_mimo(rx_samples: jnp.ndarray | None, rntis: jnp.ndarray,
                   cell: CellConfig, rv: int = 0, mesh=None,
                   rx_grid: jnp.ndarray | None = None):
    """Multi-port UL front-end: (S, P, total) samples (or a pre-demodulated
    (S, P, nsymb, nsubc) ``rx_grid``) -> ((S*U, L*G) LLRs, (S, U) nv,
    (S, U) cfo).

    Port axis through the whole front-end: per-antenna OFDM demod, per
    (antenna, CDM group) OCC-despread channel estimation (frequency OCC
    over pilot pairs -> half-rate virtual pilots into the standard
    estimator), LxP whitened-Gram MMSE weights per subcarrier applied to
    all data symbols, layer demap, descramble.  Counterpart of the
    reference's per-port estimator loop + channel_equalizer_generic_impl
    (pusch_processor_impl.cpp:167-181, equalize_mmse_1xn.h generalised).
    """
    L = cell.n_layers
    t = cell.timing
    u = cell.nof_ue
    w = cell.ue_width_sc
    span = u * w
    band0 = cell.first_prb * N_SC_PER_PRB
    ndata = len(cell.data_symbols)
    ndmrs = len(cell.dmrs_symbols)
    n_groups = (L + 1) // 2

    if rx_grid is None:
        s, p_rx, total = rx_samples.shape
        rx_grid = ofdm.demodulate_slot(rx_samples.reshape(s * p_rx, total),
                                       t, scale=1.0)
        rx_grid = rx_grid.reshape(s, p_rx, t.nsymb, t.nof_subc)
    else:
        s, p_rx = rx_grid.shape[:2]
    band = rx_grid[..., band0:band0 + span]          # (S, P, nsymb, span)

    pilots = _dmrs_full_band(cell)
    p0 = 6 * cell.first_prb
    times = np.asarray([t.cp.data_starts[l] for l in cell.dmrs_symbols]) \
        / t.srate
    times_opt = times if ndmrs > 1 else None

    hs = []      # per tx-port (layer) channel: list of (S, P, U, w)
    nvs = []
    cfos = []
    for g in range(n_groups):
        sc_off, wf, centers = _span_dmrs(cell, 2 * g)
        npil = len(sc_off)
        rx_p = jnp.stack([band[:, :, l, jnp.asarray(sc_off)]
                          for l in cell.dmrs_symbols], axis=2)
        # (S, P, ndmrs, npil) -> per-UE (S*P*U, ndmrs, npil_ue)
        npil_ue = npil // u
        rx_p = rx_p.reshape(s, p_rx, ndmrs, u, npil_ue).transpose(
            0, 1, 3, 2, 4).reshape(s * p_rx * u, ndmrs, npil_ue)
        ref = pilots[:, p0:p0 + npil]                # (ndmrs, npil)
        ref = ref.reshape(ndmrs, u, npil_ue).transpose(1, 0, 2)
        ref = jnp.tile(ref, (s * p_rx, 1, 1))
        raw = rx_p * jnp.conj(ref)                   # unit-amplitude pilots
        u_, v_ = raw[..., 0::2], raw[..., 1::2]
        ones = jnp.ones_like(u_)
        for sign in (1.0, -1.0):
            hp = (u_ + sign * v_) / 2
            h, nv, _ = channel_est.estimate_port(
                hp, ones, centers, w, dmrs_symbol_times_s=times_opt)
            hs.append(h.reshape(s, p_rx, u, w))
            nvs.append(nv.reshape(s, p_rx, u))
            # Complex correlations, summed across streams AND antennas
            # below: dead cross-channel streams carry no weight (see
            # models/mimo._estimate_ports_occ).
            cfos.append(channel_est.cfo_correlation(hp).reshape(s, p_rx, u))
    h = jnp.stack(hs[:L], axis=2)                    # (S, P, L, U, w)
    nv = sum(nvs[:L]) / L                            # (S, P, U)
    dt = (np.float32(times[-1] - times[0]) if ndmrs > 1 else np.float32(1.0))
    cfo = (jnp.angle(jnp.sum(sum(cfos), axis=1))     # (S, U)
           / np.float32(2.0 * np.pi) / dt).astype(jnp.float32)

    # y stays in the grid's NATIVE (S, P, n, U, w) layout: the old
    # (P, S*U, n, w) regroup cost two strided transpose copies of the full
    # data tensor — 14% of the 2x2 full-slot step on v5e (xplane profile).
    y = jnp.stack([band[:, :, l] for l in cell.data_symbols], axis=2)
    y = y.reshape(s, p_rx, ndata, u, w)
    # CFO compensation of the data symbols (see the SISO _ul_front note;
    # port_channel_estimator_average_impl.cpp:245-253).
    if ndmrs > 1:
        t_data = np.asarray([t.cp.data_starts[l] for l in cell.data_symbols],
                            np.float32) / np.float32(t.srate)
        ph = np.float32(-2.0 * np.pi) * cfo[:, None, :] * \
            jnp.asarray(t_data)[None, :, None]             # (S, n, U)
        y = y * jax.lax.complex(jnp.cos(ph),
                                jnp.sin(ph))[:, None, :, :, None]
    # Noise floor: a zero noise estimate (noiseless loopback) would blow
    # up the whitening weights into degenerate all-zero equalizer outputs
    # (whose all-zero codeword PASSES parity) — same role as the 1xN
    # path's abnormal-input semantics.
    nv_p = jnp.maximum(nv[..., None], 1e-9)                # (S, P, U, 1)
    # The channel estimate is per-subcarrier, constant across data symbols:
    # compute the MMSE combining weights ONCE per (slot-UE, subcarrier) and
    # apply them to all ndata symbols as fused per-layer multiply-adds (the
    # Gram/inverse per data-symbol RE was ~90% of the 4x4 step's device
    # time).
    x_hat, nv_out = equalizer.mmse_equalize_timeinv_grid(y, h, nv_p)
    # One transpose of the (complex, qm-fold smaller than the LLR tensor)
    # equalizer output groups each (slot, UE) row; with the layer axis
    # minor, qm-expanding the last axis IS the TS 38.211 layer interleave
    # d(L*i+l) — no LLR-tensor transpose.
    x5 = x_hat.transpose(0, 2, 1, 3, 4)                    # (S, U, n, w, L)
    nv5 = nv_out[:, :, None, :, :]                         # (S, U, 1, w, L)
    llr = modulation.demodulate_soft(x5, jnp.broadcast_to(nv5, x5.shape),
                                     cell.modulation,
                                     quantize=False)       # (S,U,n,w,L*Qm)
    llr = modulation.wire_quantize(llr, cell.modulation)   # int8 wire domain
    llr = llr.reshape(s * u, -1)
    ci_row = (rntis.astype(jnp.uint32) << 15) + jnp.uint32(cell.n_id)
    llr = sequences.scramble_llrs(llr, jnp.tile(ci_row, s))
    return llr, jnp.mean(nv, axis=1), cfo
