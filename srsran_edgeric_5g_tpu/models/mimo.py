"""Multi-layer (2/4) MIMO PDSCH/PUSCH: the multi-port path of the
reference's resource grid ([subcarrier x symbol x port],
resource_grid_impl.h:41-51), channel precoder (layers->ports), type-1 DM-RS
CDM groups (w_f OCC, dmrs_helper.h) and the 2xN / general LxN MMSE
equalizers (equalize_zf_2xn.h counterpart + generic path).

TX: one TB encoded at L-layer TBS -> layer mapping d(Li+l) -> layer l
(TS 38.211 §7.3.1.3) -> identity precoding (port p = layer p) -> per-port
grids with CDM DM-RS: ports 0/1 share CDM group 0 subcarriers with
frequency OCC [+,+]/[+,-]; ports 2/3 (L=4) share CDM group 1 (delta=1).

RX: per (rx antenna, tx port) channel estimation by OCC de-spreading pilot
pairs within each CDM group (half-rate virtual pilots at pair centers
re-using the single-port estimator's interpolation), then per-RE MMSE
(closed-form 2x2 for L=2, whitened-Gram solve for L=4), layer demapping,
demap/descramble/dematch/decode.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..ops import channel_est, dmrs as dmrs_mod, equalizer, modulation, sequences
from ..ops.ldpc import decoder, rate_match, segmenter
from ..ran.numerology import N_SC_PER_PRB
from ..ran.tbs import nof_re, tbs as tbs_calc
from .pdsch import PdschConfig, scrambling_c_init
from .pusch import PuschResult

N_LAYERS = 2


def derived_tbs(cfg: PdschConfig, n_layers: int = N_LAYERS) -> int:
    nre = nof_re(cfg.nof_prb, cfg.nof_symbols, 12 * len(cfg.dmrs_symbols))
    return tbs_calc(nre, cfg.target_rate, cfg.qm, n_layers)


@functools.lru_cache(maxsize=None)
def _plans(cfg: PdschConfig, rv: int, n_layers: int):
    tbs_l = derived_tbs(cfg, n_layers)
    g_l = n_layers * cfg.g_total
    bg = segmenter.select_base_graph(tbs_l, cfg.target_rate)
    seg = segmenter.get_segment_plan(tbs_l, bg, g_l, cfg.qm)
    rms = tuple(rate_match.get_rate_match_plan(seg.bg, seg.zc, e, rv, cfg.qm,
                                               seg.k_prime)
                for e in sorted(set(seg.e)))
    return seg, rms


def _plans2(cfg: PdschConfig, rv: int = 0):
    return _plans(cfg, rv, N_LAYERS)


def _encode(payload: jnp.ndarray, cfg: PdschConfig, rv: int,
            n_layers: int) -> jnp.ndarray:
    """(1, TBS_L) -> (1, L*G) scrambled codeword bits (one codeword)."""
    seg, rms = _plans(cfg, rv, n_layers)
    cbs = segmenter.segment_tb(payload, seg)
    from ..ops.ldpc import encoder
    cw = encoder.encode(cbs, seg.bg, seg.zc)
    if len(rms) == 1:
        bits = rate_match.rate_match(cw, rms[0]).reshape(1, -1)
    else:
        parts, idx = [], 0
        for e in seg.e:
            plan = next(p for p in rms if p.e == e)
            parts.append(rate_match.rate_match(cw[idx:idx + 1], plan))
            idx += 1
        bits = jnp.concatenate([p.reshape(-1) for p in parts])[None, :]
    ci = jnp.asarray([scrambling_c_init(cfg.rnti, cfg.n_id)], dtype=jnp.uint32)
    return sequences.scramble_bits(bits, ci)


def layer_map(syms: jnp.ndarray, n_layers: int = N_LAYERS) -> jnp.ndarray:
    """(1, LM) codeword symbols -> (L, M): d(Li+l) -> layer l."""
    return syms.reshape(-1, n_layers).T


def layer_demap(x: jnp.ndarray) -> jnp.ndarray:
    """(L, M) layer values -> (1, LM) codeword order."""
    return x.T.reshape(1, -1)


def process_mimo(payload: jnp.ndarray, cfg: PdschConfig, nsymb: int,
                 nsubc: int, rv: int = 0,
                 n_layers: int = N_LAYERS) -> jnp.ndarray:
    """(1, TBS_L) payload -> (L, nsymb, nsubc) per-port grids."""
    bits = _encode(payload, cfg, rv, n_layers)
    syms = modulation.modulate(bits, cfg.modulation)      # (1, LM)
    layers = layer_map(syms, n_layers)                    # (L, M)

    sc0 = cfg.start_prb * N_SC_PER_PRB
    width = cfg.nof_prb * N_SC_PER_PRB
    sym_idx = jnp.asarray(np.asarray(cfg.data_symbols, dtype=np.int32))
    grids = []
    for p in range(n_layers):
        g = jnp.zeros((nsymb, nsubc), jnp.complex64)
        data = layers[p].reshape(len(cfg.data_symbols), width)
        g = g.at[sym_idx, sc0:sc0 + width].set(data.astype(jnp.complex64))
        pat = dmrs_mod.dmrs_pattern(1, cfg.nof_prb, port=p)
        for l in cfg.dmrs_symbols:
            ci = jnp.asarray([dmrs_mod.dmrs_c_init(cfg.slot, l, cfg.n_id,
                                                   cfg.n_scid)], jnp.uint32)
            pil = dmrs_mod.dmrs_sequence(ci, len(pat.subcarriers),
                                         skip_pilots=6 * cfg.start_prb)[0]
            g = g.at[l, jnp.asarray(pat.subcarriers + sc0)].set(
                pil * jnp.asarray(pat.wf))
        grids.append(g)
    return jnp.stack(grids)


def process_2layer(payload: jnp.ndarray, cfg: PdschConfig, nsymb: int,
                   nsubc: int, rv: int = 0) -> jnp.ndarray:
    """(1, TBS2) payload -> (2, nsymb, nsubc) per-port grids."""
    return process_mimo(payload, cfg, nsymb, nsubc, rv, N_LAYERS)


def _estimate_ports_occ(rx_grid: jnp.ndarray, cfg: PdschConfig,
                        symbol_times: np.ndarray, cdm_group: int = 0):
    """One rx antenna -> the 2 tx ports of one CDM group via OCC de-spread.

    Ports 2g/2g+1 share CDM group g subcarriers with w_f = [+,+] / [+,-]
    over pilot pairs: u = r(2j)/p(2j), v = r(2j+1)/p(2j+1) give
    h_even = (u+v)/2 and h_odd = (u-v)/2 at the pair centre.  The
    de-spread half-rate pilots feed the standard estimator interpolation.
    Returns ((2, width) h, noise_var, cfo).
    """
    sc0 = cfg.start_prb * N_SC_PER_PRB
    width = cfg.nof_prb * N_SC_PER_PRB
    pat = dmrs_mod.dmrs_pattern(1, cfg.nof_prb, port=2 * cdm_group)
    npil = len(pat.subcarriers)

    rx_p, ref_p = [], []
    for l in cfg.dmrs_symbols:
        ci = jnp.asarray([dmrs_mod.dmrs_c_init(cfg.slot, l, cfg.n_id,
                                               cfg.n_scid)], jnp.uint32)
        pil = dmrs_mod.dmrs_sequence(ci, npil, skip_pilots=6 * cfg.start_prb)[0]
        rx_p.append(rx_grid[l, jnp.asarray(pat.subcarriers + sc0)])
        ref_p.append(pil)
    r = jnp.stack(rx_p)[None]                  # (1, ndmrs, npil)
    p = jnp.stack(ref_p)[None]
    raw = r * jnp.conj(p) / jnp.maximum(jnp.abs(p) ** 2, 1e-12)
    u, v = raw[..., 0::2], raw[..., 1::2]      # pilot pairs
    centers = ((pat.subcarriers[0::2] + pat.subcarriers[1::2]) // 2)

    times = (np.asarray([symbol_times[l] for l in cfg.dmrs_symbols])
             if len(cfg.dmrs_symbols) > 1 else None)
    ones = jnp.ones_like(u)
    hs, nvs, corrs = [], [], []
    for hp in ((u + v) / 2, (u - v) / 2):
        h, nv, _ = channel_est.estimate_port(
            hp, ones, centers, width, dmrs_symbol_times_s=times)
        hs.append(h[0])
        nvs.append(nv[0])
        # Complex CFO correlation, NOT the per-stream angle: a dead stream
        # (zero cross-channel entry, e.g. an identity 2x2 channel's
        # off-diagonal) has noise-only pilots whose angle is a random CFO;
        # summing correlations energy-weights it to ~zero instead.
        corrs.append(channel_est.cfo_correlation(hp)[0])
    return jnp.stack(hs), (nvs[0] + nvs[1]) / 2, corrs[0] + corrs[1]


def receive_mimo(rx_grids: jnp.ndarray, cfg: PdschConfig, srate: float,
                 symbol_times: np.ndarray, rv: int = 0,
                 num_iters: int = decoder.DEFAULT_ITERS,
                 n_layers: int = N_LAYERS) -> PuschResult:
    """(n_rx, nsymb, nsubc) antenna grids -> decoded L-layer TB."""
    seg, rms = _plans(cfg, rv, n_layers)
    n_rx = rx_grids.shape[0]
    sc0 = cfg.start_prb * N_SC_PER_PRB
    width = cfg.nof_prb * N_SC_PER_PRB
    sym_idx = jnp.asarray(np.asarray(cfg.data_symbols, dtype=np.int32))
    n_groups = (n_layers + 1) // 2

    hs, nvs, corrs = [], [], []
    for a in range(n_rx):
        per_group_h, per_group_nv = [], []
        for g in range(n_groups):
            h, nv, corr = _estimate_ports_occ(rx_grids[a], cfg, symbol_times,
                                              cdm_group=g)
            per_group_h.append(h)
            per_group_nv.append(nv)
            corrs.append(corr)
        hs.append(jnp.concatenate(per_group_h, axis=0)[:n_layers])
        nvs.append(sum(per_group_nv) / n_groups)
    h = jnp.stack(hs)                           # (n_rx, L, width)
    nv = jnp.stack(nvs)                         # (n_rx,)

    # Energy-weighted CFO over every (antenna, OCC stream) correlation —
    # dead cross-channel streams carry no weight (see _estimate_ports_occ).
    cfo = jnp.zeros((), jnp.float32)
    if len(cfg.dmrs_symbols) > 1:
        dt = float(symbol_times[cfg.dmrs_symbols[-1]]
                   - symbol_times[cfg.dmrs_symbols[0]])
        cfo = (jnp.angle(sum(corrs))
               / np.float32(2.0 * np.pi * dt)).astype(jnp.float32)

    y = rx_grids[:, sym_idx, sc0:sc0 + width]   # (n_rx, ndata, width)
    # CFO compensation of the data symbols (estimates anchored at t=0; the
    # reference re-applies the ramp per symbol estimate instead,
    # port_channel_estimator_average_impl.cpp:245-253).
    if len(cfg.dmrs_symbols) > 1:
        import jax
        t_data = np.asarray([symbol_times[l] for l in cfg.data_symbols],
                            np.float32)
        ph = np.float32(-2.0 * np.pi) * cfo * jnp.asarray(t_data)
        y = y * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))[None, :, None]
    # Weights once per subcarrier (channel constant across data symbols),
    # applied as fused per-layer multiply-adds — equalizer.mmse_equalize_
    # timeinv (add a singleton batch dim B=1).  Demap layer-major, then
    # interleave the LLRs into codeword order (see _ul_front_mimo).
    nv_p = jnp.maximum(nv[:, None, None], 1e-30)        # (P, 1, 1)
    x_hat, nv_out = equalizer.mmse_equalize_timeinv(
        y[:, None], h[:, :, None], nv_p)                # (1, L, ndata, w)
    ndata_n, w_n = y.shape[1], y.shape[2]
    qm = cfg.qm
    x = x_hat.reshape(n_layers, ndata_n * w_n)
    nv_x = jnp.broadcast_to(nv_out[0, :, None, :],
                            (n_layers, ndata_n, w_n)
                            ).reshape(n_layers, ndata_n * w_n)
    llr = modulation.demodulate_soft(x, nv_x, cfg.modulation,
                                     quantize=False)    # (L, nw*Qm)
    llr = llr.reshape(n_layers, ndata_n * w_n, qm).transpose(1, 0, 2)
    llr = llr.reshape(1, -1)
    ci = jnp.asarray([scrambling_c_init(cfg.rnti, cfg.n_id)], dtype=jnp.uint32)
    llr = sequences.scramble_llrs(llr, ci)

    per_cb, off = [], 0
    for e in seg.e:
        plan = next(p for p in rms if p.e == e)
        per_cb.append(rate_match.rate_dematch(llr[:, off:off + e], plan))
        off += e
    full = jnp.concatenate(per_cb, axis=0)
    hard, cb_ok = decoder.decode(full, seg.bg, seg.zc, num_iters=num_iters)
    payload, tb_ok = segmenter.desegment_tb(hard, seg)
    mean_nv = jnp.mean(nv)
    sinr = -10.0 * jnp.log10(jnp.maximum(mean_nv, 1e-9))
    return PuschResult(payload=payload, tb_crc_ok=tb_ok, cb_crc_ok=cb_ok,
                       soft_buffer=None, noise_var=mean_nv,
                       cfo_hz=cfo, evm_sinr_db=sinr)


def receive_2layer(rx_grids: jnp.ndarray, cfg: PdschConfig, srate: float,
                   symbol_times: np.ndarray, rv: int = 0,
                   num_iters: int = decoder.DEFAULT_ITERS) -> PuschResult:
    """(n_rx, nsymb, nsubc) antenna grids -> decoded 2-layer TB."""
    return receive_mimo(rx_grids, cfg, srate, symbol_times, rv, num_iters,
                        N_LAYERS)
