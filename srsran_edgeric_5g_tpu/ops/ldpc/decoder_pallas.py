"""Pallas TPU kernel: layered min-sum LDPC decoder, VMEM-resident.

The flagship hand-written kernel (everything else trusts XLA).  Compared to
the XLA `layered_rolls` path, ALL decoder state lives in VMEM for the whole
decode — posterior LLRs (cols, B_tile, Zc) and per-edge messages
(E, B_tile, Zc) — so the 276 layer-steps of a 6-iteration decode touch HBM
only twice (load channel LLRs, store the posterior).  The lifted-graph
cyclic shifts are static `pltpu.roll` lane rotations unrolled from the edge
list; min/second-min are computed with a running pairwise reduction (ties
make m2 == m1, which is exactly the min-over-others value, so no index
bookkeeping is needed).

Layout: lanes = Zc (must be a multiple of 128: Zc in {128, 256, 384} covers
the high-throughput shapes; other lifting sizes fall back to XLA), sublanes
= the codeblock tile.  Grid = codeblock tiles.

Convention matches ops.ldpc.decoder: LLR positive <=> bit 0, normalisation
0.8, input includes punctured/filler positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder import DEFAULT_ITERS, DEFAULT_SCALING, check_parity, get_decode_plan
from .graph import get_graph

# Lane axis = Zc.  Multiples of 128 map perfectly onto the VPU; other sizes
# are padded by Mosaic (correct, some lane waste).  Very small Zc falls back
# to the XLA path.
MIN_ZC = 64


def pallas_supported(zc: int) -> bool:
    return zc >= MIN_ZC


@functools.lru_cache(maxsize=None)
def _row_edges(bg: int, zc: int):
    g = get_graph(bg, zc)
    rows: list[list[tuple[int, int, int]]] = [[] for _ in range(g.rows)]
    for eid, (r, c, s) in enumerate(zip(g.edge_row, g.edge_col, g.edge_shift)):
        rows[int(r)].append((eid, int(c), int(s)))
    return g, rows


def _syndrome_ok(l_ref, row_edges, zc, widen=None):
    """Device-side parity check of the current posterior: scalar bool that is
    True iff EVERY codeword in the tile satisfies every lifted check row
    (XOR over the row's rotated hard bits == 0 on all Zc lanes)."""
    par = None
    for edges in row_edges:
        if not edges:
            continue
        row_par = None
        for (_, c, s) in edges:
            lc = l_ref[c] if widen is None else l_ref[c].astype(widen)
            bit = pltpu.roll(lc, -s % zc, axis=1) < 0
            row_par = bit if row_par is None else row_par ^ bit
        par = row_par if par is None else par | row_par
    return jnp.logical_not(jnp.any(par))


def _iterate_kernel(run_sweep, syndrome_ok, num_iters: int, early_stop: bool):
    """Run ``run_sweep`` (stateful, mutates refs) up to num_iters times,
    exiting once the whole tile satisfies parity — the reference's CRC early
    stop (ldpc_decoder_impl.cpp:125-133) at tile granularity, so each grid
    tile converges independently.

    Measured on v5e (B=128 BG1 Zc=384, instantly-converging input): only 9%
    faster than 6 fixed sweeps — Mosaic's while_loop costs roughly what it
    saves — and the int8 syndrome hits a Mosaic compare limitation, so
    ``early_stop`` defaults to False here; batch-level early exit lives in
    the XLA paths (decoder._iterate) where it wins 22% end-to-end."""
    if not early_stop:
        def body(i, carry):
            run_sweep()
            return carry
        jax.lax.fori_loop(0, num_iters, body, 0)
        return

    def cond(carry):
        i, done = carry
        return jnp.logical_and(i < num_iters, jnp.logical_not(done))

    def body(carry):
        i, _ = carry
        run_sweep()
        return i + 1, syndrome_ok()

    jax.lax.while_loop(cond, body, (0, jnp.bool_(False)))


def _make_kernel(bg: int, zc: int, num_iters: int, scaling: float,
                 b_tile: int, early_stop: bool = True):
    g, row_edges = _row_edges(bg, zc)
    cols, n_edges = g.cols, g.num_edges
    kb = g.kb
    scale = float(scaling)

    def kernel(llr_ref, out_ref, l_ref, r_ref):
        # Load channel LLRs into VMEM posterior state.
        l_ref[...] = llr_ref[...]
        r_ref[...] = jnp.zeros((n_edges, b_tile, zc), jnp.float32)

        def sweep():
            for r, edges in enumerate(row_edges):
                if not edges:
                    continue
                # Variable-to-check (extrinsic) messages.
                ts = []
                for (e, c, s) in edges:
                    lc = pltpu.roll(l_ref[c], -s % zc, axis=1)
                    ts.append(lc - r_ref[e])
                # Running min / second-min and sign product.
                m1 = jnp.abs(ts[0])
                m2 = jnp.full_like(m1, 1e30)
                sgn = jnp.where(ts[0] < 0, -1.0, 1.0)
                for t in ts[1:]:
                    a = jnp.abs(t)
                    new_m1 = jnp.minimum(m1, a)
                    m2 = jnp.minimum(jnp.maximum(m1, a), m2)
                    m1 = new_m1
                    sgn = sgn * jnp.where(t < 0, -1.0, 1.0)
                # Check-to-variable update + posterior write-back.
                for (e, c, s), t in zip(edges, ts):
                    a = jnp.abs(t)
                    mag = jnp.where(a == m1, m2, m1)
                    st = jnp.where(t < 0, -1.0, 1.0)
                    r_new = (sgn * st) * (mag * scale)
                    r_ref[e] = r_new
                    l_new = t + r_new
                    l_ref[c] = pltpu.roll(l_new, s % zc, axis=1)

        _iterate_kernel(sweep,
                        lambda: _syndrome_ok(l_ref, row_edges, zc),
                        num_iters, early_stop)
        out_ref[...] = l_ref[...]

    return kernel


LLR_CLAMP = 120  # matches the reference's LLR_MAX / demapper quantisation


def _make_kernel_int8(bg: int, zc: int, num_iters: int, b_tile: int,
                      early_stop: bool = True):
    """Fixed-point variant: messages R stored int8 (clamped +-LLR_CLAMP like
    the reference) and the posterior L stored int16 WITHOUT clamping —
    hard-clamping L breaks the layered extrinsic identity L = t + R once
    values saturate (measured: sign oscillation destroys noiseless decodes),
    and int16 headroom (|L| <= 120 * max column degree + channel ~ 4k) makes
    saturation impossible.  Arithmetic widens to int32 per op; normalisation
    is 13/16 = 0.8125 via shift-multiply.  ~3x VMEM capacity vs f32."""
    g, row_edges = _row_edges(bg, zc)
    cols, n_edges = g.cols, g.num_edges

    def kernel(llr_ref, out_ref, l_ref, r_ref):
        l_ref[...] = llr_ref[...].astype(jnp.int16)
        r_ref[...] = jnp.zeros((n_edges, b_tile, zc), jnp.int8)

        def sweep():
            for r, edges in enumerate(row_edges):
                if not edges:
                    continue
                ts = []
                for (e, c, s) in edges:
                    # roll only supports 32-bit dtypes on this Mosaic build:
                    # widen, rotate, narrow on store.
                    lc = pltpu.roll(l_ref[c].astype(jnp.int32), -s % zc, axis=1)
                    ts.append(lc - r_ref[e].astype(jnp.int32))
                m1 = jnp.abs(ts[0])
                m2 = jnp.full_like(m1, 1 << 20)
                sgn = jnp.where(ts[0] < 0, -1, 1)
                for t in ts[1:]:
                    a = jnp.abs(t)
                    new_m1 = jnp.minimum(m1, a)
                    m2 = jnp.minimum(jnp.maximum(m1, a), m2)
                    m1 = new_m1
                    sgn = sgn * jnp.where(t < 0, -1, 1)
                for (e, c, s), t in zip(edges, ts):
                    a = jnp.abs(t)
                    mag = jnp.where(a == m1, m2, m1)
                    mag = (mag * 13) >> 4          # x0.8125 normalisation
                    st = jnp.where(t < 0, -1, 1)
                    r_new = jnp.clip((sgn * st) * mag, -LLR_CLAMP, LLR_CLAMP)
                    r_ref[e] = r_new.astype(jnp.int8)
                    l_new = t + r_new                      # int16 range, no clamp
                    l_ref[c] = pltpu.roll(l_new, s % zc, axis=1).astype(jnp.int16)

        _iterate_kernel(sweep,
                        lambda: _syndrome_ok(l_ref, row_edges, zc,
                                             widen=jnp.int32),
                        num_iters, early_stop)
        # Hard decisions only (int8): halves the output VMEM footprint vs an
        # int16 posterior — at B=128 BG1 Zc=384 the posterior output pushed
        # the scoped-VMEM total past the 16 MB limit.  Sign via arithmetic
        # shift (Mosaic rejects some narrow-int comparisons).
        out_ref[...] = ((l_ref[...].astype(jnp.int32) >> 31) & 1
                        ).astype(jnp.int8)

    return kernel


@functools.partial(jax.jit, static_argnames=("bg", "zc", "num_iters",
                                             "scaling", "b_tile", "interpret",
                                             "early_stop"))
def _decode_pallas_inner(llrs, bg, zc, num_iters, scaling, b_tile,
                         interpret=False, early_stop=True):
    g = get_graph(bg, zc)
    b = llrs.shape[0]
    assert b % b_tile == 0, (b, b_tile)
    n_tiles = b // b_tile
    # (B, cols*Zc) -> (cols, B, Zc): lanes = Zc, sublanes = CB tile.
    x = llrs.astype(jnp.float32).reshape(b, g.cols, zc).transpose(1, 0, 2)

    kernel = _make_kernel(bg, zc, num_iters, scaling, b_tile, early_stop)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((g.cols, b_tile, zc), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g.cols, b_tile, zc), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g.cols, b, zc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g.cols, b_tile, zc), jnp.float32),
            pltpu.VMEM((g.num_edges, b_tile, zc), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    # (cols, B, Zc) -> (B, cols*Zc) posterior.
    return out.transpose(1, 0, 2).reshape(b, g.cols * zc)


def decode_pallas(llrs: jnp.ndarray, bg: int, zc: int,
                  num_iters: int = DEFAULT_ITERS,
                  scaling: float = DEFAULT_SCALING,
                  b_tile: int = 8,
                  interpret: bool = False,
                  early_stop: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for decoder.decode on supported Zc: (B, cols*Zc) LLRs ->
    ((B, K) hard bits, (B,) parity ok).  B must be a multiple of b_tile.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests)."""
    assert pallas_supported(zc), zc
    g = get_graph(bg, zc)
    post = _decode_pallas_inner(llrs, bg, zc, num_iters, scaling, b_tile,
                                interpret=interpret, early_stop=early_stop)
    hard = (post < 0).astype(jnp.int8)
    ok = check_parity(hard, bg, zc)
    return hard[:, :g.kb * zc], ok


@functools.partial(jax.jit, static_argnames=("bg", "zc", "num_iters",
                                             "b_tile", "interpret",
                                             "early_stop"))
def _decode_pallas_int8_inner(llrs_i8, bg, zc, num_iters, b_tile,
                              interpret=False, early_stop=True):
    g = get_graph(bg, zc)
    b = llrs_i8.shape[0]
    assert b % b_tile == 0, (b, b_tile)
    n_tiles = b // b_tile
    x = llrs_i8.reshape(b, g.cols, zc).transpose(1, 0, 2)

    kernel = _make_kernel_int8(bg, zc, num_iters, b_tile, early_stop)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((g.cols, b_tile, zc), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g.cols, b_tile, zc), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g.cols, b, zc), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((g.cols, b_tile, zc), jnp.int16),
            pltpu.VMEM((g.num_edges, b_tile, zc), jnp.int8),
        ],
        interpret=interpret,
    )(x)
    return out.transpose(1, 0, 2).reshape(b, g.cols * zc)


def decode_pallas_int8(llrs: jnp.ndarray, bg: int, zc: int,
                       num_iters: int = DEFAULT_ITERS,
                       b_tile: int = 32,
                       interpret: bool = False,
                       early_stop: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """int8-state decode: (B, cols*Zc) LLRs (any float/int scale already in
    the +-127 wire range — e.g. the quantized demapper output) ->
    ((B, K) hard bits, (B,) parity ok).

    Normalisation is 13/16 = 0.8125 (shift-multiply) instead of 0.8; state
    saturates at +-120 like the reference's int8 decoder.
    """
    assert pallas_supported(zc), zc
    g = get_graph(bg, zc)
    x = jnp.clip(jnp.round(llrs.astype(jnp.float32)), -127, 127
                 ).astype(jnp.int8)
    hard = _decode_pallas_int8_inner(x, bg, zc, num_iters, b_tile,
                                     interpret=interpret,
                                     early_stop=early_stop)
    ok = check_parity(hard, bg, zc)
    return hard[:, :g.kb * zc], ok
