"""LDPC encoder: lifted base-graph encode as edge-gather + GF(2) matmuls.

TS 38.212 §5.3.2.  Counterpart of the reference's
ldpc_encoder_generic.cpp:32-126 / ldpc_encoder_avx2.cpp, re-designed for the
MXU/VPU instead of translated: the per-lifting-size strategy dispatch and
SIMD register juggling are replaced by

  1. one static gather of all rotated message blocks (edge list from the plan),
  2. a (rows x E) selector matmul accumulating check-row sums,
  3. a dense (4Zc x 4Zc) GF(2) solve for the core parities (the reference's
     per-class closed-form back-substitution becomes a precomputed inverse
     applied as a batched matmul),
  4. one more gather+matmul for the extension parities.

Everything is batched over codeblocks; shapes are static per (BG, Zc).
The encoder emits the full cols*Zc codeword (including the 2*Zc punctured
systematic bits) — rate matching handles the puncture.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.bits import parity_dot
from .graph import LdpcGraph, build_parity_check_dense, get_graph, gf2_inv


@dataclasses.dataclass(frozen=True)
class EncodePlan:
    bg: int
    zc: int
    graph: LdpcGraph
    idx_msg: np.ndarray        # (E_msg, Zc) gather into flat message (K,)
    sel_msg: np.ndarray        # (rows, E_msg) row-selector
    core_inv_t: np.ndarray     # (4Zc, 4Zc): p_core = s_core @ core_inv_t
    idx_core_ext: np.ndarray   # (E_ce, Zc) gather into flat p_core (4Zc,)
    sel_core_ext: np.ndarray   # (rows-4, E_ce)

    def __hash__(self):
        return hash((self.bg, self.zc))


@functools.lru_cache(maxsize=None)
def get_encode_plan(bg: int, zc: int) -> EncodePlan:
    g = get_graph(bg, zc)
    z = np.arange(zc)

    def rot_idx(col, shift, base_blocks):
        """Flat gather index of block ``col`` rotated by ``shift`` within a
        buffer of ``base_blocks`` contiguous Zc-blocks."""
        del base_blocks
        return col * zc + (z + shift) % zc

    msg = g.edge_col < g.kb
    core = (g.edge_col >= g.kb) & (g.edge_col < g.kb + 4)
    ext_parity = g.edge_col >= g.kb + 4

    # Sanity: extension rows have exactly one degree-1 parity column with
    # shift 0 on the diagonal (TS 38.212 base-graph structure).
    er, ec, es = g.edge_row[ext_parity], g.edge_col[ext_parity], g.edge_shift[ext_parity]
    assert (ec == g.kb + er).all() and (es == 0).all() and len(er) == g.rows - 4
    # Core rows touch only message + core parity columns.
    assert (g.edge_col[g.edge_row < 4] < g.kb + 4).all()

    idx_msg = np.stack([rot_idx(c, s, g.kb)
                        for c, s in zip(g.edge_col[msg], g.edge_shift[msg])])
    sel_msg = np.zeros((g.rows, msg.sum()), dtype=np.int8)
    sel_msg[g.edge_row[msg], np.arange(msg.sum())] = 1

    # Core solve: A p_core = s_core over the first 4 check rows.
    a = np.zeros((4 * zc, 4 * zc), dtype=np.uint8)
    for r, c, s in zip(g.edge_row[core], g.edge_col[core], g.edge_shift[core]):
        if r < 4:
            a[r * zc + z, (c - g.kb) * zc + (z + s) % zc] ^= 1
    core_inv_t = gf2_inv(a).T.astype(np.int8)

    ce = core & (g.edge_row >= 4)
    idx_core_ext = np.stack([rot_idx(c - g.kb, s, 4)
                             for c, s in zip(g.edge_col[ce], g.edge_shift[ce])])
    sel_core_ext = np.zeros((g.rows - 4, ce.sum()), dtype=np.int8)
    sel_core_ext[g.edge_row[ce] - 4, np.arange(ce.sum())] = 1

    return EncodePlan(bg=bg, zc=zc, graph=g, idx_msg=idx_msg, sel_msg=sel_msg,
                      core_inv_t=core_inv_t, idx_core_ext=idx_core_ext,
                      sel_core_ext=sel_core_ext)


def _row_sums(flat_bits: jnp.ndarray, idx: np.ndarray, sel: np.ndarray) -> jnp.ndarray:
    """(B, nbits) -> (B, rows, Zc) real-valued row accumulations (pre mod-2).

    Gathers every rotated edge block then reduces edges per check row with a
    selector matmul (MXU).
    """
    rot = flat_bits[:, jnp.asarray(idx.reshape(-1))]  # (B, E*Zc)
    e, zc = idx.shape
    rot = rot.reshape(-1, e, zc).astype(jnp.float32)
    return jnp.einsum("re,bez->brz", jnp.asarray(sel, dtype=jnp.float32), rot,
                      preferred_element_type=jnp.float32)


def encode(msg_bits: jnp.ndarray, bg: int, zc: int,
           impl: str = "auto") -> jnp.ndarray:
    """Encode int8 {0,1} messages (B, K=kb*Zc) -> full codewords (B, cols*Zc).

    Filler bits must already be zero in ``msg_bits`` (the segmenter sets
    them); they encode as zeros and are handled by rate matching.

    ``impl='rolls'`` unrolls the static edge list into lane rotations + int8
    XORs (the fast TPU path); ``impl='gather'`` uses the gather +
    selector-matmul formulation (fast compiles — the CPU default);
    ``impl='auto'`` picks by backend.
    """
    if impl == "auto":
        impl = "rolls" if jax.default_backend() == "tpu" else "gather"
    if impl == "rolls":
        return _encode_rolls(msg_bits, bg, zc)
    plan = get_encode_plan(bg, zc)
    g = plan.graph
    b = msg_bits.shape[0]
    zc_ = g.zc

    m = msg_bits.reshape(b, g.k)
    s_all = _row_sums(m, plan.idx_msg, plan.sel_msg)  # (B, rows, Zc)
    s_all = jnp.mod(s_all, 2.0)

    s_core = s_all[:, :4].reshape(b, 4 * zc_).astype(jnp.int8)
    p_core = parity_dot(s_core, jnp.asarray(plan.core_inv_t))  # (B, 4Zc)

    s_ext = _row_sums(p_core, plan.idx_core_ext, plan.sel_core_ext)  # (B, rows-4, Zc)
    p_ext = jnp.mod(s_all[:, 4:] + s_ext, 2.0).astype(jnp.int8)

    return jnp.concatenate(
        [m.astype(jnp.int8), p_core, p_ext.reshape(b, -1)], axis=-1)


def _encode_rolls(msg_bits: jnp.ndarray, bg: int, zc: int) -> jnp.ndarray:
    """Roll-based encode: per check row, XOR of lane-rotated message blocks
    (static shifts, int8 bitwise ops); core parities via the precomputed GF(2)
    inverse on the MXU; extension parities by one more roll+XOR pass."""
    plan = get_encode_plan(bg, zc)
    g = plan.graph
    b = msg_bits.shape[0]

    m = msg_bits.reshape(b, g.kb, zc).astype(jnp.int8)

    row_msg: list[list[tuple[int, int]]] = [[] for _ in range(g.rows)]
    row_core: list[list[tuple[int, int]]] = [[] for _ in range(g.rows)]
    for r, c, s in zip(g.edge_row, g.edge_col, g.edge_shift):
        if c < g.kb:
            row_msg[int(r)].append((int(c), int(s)))
        elif c < g.kb + 4 and r >= 4:
            row_core[int(r)].append((int(c) - g.kb, int(s)))

    def row_xor(blocks, edges):
        acc = None
        for c, s in edges:
            v = jnp.roll(blocks[:, c], -s, axis=-1)
            acc = v if acc is None else jnp.bitwise_xor(acc, v)
        if acc is None:  # rows with no message-column edges (BG2 tail rows)
            acc = jnp.zeros((b, zc), jnp.int8)
        return acc

    s_all = jnp.stack([row_xor(m, row_msg[r]) for r in range(g.rows)], axis=1)

    s_core = s_all[:, :4].reshape(b, 4 * zc)
    p_core = parity_dot(s_core, jnp.asarray(plan.core_inv_t))  # (B, 4Zc)
    pc = p_core.reshape(b, 4, zc)

    p_ext = []
    for r in range(4, g.rows):
        acc = s_all[:, r]
        for c, s in row_core[r]:
            acc = jnp.bitwise_xor(acc, jnp.roll(pc[:, c], -s, axis=-1))
        p_ext.append(acc)
    p_ext = jnp.stack(p_ext, axis=1)

    return jnp.concatenate([m.reshape(b, -1), p_core,
                            p_ext.reshape(b, -1)], axis=-1).astype(jnp.int8)


def np_check_parity(codewords: np.ndarray, bg: int, zc: int) -> np.ndarray:
    """Host oracle: H @ c over GF(2) per codeword (all-zero iff valid).

    Edge-wise accumulation (O(E*Zc)) rather than a dense H matmul so the
    oracle stays fast at Zc=384.
    """
    g = get_graph(bg, zc)
    b = codewords.shape[0]
    z = np.arange(zc)
    syn = np.zeros((b, g.rows, zc), dtype=np.int64)
    for r, c, s in zip(g.edge_row, g.edge_col, g.edge_shift):
        syn[:, r] += codewords[:, c * zc + (z + s) % zc]
    return (syn % 2).reshape(b, -1)
