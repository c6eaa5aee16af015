"""Successive-cancellation LIST (SCL) polar decoder, batched + functional.

Counterpart of the reference's SCL paths in polar_decoder_impl.cpp.  The
classic array-based SCL (per-depth lazy memories + path pruning) is hostile
to a tracing compiler, so this is a *functional* formulation:

Every recursion step returns, besides its partial-sum block, the PATH
PERMUTATION its pruning induced (new path index -> surviving parent index).
The parent applies that permutation to the alphas it is holding before the
g-branch, and composes permutations upward.  All state is (B, L, ...) arrays;
pruning is a top-L selection over 2L path metrics (max-log penalty update),
rate-0 subtrees are absorbed without branching.

CRC-aided selection: the best-metric path whose CRC checks wins (the standard
CA-SCL rule); otherwise the best-metric path is returned with ok=False.

PC codes (UCI 12 <= K <= 19, TS 38.212 §5.3.1.2): each path threads its own
length-5 cyclic register (B, L, 5).  Rate-0 subtrees rotate it by their size;
info leaves rotate by one and XOR the decided bit into slot 0 (after applying
the prune permutation); PC leaves force the bit to the register value and
charge the max-log penalty for disagreeing LLRs — no branching, no prune.
Reference counterpart: polar_decoder_impl.cpp SCL paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..crc import crc_check
from .code import PolarCode
from .encoder import transform


def _f(a1, a2):
    s = jnp.sign(a1) * jnp.sign(a2)
    s = jnp.where(s == 0, 1.0, s)
    return s * jnp.minimum(jnp.abs(a1), jnp.abs(a2))


def _take_paths(x, idx):
    """Gather path dimension: x (B, L, ...) by idx (B, L') -> (B, L', ...)."""
    return jnp.take_along_axis(
        x, idx.reshape(*idx.shape, *([1] * (x.ndim - 2))), axis=1)


def decode_scl(llrs: jnp.ndarray, code: PolarCode, list_size: int = 8,
               crc: str | None = None
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N) mother-code LLRs -> ((B, K) bits, (B,) ok).

    ``crc``: name from ops.crc (e.g. 'crc24c', 'crc11') checked over the K
    bits for CRC-aided path selection; None = pick the best metric path
    (ok = True always).
    """
    ell = list_size
    b = llrs.shape[0]
    frozen = np.ones(code.nof_bits, dtype=bool)
    frozen[code.info_set] = False
    pc_mask = np.zeros(code.nof_bits, dtype=bool)
    pc_mask[code.pc_set] = True

    # All L paths start identical; only path 0 is "active" (pm 0 vs +inf
    # clones) so duplicates don't crowd out real branches.
    alpha0 = jnp.broadcast_to(llrs[:, None, :], (b, ell, code.nof_bits))
    pm0 = jnp.concatenate(
        [jnp.zeros((b, 1)), jnp.full((b, ell - 1), 1e30)], axis=1)
    id_perm = jnp.broadcast_to(jnp.arange(ell)[None], (b, ell))

    def rec(alpha, pm, lo, size, reg):
        sub = frozen[lo:lo + size]
        has_pc = pc_mask[lo:lo + size].any()
        if sub.all() and not has_pc:
            # rate-0: u = 0 everywhere; penalty for every negative-LLR slot.
            pen = jnp.sum(jnp.where(alpha < 0, -alpha, 0.0), axis=-1)
            beta = jnp.zeros((b, ell, size), jnp.int8)
            u = beta
            reg = jnp.roll(reg, size % 5, axis=-1)
            return beta, u, pm + pen, id_perm, reg
        if size == 1:
            a = alpha[..., 0]
            reg = jnp.roll(reg, 1, axis=-1)
            if pc_mask[lo]:
                # PC leaf: bit forced to the register value; charge the
                # max-log penalty where the LLR disagrees.  No prune.
                ubit = reg[..., 0]                             # (B, L) int8
                pen = jnp.where(ubit == 0,
                                jnp.where(a < 0, -a, 0.0),
                                jnp.where(a > 0, a, 0.0))
                reg = reg.at[..., 0].set(0)                    # y0 ^= u
                beta = ubit[..., None]
                return beta, beta, pm + pen, id_perm, reg
            # info leaf: branch u=0 / u=1, prune 2L -> L.  (size-1 frozen
            # leaves are fully covered by the rate-0 branch above.)
            pen0 = jnp.where(a < 0, -a, 0.0)
            pen1 = jnp.where(a > 0, a, 0.0)
            pm2 = jnp.concatenate([pm + pen0, pm + pen1], axis=1)  # (B, 2L)
            _, idx = jax.lax.top_k(-pm2, ell)                      # (B, L)
            parent = idx % ell
            ubit = (idx // ell).astype(jnp.int8)
            new_pm = jnp.take_along_axis(pm2, idx, axis=1)
            reg = _take_paths(reg, parent)
            reg = reg.at[..., 0].set(jnp.bitwise_xor(reg[..., 0], ubit))
            beta = ubit[..., None]
            return beta, ubit[..., None], new_pm, parent, reg
        half = size // 2
        a1, a2 = alpha[..., :half], alpha[..., half:]
        bl, ul, pm, perm_l, reg = rec(_f(a1, a2), pm, lo, half, reg)
        a1p = _take_paths(a1, perm_l)
        a2p = _take_paths(a2, perm_l)
        ar = a2p + (1.0 - 2.0 * bl.astype(jnp.float32)) * a1p
        br, ur, pm, perm_r, reg = rec(ar, pm, lo + half, half, reg)
        blp = _take_paths(bl, perm_r)
        ulp = _take_paths(ul, perm_r)
        beta = jnp.concatenate([jnp.bitwise_xor(blp, br), br], axis=-1)
        u = jnp.concatenate([ulp, ur], axis=-1)
        perm = jnp.take_along_axis(perm_l, perm_r, axis=1)
        return beta, u, pm, perm, reg

    reg0 = jnp.zeros((b, ell, 5), jnp.int8)
    _, u, pm, _, _ = rec(alpha0, pm0, 0, code.nof_bits, reg0)
    cands = u[:, :, jnp.asarray(code.info_set)]            # (B, L, K)
    if code.dci_interleave is not None:
        inv = np.empty(code.k, dtype=np.int64)
        inv[code.dci_interleave] = np.arange(code.k)
        cands = cands[:, :, jnp.asarray(inv)]

    order = jnp.argsort(pm, axis=1)                        # best first
    cands = _take_paths(cands, order)
    if crc is None:
        return cands[:, 0], jnp.ones((b,), bool)
    oks = crc_check(cands.reshape(b * ell, code.k), crc).reshape(b, ell)
    any_ok = jnp.any(oks, axis=1)
    first_ok = jnp.argmax(oks, axis=1)                     # first True by pm
    pick = jnp.where(any_ok, first_ok, 0)
    best = jnp.take_along_axis(cands, pick[:, None, None], axis=1)[:, 0]
    return best, any_ok
