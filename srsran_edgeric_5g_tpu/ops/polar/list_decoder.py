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
    assert code.n_pc == 0, "SCL with PC bits not implemented (SC handles PC)"
    ell = list_size
    b = llrs.shape[0]
    frozen = np.ones(code.nof_bits, dtype=bool)
    frozen[code.info_set] = False

    # All L paths start identical; only path 0 is "active" (pm 0 vs +inf
    # clones) so duplicates don't crowd out real branches.
    alpha0 = jnp.broadcast_to(llrs[:, None, :], (b, ell, code.nof_bits))
    pm0 = jnp.concatenate(
        [jnp.zeros((b, 1)), jnp.full((b, ell - 1), 1e30)], axis=1)

    def rec(alpha, pm, lo, size):
        sub = frozen[lo:lo + size]
        if sub.all():
            # rate-0: u = 0 everywhere; penalty for every negative-LLR slot.
            pen = jnp.sum(jnp.where(alpha < 0, -alpha, 0.0), axis=-1)
            beta = jnp.zeros((b, ell, size), jnp.int8)
            u = beta
            perm = jnp.broadcast_to(jnp.arange(ell)[None], (b, ell))
            return beta, u, pm + pen, perm
        if size == 1:
            # info leaf: branch u=0 / u=1, prune 2L -> L.
            a = alpha[..., 0]
            pen0 = jnp.where(a < 0, -a, 0.0)
            pen1 = jnp.where(a > 0, a, 0.0)
            pm2 = jnp.concatenate([pm + pen0, pm + pen1], axis=1)  # (B, 2L)
            _, idx = jax.lax.top_k(-pm2, ell)                      # (B, L)
            parent = idx % ell
            ubit = (idx // ell).astype(jnp.int8)
            new_pm = jnp.take_along_axis(pm2, idx, axis=1)
            beta = ubit[..., None]
            return beta, ubit[..., None], new_pm, parent
        half = size // 2
        a1, a2 = alpha[..., :half], alpha[..., half:]
        bl, ul, pm, perm_l = rec(_f(a1, a2), pm, lo, half)
        a1p = _take_paths(a1, perm_l)
        a2p = _take_paths(a2, perm_l)
        ar = a2p + (1.0 - 2.0 * bl.astype(jnp.float32)) * a1p
        br, ur, pm, perm_r = rec(ar, pm, lo + half, half)
        blp = _take_paths(bl, perm_r)
        ulp = _take_paths(ul, perm_r)
        beta = jnp.concatenate([jnp.bitwise_xor(blp, br), br], axis=-1)
        u = jnp.concatenate([ulp, ur], axis=-1)
        perm = jnp.take_along_axis(perm_l, perm_r, axis=1)
        return beta, u, pm, perm

    _, u, pm, _ = rec(alpha0, pm0, 0, code.nof_bits)
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
