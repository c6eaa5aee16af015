"""Polar successive-cancellation decoder, batched, with SSC pruning.

Counterpart of the reference's polar_decoder_impl.cpp (SC butterfly).  The
tree is unrolled at trace time from the static frozen mask; rate-0 subtrees
(all frozen) return known zeros and rate-1 subtrees (no frozen bits) decode
in one shot via the self-inverse butterfly — the classic simplified-SC
pruning, which keeps the traced graph small and the per-node ops batched
over (B, subtree) tensors.

List decoding (SCL) is a planned extension; SC is the reference's default
for PDCCH-scale codes and is exact at the noiseless/parity-check level.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .code import PolarCode
from .encoder import transform


def _f(a1: jnp.ndarray, a2: jnp.ndarray) -> jnp.ndarray:
    """Check-node LLR combine: sign(a1)sign(a2)min(|a1|,|a2|)."""
    s = jnp.sign(a1) * jnp.sign(a2)
    s = jnp.where(s == 0, 1.0, s)
    return s * jnp.minimum(jnp.abs(a1), jnp.abs(a2))


def decode(llrs: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """(B, N) mother-code LLRs (positive <=> bit 0) -> (B, K) message bits.

    Undoes the DCI input interleaver when the code used i_IL=1.
    """
    frozen_mask = np.ones(code.nof_bits, dtype=bool)
    frozen_mask[code.info_set] = False
    b = llrs.shape[0]
    alpha0 = llrs.astype(jnp.float32)

    def rec(alpha, lo, size):
        sub = frozen_mask[lo:lo + size]
        if sub.all():     # rate-0: all bits known zero
            z = jnp.zeros((b, size), jnp.int8)
            return z, z
        if not sub.any():  # rate-1: hard decision, u = beta * G (G^-1 = G)
            beta = (alpha < 0).astype(jnp.int8)
            return beta, transform(beta)
        half = size // 2
        a1, a2 = alpha[:, :half], alpha[:, half:]
        bl, ul = rec(_f(a1, a2), lo, half)
        ar = a2 + (1.0 - 2.0 * bl.astype(jnp.float32)) * a1
        br, ur = rec(ar, lo + half, half)
        beta = jnp.concatenate([jnp.bitwise_xor(bl, br), br], axis=1)
        return beta, jnp.concatenate([ul, ur], axis=1)

    _, u = rec(alpha0, 0, code.nof_bits)
    bits = u[:, jnp.asarray(code.info_set)]
    if code.dci_interleave is not None:
        inv = np.empty(code.k, dtype=np.int64)
        inv[code.dci_interleave] = np.arange(code.k)
        bits = bits[:, jnp.asarray(inv)]
    return bits
