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


def _fold_phases(u: jnp.ndarray, size: int) -> jnp.ndarray:
    """Register contribution of a decoded block: u_j ends up at phase
    (size-1-j) mod 5 after the remaining rotations (§5.3.1.2 register)."""
    phases = (size - 1 - np.arange(size)) % 5
    mask = np.zeros((size, 5), dtype=np.float32)
    mask[np.arange(size), phases] = 1.0
    acc = jnp.matmul(u.astype(jnp.float32), jnp.asarray(mask),
                     preferred_element_type=jnp.float32)
    return jnp.mod(acc, 2.0).astype(jnp.int8)


def _rot_reg(reg: jnp.ndarray, m: int) -> jnp.ndarray:
    return jnp.roll(reg, m % 5, axis=-1)


def decode(llrs: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """(B, N) mother-code LLRs (positive <=> bit 0) -> (B, K) message bits.

    Undoes the DCI input interleaver when the code used i_IL=1; honours PC
    bits (dynamic frozen from the length-5 register) when the code has them.
    """
    frozen_mask = np.ones(code.nof_bits, dtype=bool)
    frozen_mask[code.info_set] = False
    pc_mask = np.zeros(code.nof_bits, dtype=bool)
    pc_mask[code.pc_set] = True
    b = llrs.shape[0]
    alpha0 = llrs.astype(jnp.float32)

    def rec(alpha, lo, size, reg):
        sub = frozen_mask[lo:lo + size]
        has_pc = pc_mask[lo:lo + size].any()
        if sub.all() and not has_pc:   # rate-0: all bits known zero
            z = jnp.zeros((b, size), jnp.int8)
            return z, z, _rot_reg(reg, size)
        if not sub.any() and not has_pc:  # rate-1: u = beta * G (G^-1 = G)
            beta = (alpha < 0).astype(jnp.int8)
            u = transform(beta)
            reg = jnp.bitwise_xor(_rot_reg(reg, size), _fold_phases(u, size))
            return beta, u, reg
        if size == 1:
            reg = _rot_reg(reg, 1)
            if pc_mask[lo]:
                u = reg[:, 0:1]
                reg = reg.at[:, 0].set(0)   # y0 ^= u with u = y0
                return u, u, reg
            # frozen (info leaves are covered by the rate-1 branch)
            z = jnp.zeros((b, 1), jnp.int8)
            return z, z, reg
        half = size // 2
        a1, a2 = alpha[:, :half], alpha[:, half:]
        bl, ul, reg = rec(_f(a1, a2), lo, half, reg)
        ar = a2 + (1.0 - 2.0 * bl.astype(jnp.float32)) * a1
        br, ur, reg = rec(ar, lo + half, half, reg)
        beta = jnp.concatenate([jnp.bitwise_xor(bl, br), br], axis=1)
        return beta, jnp.concatenate([ul, ur], axis=1), reg

    reg0 = jnp.zeros((b, 5), jnp.int8)
    _, u, _ = rec(alpha0, 0, code.nof_bits, reg0)
    bits = u[:, jnp.asarray(code.info_set)]
    if code.dci_interleave is not None:
        inv = np.empty(code.k, dtype=np.int64)
        inv[code.dci_interleave] = np.arange(code.k)
        bits = bits[:, jnp.asarray(inv)]
    return bits
