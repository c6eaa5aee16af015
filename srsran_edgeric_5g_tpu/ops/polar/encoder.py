"""Polar encoding: allocate + butterfly transform (TS 38.212 §5.3.1.2).

Counterpart of the reference's polar_allocator_impl.cpp +
polar_encoder_impl.cpp.  x = u * F^{(x)n} computed as n vectorized XOR
butterfly stages over the batch — log2(N) fused VPU ops, no bit loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .code import PolarCode


import functools


@functools.lru_cache(maxsize=None)
def _pc_matrix(code: PolarCode) -> np.ndarray:
    """(K, n_pc) GF(2) map from info bits to PC-bit values.

    TS 38.212 §5.3.1.2 PC register semantics: a length-5 register rotates
    once per u index and u_i is XORed into y[0], so the value read at a PC
    position p is XOR of u_j over j < p with j = p (mod 5).  PC-on-PC
    dependencies are resolved by substitution into info-bit masks.
    """
    k = code.k
    info = code.info_set
    masks = {}  # position -> (K,) info-bit mask
    for p in sorted(code.pc_set.tolist()):
        m = np.zeros(k, dtype=np.uint8)
        for j_idx, j in enumerate(info):
            if j < p and (p - j) % 5 == 0:
                m[j_idx] ^= 1
        for q, mq in masks.items():
            if q < p and (p - q) % 5 == 0:
                m ^= mq
        masks[p] = m
    return np.stack([masks[p] for p in sorted(masks)], axis=1) \
        if masks else np.zeros((k, 0), np.uint8)


def allocate(msg_bits: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """(B, K) message bits -> (B, N) u-domain vector (frozen = 0).

    Applies the DCI input interleaver when the code was built with i_IL=1 and
    computes parity-check bit values when the code has a PC set.
    """
    b = msg_bits.shape[0]
    bits = msg_bits
    if code.dci_interleave is not None:
        bits = bits[:, jnp.asarray(code.dci_interleave)]
    u = jnp.zeros((b, code.nof_bits), jnp.int8)
    u = u.at[:, jnp.asarray(code.info_set)].set(bits.astype(jnp.int8))
    if code.n_pc:
        from ...utils.bits import parity_dot
        pc_vals = parity_dot(bits.astype(jnp.int8), jnp.asarray(_pc_matrix(code)))
        u = u.at[:, jnp.asarray(code.pc_set)].set(pc_vals)
    return u


def transform(u: jnp.ndarray) -> jnp.ndarray:
    """Butterfly x = u G_N over GF(2): n stages of block XORs."""
    b, nb = u.shape
    n = int(np.log2(nb))
    x = u.astype(jnp.int8)
    for s in range(n):
        half = 1 << s
        x = x.reshape(b, nb // (2 * half), 2, half)
        left = jnp.bitwise_xor(x[:, :, 0], x[:, :, 1])
        x = jnp.stack([left, x[:, :, 1]], axis=2).reshape(b, nb)
    return x


def encode(msg_bits: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """(B, K) -> (B, N) polar-encoded mother codeword."""
    return transform(allocate(msg_bits, code))


def np_encode(msg_bits: np.ndarray, code: PolarCode) -> np.ndarray:
    """Host oracle: PC register walk (TS 38.212 §5.3.1.2) + kron-G multiply."""
    f = np.array([[1, 0], [1, 1]], dtype=np.int64)
    g = np.array([[1]], dtype=np.int64)
    for _ in range(code.n):
        g = np.kron(g, f)
    bits = msg_bits
    if code.dci_interleave is not None:
        bits = bits[:, code.dci_interleave]
    nb = code.nof_bits
    u = np.zeros((msg_bits.shape[0], nb), dtype=np.int64)
    info = set(code.info_set.tolist())
    pc = set(code.pc_set.tolist())
    for row in range(msg_bits.shape[0]):
        y = np.zeros(5, dtype=np.int64)
        next_bit = iter(bits[row])
        for i in range(nb):
            y = np.roll(y, 1)  # cyclic shift (y[0] <- y[4])
            if i in pc:
                u[row, i] = y[0]
            elif i in info:
                u[row, i] = int(next(next_bit))
            y[0] ^= u[row, i]
    return (u @ g) % 2
