"""Polar encoding: allocate + butterfly transform (TS 38.212 §5.3.1.2).

Counterpart of the reference's polar_allocator_impl.cpp +
polar_encoder_impl.cpp.  x = u * F^{(x)n} computed as n vectorized XOR
butterfly stages over the batch — log2(N) fused VPU ops, no bit loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .code import PolarCode


def allocate(msg_bits: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """(B, K) message bits -> (B, N) u-domain vector (frozen = 0).

    Applies the DCI input interleaver when the code was built with i_IL=1.
    """
    b = msg_bits.shape[0]
    bits = msg_bits
    if code.dci_interleave is not None:
        bits = bits[:, jnp.asarray(code.dci_interleave)]
    u = jnp.zeros((b, code.nof_bits), jnp.int8)
    return u.at[:, jnp.asarray(code.info_set)].set(bits.astype(jnp.int8))


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
    """Host oracle: direct G_N = F^{(x)n} matrix multiply over GF(2)."""
    f = np.array([[1, 0], [1, 1]], dtype=np.int64)
    g = np.array([[1]], dtype=np.int64)
    for _ in range(code.n):
        g = np.kron(g, f)
    u = np.zeros((msg_bits.shape[0], code.nof_bits), dtype=np.int64)
    bits = msg_bits
    if code.dci_interleave is not None:
        bits = bits[:, code.dci_interleave]
    u[:, code.info_set] = bits
    return (u @ g) % 2
