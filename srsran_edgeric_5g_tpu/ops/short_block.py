"""Short-block UCI coding (TS 38.212 §5.3.3): K=1 repetition, K=2 simplex,
3<=K<=11 Reed-Muller (32, K), plus ML soft detection.

Counterpart of the reference's short_block_{encoder,detector}_impl.cpp.  The
detector is a single (B, 32) x (32, 2^K) correlation matmul over all
codewords — exactly the shape the MXU wants; the reference's per-codeword
scalar loop disappears.

The RM basis (Table 5.3.3.3-1) is packed spec data in data/ldpc_graphs.npz.
"""

from __future__ import annotations

import functools
import pathlib

import jax.numpy as jnp
import numpy as np

_DATA = pathlib.Path(__file__).resolve().parents[1] / "data" / "ldpc_graphs.npz"


@functools.lru_cache(maxsize=None)
def rm_basis() -> np.ndarray:
    """(11, 32) int8 basis sequences M_i(n)."""
    return np.load(_DATA)["rm_basis_sequences"]


def encode(bits: jnp.ndarray, e: int) -> jnp.ndarray:
    """(B, K) UCI bits, K in 1..11 -> (B, E) coded bits.

    K=1: repetition of c0 (placeholder y-bits follow the spec's x/y pattern
    only at modulation time; here bits repeat).  K=2: [c0, c1, c0^c1] cycled.
    K>=3: RM(32,K) then cyclic repetition to E.
    """
    b, k = bits.shape
    bits = bits.astype(jnp.int8)
    if k == 1:
        base = jnp.broadcast_to(bits, (b, e))
        return base
    if k == 2:
        c0, c1 = bits[:, 0], bits[:, 1]
        trip = jnp.stack([c0, c1, jnp.bitwise_xor(c0, c1)], axis=1)
        reps = -(-e // 3)
        return jnp.tile(trip, (1, reps))[:, :e]
    assert 3 <= k <= 11, k
    basis = jnp.asarray(rm_basis()[:k].astype(np.float32))
    d = jnp.mod(jnp.matmul(bits.astype(jnp.float32), basis,
                           preferred_element_type=jnp.float32), 2.0)
    d = d.astype(jnp.int8)
    reps = -(-e // 32)
    return jnp.tile(d, (1, reps))[:, :e]


@functools.lru_cache(maxsize=None)
def _codebook(k: int, e: int) -> np.ndarray:
    """(2^K, E) all codewords as +-1 float32 (bit0 -> +1).

    Pure numpy mirror of `encode` (it must stay host-side: inside a jit
    trace every jnp op is staged out, so a jnp round-trip here would leak
    tracers into the lru cache)."""
    msgs = ((np.arange(1 << k)[:, None] >> np.arange(k)) & 1).astype(np.int8)
    if k == 1:
        cw = np.broadcast_to(msgs, (2, e))
    elif k == 2:
        trip = np.stack([msgs[:, 0], msgs[:, 1],
                         msgs[:, 0] ^ msgs[:, 1]], axis=1)
        cw = np.tile(trip, (1, -(-e // 3)))[:, :e]
    else:
        d = (msgs.astype(np.int64) @ rm_basis()[:k].astype(np.int64)) % 2
        cw = np.tile(d, (1, -(-e // 32)))[:, :e]
    return (1.0 - 2.0 * cw).astype(np.float32)


def detect(llrs: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ML detection: (B, E) LLRs -> ((B, K) bits, (B,) correlation metric).

    argmax_m <llr, (1-2c_m)> over all 2^K codewords — one matmul.
    """
    b, e = llrs.shape
    book = jnp.asarray(_codebook(k, e))               # (2^K, E)
    corr = jnp.matmul(llrs.astype(jnp.float32), book.T,
                      preferred_element_type=jnp.float32)  # (B, 2^K)
    best = jnp.argmax(corr, axis=-1)
    bits = ((best[:, None] >> jnp.arange(k)) & 1).astype(jnp.int8)
    metric = jnp.max(corr, axis=-1)
    return bits, metric
