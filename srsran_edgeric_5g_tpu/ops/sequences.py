"""Pseudo-random (Gold) sequence generation, TS 38.211 §5.2.1.

The length-31 Gold sequence c(n) = x1(n+Nc) XOR x2(n+Nc) is linear in the
31-bit initialiser of x2, so for a static length N we precompute once on the
host:

  * ``x1_part``: the (N,) constant x1(n+Nc) stream (x1 init is fixed), and
  * ``basis``:   the (31, N) matrix whose row i is x2(n+Nc) for c_init = e_i.

On device a batch of sequences is then ``c = x1_part XOR ((cinit_bits @ basis)
mod 2)`` — one (B,31)x(31,N) MXU matmul, replacing the reference's sequential
LFSR with fast-advance LUTs
(srsRAN-5G-ER/lib/phy/upper/sequence_generators/pseudo_random_generator_impl.cpp,
pseudo_random_generator_fast_advance.h).  There is no sequential state anywhere:
arbitrary c_init values (slot/RNTI-dependent) are just different input rows.

Basis precomputation uses the lag-31 linear recurrences in 31-wide blocks
(block_{k+1} = block_k @ S over GF(2)), so host setup is O(N/31) tiny matmuls.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..utils.bits import parity_dot

NC = 1600


def _step_matrix(taps: tuple[int, ...]) -> np.ndarray:
    """31x31 GF(2) matrix S: next 31 outputs = previous 31 outputs @ S.

    ``taps`` are the lags in x(n+31) = XOR_j x(n+tap_j).
    """
    # Propagate each basis start block one block (31 steps) forward.
    seq = np.zeros((31, 62), dtype=np.uint8)
    seq[:, :31] = np.eye(31, dtype=np.uint8)
    for n in range(31):
        acc = np.zeros(31, dtype=np.uint8)
        for t in taps:
            acc ^= seq[:, n + t]
        seq[:, n + 31] = acc
    return seq[:, 31:]  # S[i, j]: dependence of new output j on old output i


def _run_blocks(start_block: np.ndarray, taps: tuple[int, ...], total: int) -> np.ndarray:
    """Generate ``total`` outputs for each of B sequences given their first-31
    outputs ``start_block`` (B, 31)."""
    S = _step_matrix(taps)
    nblocks = -(-total // 31) + 1
    blocks = np.empty((nblocks, start_block.shape[0], 31), dtype=np.uint8)
    blk = start_block.copy()
    for k in range(nblocks):
        blocks[k] = blk
        blk = (blk.astype(np.int64) @ S.astype(np.int64)) % 2
    out = np.transpose(blocks, (1, 0, 2)).reshape(start_block.shape[0], -1)
    return out[:, :total].astype(np.uint8)


@functools.lru_cache(maxsize=None)
def gold_tables(length: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (x1_part (length,), basis (31, length)) for sequence length N."""
    # x1: x1(n+31) = x1(n+3) ^ x1(n); init x1(0)=1, rest 0.
    x1_start = np.zeros((1, 31), dtype=np.uint8)
    x1_start[0, 0] = 1
    x1 = _run_blocks(x1_start, (0, 3), NC + length)[0, NC:]
    # x2 basis: x2(n+31) = x2(n+3) ^ x2(n+2) ^ x2(n+1) ^ x2(n); init rows e_i.
    basis = _run_blocks(np.eye(31, dtype=np.uint8), (0, 1, 2, 3), NC + length)[:, NC:]
    return x1, basis


def _cinit_bits(c_init: jnp.ndarray) -> jnp.ndarray:
    """uint32 (...,) -> int8 bit rows (..., 31), bit i = LSB i of c_init."""
    shifts = np.arange(31, dtype=np.uint32)
    return ((c_init[..., None].astype(jnp.uint32) >> shifts) & 1).astype(jnp.int8)


def gold_sequence(c_init: jnp.ndarray, length: int) -> jnp.ndarray:
    """Gold sequence bits c(0..length-1) as int8 {0,1}, batched over c_init."""
    x1, basis = gold_tables(length)
    x2 = parity_dot(_cinit_bits(c_init), jnp.asarray(basis))
    return jnp.bitwise_xor(x2, jnp.asarray(x1, dtype=jnp.int8))


def np_gold_sequence(c_init: int, length: int) -> np.ndarray:
    """Host-side straightforward LFSR — the independent oracle for tests."""
    n = NC + length
    x1 = np.zeros(n + 31, dtype=np.uint8)
    x2 = np.zeros(n + 31, dtype=np.uint8)
    x1[0] = 1
    for i in range(31):
        x2[i] = (c_init >> i) & 1
    for i in range(n):
        x1[i + 31] = x1[i + 3] ^ x1[i]
        x2[i + 31] = x2[i + 3] ^ x2[i + 2] ^ x2[i + 1] ^ x2[i]
    # int8 so that arithmetic like (1 - 2*c) cannot wrap (uint8 would give
    # 255 instead of -1).
    return (x1[NC:NC + length] ^ x2[NC:NC + length]).astype(np.int8)


def scramble_bits(bits: jnp.ndarray, c_init: jnp.ndarray) -> jnp.ndarray:
    """XOR a {0,1} bit stream (..., N) with per-row Gold sequences."""
    seq = gold_sequence(c_init, bits.shape[-1])
    return jnp.bitwise_xor(bits.astype(jnp.int8), seq)


def scramble_llrs(llrs: jnp.ndarray, c_init: jnp.ndarray) -> jnp.ndarray:
    """Descramble soft bits: flip LLR sign where the sequence bit is 1."""
    seq = gold_sequence(c_init, llrs.shape[-1])
    sign = (1 - 2 * seq).astype(llrs.dtype)
    return llrs * sign
