"""Polar rate matching / dematching (TS 38.212 §5.4.1).

Counterpart of the reference's polar_rate_matcher_impl.cpp /
polar_rate_dematcher_impl.cpp: sub-block interleave + puncture/shorten/repeat
fused into one precomputed gather (matching), and the LLR inverse with
repetition soft-combining and the correct neutral values for the
punctured (LLR 0) / shortened (LLR +inf, known zero) positions.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .code import PolarCode

SHORT_LLR = 1e9  # effectively-infinite positive LLR for shortened bits


@functools.lru_cache(maxsize=None)
def triangular_interleave(e: int) -> np.ndarray:
    """TS 38.212 §5.4.1.3 coded-bit channel interleaver (i_BIL = 1, UCI).

    Returns perm with f[i] = e[perm[i]]: write e row-wise into an isosceles
    triangle of T rows (T smallest with T(T+1)/2 >= E), read column-wise.
    Counterpart of polar_rate_matcher_impl.cpp ch_interleaver_rm_tx.
    """
    t = 1
    while t * (t + 1) // 2 < e:
        t += 1
    out = []
    for r in range(t):
        i_in = r
        for c in range(t - r):
            if i_in >= e:
                break
            out.append(i_in)
            i_in += t - c
    perm = np.asarray(out, dtype=np.int64)
    assert len(perm) == e
    return perm


@functools.lru_cache(maxsize=None)
def _select_idx(code: PolarCode) -> np.ndarray:
    """Output position -> mother-codeword index: sub-block interleave +
    puncture/shorten/repeat selection + (UCI) triangular channel
    interleave, fused into one gather."""
    jn = code.subblock_perm
    nb, e = code.nof_bits, code.e
    if code.rm_mode == "repeat":
        sel = jn[np.arange(e) % nb]
    elif code.rm_mode == "puncture":
        sel = jn[nb - e:]
    else:
        sel = jn[:e]  # shorten
    if code.i_bil:
        sel = sel[triangular_interleave(e)]
    return sel


def rate_match(codeword: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """(B, N) mother codeword -> (B, E) transmitted bits."""
    return codeword[:, jnp.asarray(_select_idx(code))]


def rate_dematch(llrs: jnp.ndarray, code: PolarCode) -> jnp.ndarray:
    """(B, E) received LLRs -> (B, N) mother-code LLRs.

    Repetition positions accumulate; punctured positions get 0; shortened
    positions get a large positive LLR (bit known to be 0).
    """
    b = llrs.shape[0]
    base = jnp.full((b, code.nof_bits),
                    SHORT_LLR if code.rm_mode == "shorten" else 0.0,
                    jnp.float32)
    if code.rm_mode != "shorten":
        base = jnp.zeros((b, code.nof_bits), jnp.float32)
    sel = jnp.asarray(_select_idx(code))
    if code.rm_mode == "shorten":
        # transmitted positions start from 0 and accumulate over the +inf base:
        # overwrite instead (they are distinct indices).
        base = base.at[:, sel].set(llrs.astype(jnp.float32))
    else:
        base = base.at[:, sel].add(llrs.astype(jnp.float32))
    return base
