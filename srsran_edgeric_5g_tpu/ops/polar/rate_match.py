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
def _select_idx(code: PolarCode) -> np.ndarray:
    """Output position -> mother-codeword index after sub-block interleave."""
    jn = code.subblock_perm
    nb, e = code.nof_bits, code.e
    if code.rm_mode == "repeat":
        return jn[np.arange(e) % nb]
    if code.rm_mode == "puncture":
        return jn[nb - e:]
    return jn[:e]  # shorten


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
