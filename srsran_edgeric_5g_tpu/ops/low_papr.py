"""Low-PAPR (Zadoff-Chu) sequence generation, TS 38.211 §5.2.2 / §6.3.1.4.

Counterpart of the reference's low_papr_sequence_generator_impl.cpp: base
sequences r^(alpha)_{u,v}(n) for PUCCH formats 0/1, SRS and DFT-s-OFDM DM-RS.

For M_zc >= 36 (>= 3 PRB): r_{u,v}(n) = x_q(n mod N_zc),
x_q(m) = exp(-j pi q m (m+1) / N_zc), N_zc the largest prime < M_zc.
For 1-2 PRB the spec's tabulated phi sequences apply (Tables 5.2.2.2-1/-2),
loaded as packed spec constants from data/ldpc_graphs.npz.
Cyclic shift alpha applies as exp(j alpha n).
"""

from __future__ import annotations

import functools
import pathlib

import jax.numpy as jnp
import numpy as np

_DATA = pathlib.Path(__file__).resolve().parents[1] / "data" / "ldpc_graphs.npz"


@functools.lru_cache(maxsize=None)
def _phi_tables() -> dict[int, np.ndarray]:
    d = np.load(_DATA)
    return {6: d["phi_m6"], 12: d["phi_m12"],
            18: d["phi_m18"], 24: d["phi_m24"]}


@functools.lru_cache(maxsize=None)
def largest_prime_below(n: int) -> int:
    for c in range(n - 1, 1, -1):
        if all(c % d for d in range(2, int(c ** 0.5) + 1)):
            return c
    raise ValueError(n)


@functools.lru_cache(maxsize=None)
def base_sequence(u: int, v: int, m_zc: int) -> np.ndarray:
    """r_{u,v}(n), n=0..M_zc-1 (host precompute; complex64)."""
    if m_zc in (6, 12, 18, 24):
        return np.exp(1j * _phi_tables()[m_zc][u] * np.pi / 4).astype(np.complex64)
    if m_zc < 36:
        raise NotImplementedError(f"phi table for M_zc={m_zc} not included")
    n_zc = largest_prime_below(m_zc)
    q_bar = n_zc * (u + 1) / 31.0
    q = int(np.floor(q_bar + 0.5)) + v * (-1) ** int(np.floor(2 * q_bar))
    m = np.arange(n_zc, dtype=np.float64)
    x_q = np.exp(-1j * np.pi * q * m * (m + 1) / n_zc)
    n = np.arange(m_zc)
    return x_q[n % n_zc].astype(np.complex64)


def low_papr_sequence(u: int, v: int, alpha: float, m_zc: int) -> jnp.ndarray:
    """r^(alpha)_{u,v}(n) = e^{j alpha n} r_{u,v}(n) as a device array."""
    base = base_sequence(u, v, m_zc)
    n = np.arange(m_zc)
    return jnp.asarray((np.exp(1j * alpha * n) * base).astype(np.complex64))
