"""EVM calculation from equalized symbols and hard decisions.

Counterpart of the reference's evm_calculator_generic_impl.cpp: re-modulate
the hard-decided bits and measure the RMS error vector against the equalized
symbols; also the SINR-from-EVM conversion used in PUSCH CSI reporting.
"""

from __future__ import annotations

import jax.numpy as jnp

from .modulation import hard_decision, modulate


def evm(eq_symbols: jnp.ndarray, llrs: jnp.ndarray,
        modulation_name: str) -> jnp.ndarray:
    """RMS EVM over the last axis: ||y - remod(harddec(llr))|| / sqrt(E_s)."""
    bits = hard_decision(llrs)
    ref = modulate(bits, modulation_name)
    err = jnp.mean(jnp.abs(eq_symbols - ref) ** 2, axis=-1)
    return jnp.sqrt(err)


def sinr_from_evm(evm_value: jnp.ndarray) -> jnp.ndarray:
    """Post-equalization SINR (dB) = -20 log10(EVM)."""
    return -20.0 * jnp.log10(jnp.maximum(evm_value, 1e-9))
