"""TX amplitude control: scaling / clipping with gain+clipping metrics.

Counterpart of the reference's
lib/phy/lower/amplitude_controller/amplitude_controller_{scaling,clipping}_impl.cpp:
apply a fixed gain, optionally hard-clip the complex magnitude to a ceiling,
and report the power/clipping metrics the lower PHY logs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class AmplitudeMetrics:
    avg_power: jnp.ndarray      # mean |y|^2
    peak_power: jnp.ndarray     # max |y|^2
    papr: jnp.ndarray           # peak / avg
    clipped_ratio: jnp.ndarray  # fraction of samples clipped

    def papr_db(self) -> float:
        import numpy as np
        return float(10.0 * np.log10(max(float(self.papr), 1e-30)))


# Pytree registration so the metrics can cross jit boundaries alongside the
# scaled samples (the TX paths return them from jitted programs).
jax.tree_util.register_dataclass(
    AmplitudeMetrics,
    data_fields=["avg_power", "peak_power", "papr", "clipped_ratio"],
    meta_fields=[])


def scale(samples: jnp.ndarray, gain: float) -> tuple[jnp.ndarray, AmplitudeMetrics]:
    y = samples * jnp.float32(gain)
    return y, _metrics(y, jnp.zeros((), jnp.float32))


def clip(samples: jnp.ndarray, gain: float, ceiling: float
         ) -> tuple[jnp.ndarray, AmplitudeMetrics]:
    """y = gain*x, magnitude hard-clipped to ``ceiling`` (phase preserved)."""
    x = samples * jnp.float32(gain)
    mag = jnp.abs(x)
    over = mag > ceiling
    scale_dn = jnp.where(over, ceiling / jnp.maximum(mag, 1e-30), 1.0)
    y = x * scale_dn.astype(x.dtype)
    clipped = jnp.mean(over.astype(jnp.float32))
    return y, _metrics(y, clipped)


def _metrics(y: jnp.ndarray, clipped_ratio: jnp.ndarray) -> AmplitudeMetrics:
    p = jnp.real(y) ** 2 + jnp.imag(y) ** 2
    avg = jnp.mean(p)
    peak = jnp.max(p)
    return AmplitudeMetrics(avg_power=avg, peak_power=peak,
                            papr=peak / jnp.maximum(avg, 1e-30),
                            clipped_ratio=clipped_ratio)
