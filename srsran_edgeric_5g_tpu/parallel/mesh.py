"""Mesh construction and axis names."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

UE_AXIS = "ue"
CB_AXIS = "cb"


def make_mesh(n_ue: int | None = None, n_cb: int | None = None,
              devices=None) -> Mesh:
    """2-D (ue, cb) mesh over the available devices.

    Defaults: all devices on the 'ue' axis.  UE-level work shards over 'ue',
    codeblock batches shard over both axes flattened.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if n_ue is None and n_cb is None:
        n_ue, n_cb = n, 1
    elif n_ue is None:
        n_ue = n // n_cb
    elif n_cb is None:
        n_cb = n // n_ue
    assert n_ue * n_cb == n, (n_ue, n_cb, n)
    arr = np.asarray(devices).reshape(n_ue, n_cb)
    return Mesh(arr, (UE_AXIS, CB_AXIS))
