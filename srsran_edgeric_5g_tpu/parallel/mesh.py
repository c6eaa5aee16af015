"""Mesh construction and axis names.

Axes mirror the reference's spatial partitioning (SURVEY §2.4): per-cell
worker pools -> 'cell', per-UE processing -> 'ue', codeblock fork/join
pools -> 'cb'.  Cells are independent (no cross-cell collectives), UEs
share only the final grid-sum / initial grid-slice, and codeblock batches
shard over ('ue','cb') flattened.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

UE_AXIS = "ue"
CB_AXIS = "cb"
CELL_AXIS = "cell"


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


def make_cell_mesh(n_cell: int, n_ue: int | None = None,
                   n_cb: int | None = None, devices=None) -> Mesh:
    """3-D (cell, ue, cb) mesh: independent carriers/sectors on the leading
    axis (the reference's per-cell upper/lower PHY instances), UE and
    codeblock partitioning within each cell."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    assert n % n_cell == 0, (n, n_cell)
    per_cell = n // n_cell
    if n_ue is None and n_cb is None:
        n_ue, n_cb = per_cell, 1
    elif n_ue is None:
        n_ue = per_cell // n_cb
    elif n_cb is None:
        n_cb = per_cell // n_ue
    assert n_cell * n_ue * n_cb == n, (n_cell, n_ue, n_cb, n)
    arr = np.asarray(devices).reshape(n_cell, n_ue, n_cb)
    return Mesh(arr, (CELL_AXIS, UE_AXIS, CB_AXIS))
