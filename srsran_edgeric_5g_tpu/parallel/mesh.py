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
HOST_AXIS = "host"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host initialization (SURVEY §2.5 last row / §7 step 6: pod
    slices scale over DCN for host fan-out, ICI within a host).

    Wraps jax.distributed.initialize; afterwards `jax.devices()` is the
    GLOBAL device list (all hosts) and the mesh builders below can lay the
    host boundary on a chosen axis.  On TPU pods the arguments
    auto-populate from the environment; the 2-process CPU/gloo test passes
    them explicitly (tests/test_multihost.py).
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_host_mesh(n_ue: int | None = None, n_cb: int | None = None,
                   devices=None) -> Mesh:
    """3-D (host, ue, cb) mesh with the process boundary on the LEADING
    axis.

    Devices are ordered host-major (grouped by ``process_index``), so
    collectives over 'ue'/'cb' stay within a host (ICI) and only the
    'host' axis crosses DCN.  Shard independent work — carriers
    (multi_cell_*_slot_batch) or slot sub-batches — over 'host': the data
    plane then needs zero cross-host collectives, which is the only layout
    whose DCN latency cannot violate the slot deadline.
    """
    devices = jax.devices() if devices is None else devices
    by_host: dict[int, list] = {}
    for d in devices:
        by_host.setdefault(d.process_index, []).append(d)
    hosts = sorted(by_host)
    n_host = len(hosts)
    per_host = len(by_host[hosts[0]])
    assert all(len(by_host[h]) == per_host for h in hosts), \
        {h: len(v) for h, v in by_host.items()}
    if n_ue is None and n_cb is None:
        n_ue, n_cb = per_host, 1
    elif n_ue is None:
        n_ue = per_host // n_cb
    elif n_cb is None:
        n_cb = per_host // n_ue
    assert n_ue * n_cb == per_host, (n_ue, n_cb, per_host)
    arr = np.asarray([by_host[h] for h in hosts]).reshape(n_host, n_ue, n_cb)
    return Mesh(arr, (HOST_AXIS, UE_AXIS, CB_AXIS))


def make_mesh_hostmajor(n_ue: int, n_cb: int, devices=None) -> Mesh:
    """2-D (ue, cb) mesh over ALL hosts' devices, host-major on 'ue'.

    The single-cell slot step sharded this way genuinely crosses the DCN
    boundary (the grid-formation all-gather spans hosts) — the layout the
    multi-host test exercises to prove the program compiles and agrees
    across processes."""
    devices = jax.devices() if devices is None else devices
    ordered = sorted(devices, key=lambda d: (d.process_index, d.id))
    assert n_ue * n_cb == len(ordered), (n_ue, n_cb, len(ordered))
    arr = np.asarray(ordered).reshape(n_ue, n_cb)
    return Mesh(arr, (UE_AXIS, CB_AXIS))


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
