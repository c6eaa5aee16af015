#!/usr/bin/env python3
"""One process of the 2-process multi-host (DCN-boundary) validation.

Usage: multihost_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; together they form an 8-device
global mesh.  Two programs run:

1. Single-cell DL+UL slot step sharded (ue=4, cb=2) HOST-MAJOR on 'ue' —
   the grid-formation all-gather crosses the process (DCN) boundary.
2. Multi-carrier slot batch on the (host, ue, cb) mesh — carriers pinned
   per host (the deployment layout: zero cross-host collectives on the
   data plane).

Both assert payload-exact recovery; process 0 prints MULTIHOST_OK.
Counterpart of the reference's absent multi-host story (it is a single
process) — this is the build's own SURVEY §2.5/§7-step-6 scope.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import numpy as np


def main():
    proc_id, nproc, port = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    # initialize() must precede ANY backend-touching import (the package
    # import chain reaches jax.devices via functools caches), so call it
    # on bare jax first.
    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=proc_id)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from srsran_edgeric_5g_tpu.parallel import mesh as mm
    from srsran_edgeric_5g_tpu.parallel import slot_pipeline as sp
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    # ---- 1. single-cell step, UE axis spanning hosts (DCN all-gather) ----
    mesh = mm.make_mesh_hostmajor(n_ue=2 * nproc, n_cb=2)
    cell = sp.CellConfig(nof_prb=24, nfft=512, nof_ue=4, prb_per_ue=6,
                         modulation="qam16", target_rate=0.4)
    tbs = cell.derived_tbs()
    rng = np.random.default_rng(11)          # same seed on every process
    pay_np = rng.integers(0, 2, (4, tbs), dtype=np.int8)
    sh = NamedSharding(mesh, P(mm.UE_AXIS))
    payloads = jax.make_array_from_callback(pay_np.shape, sh,
                                            lambda idx: pay_np[idx])
    rntis_np = (1 + np.arange(4)).astype(np.uint32)
    rsh = NamedSharding(mesh, P())
    rntis = jax.make_array_from_callback(rntis_np.shape, rsh,
                                         lambda idx: rntis_np[idx])

    @jax.jit
    def slot_step(p, r):
        td = sp.dl_slot(p, r, cell, mesh=mesh)
        return sp.ul_slot(td, r, cell, mesh=mesh)

    hat, tb_ok, _, _, _ = slot_step(payloads, rntis)
    ok = multihost_utils.process_allgather(tb_ok, tiled=True)
    hat_g = multihost_utils.process_allgather(hat, tiled=True)
    assert np.asarray(ok).all(), ok
    assert (np.asarray(hat_g) == pay_np).all()

    # ---- 2. carriers pinned per host on the (host, ue, cb) mesh ----
    hmesh = mm.make_host_mesh(n_ue=2, n_cb=2)
    assert hmesh.devices.shape == (nproc, 2, 2)
    from jax.sharding import PartitionSpec
    ccell = sp.CellConfig(nof_prb=8, nfft=128, nof_ue=2, prb_per_ue=4,
                          modulation="qam16", target_rate=0.4)
    ctbs = ccell.derived_tbs()
    cp_np = rng.integers(0, 2, (nproc, 2, 2, ctbs), dtype=np.int8)
    csh = NamedSharding(hmesh, PartitionSpec(mm.HOST_AXIS))
    cp_ = jax.make_array_from_callback(cp_np.shape, csh,
                                       lambda idx: cp_np[idx])
    cr_np = (1 + np.arange(2 * nproc, dtype=np.uint32)).reshape(nproc, 2)
    cr = jax.make_array_from_callback(
        cr_np.shape, NamedSharding(hmesh, PartitionSpec()),
        lambda idx: cr_np[idx])

    # The multi-cell programs treat the leading axis as the cell axis;
    # here it is host-pinned (CELL_AXIS -> HOST_AXIS renamed mesh).
    import jax.sharding as jsh
    cmesh = jsh.Mesh(hmesh.devices, (mm.CELL_AXIS, mm.UE_AXIS, mm.CB_AXIS))

    @jax.jit
    def cell_step(p, r):
        td = sp.multi_cell_dl_slot_batch(p, r, ccell, mesh=cmesh)
        return sp.multi_cell_ul_slot_batch(td, r, ccell, mesh=cmesh)

    c_hat, c_ok, _, _, _ = cell_step(cp_, cr)
    ok2 = multihost_utils.process_allgather(c_ok, tiled=True)
    hat2 = multihost_utils.process_allgather(c_hat, tiled=True)
    assert np.asarray(ok2).all()
    assert (np.asarray(hat2) == cp_np).all()

    # DCN boundary really exercised: the compiled single-cell step must
    # contain cross-host collectives (its all-gather groups span devices
    # of both processes).
    hlo = slot_step.lower(payloads, rntis).compile().as_text()
    assert "all-gather" in hlo or "all-reduce" in hlo, "no collectives"

    if proc_id == 0:
        print(f"MULTIHOST_OK procs={nproc} devices={len(jax.devices())} "
              f"tbs={tbs} hostmesh={dict(zip(hmesh.axis_names, hmesh.devices.shape))}",
              flush=True)


if __name__ == "__main__":
    main()
