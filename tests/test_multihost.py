"""Multi-host (DCN-boundary) execution: 2 OS processes, 4 virtual CPU
devices each, one 8-device global mesh via jax.distributed + gloo.

Validates SURVEY §2.5's last row (ICI within host, DCN across hosts):
the single-cell slot step sharded host-major over 'ue' compiles with
cross-process collectives and recovers payloads exactly on both
processes; the (host, ue, cb) mesh pins one carrier per host."""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.timeout(600)
def test_two_process_dcn_boundary():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    # The workers set JAX_PLATFORMS/XLA_FLAGS themselves (4 devices each).
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable,
             str(REPO / "tools" / "multihost_worker.py"),
             str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    assert "MULTIHOST_OK procs=2 devices=8" in outs[0], outs[0]
