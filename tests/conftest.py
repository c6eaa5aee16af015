"""Test environment: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated here on virtual CPU devices (the build
machine has a single real TPU chip); bench.py runs on the real chip.

Note on this machine's environment: a sitecustomize (PYTHONPATH=/root/.axon_site)
registers the experimental 'axon' TPU-relay PJRT plugin at interpreter startup
and the env pins JAX_PLATFORMS=axon, so jax is already imported before this
conftest runs.  The relay is also single-client — two processes touching the
TPU deadlock.  Tests therefore must (a) switch platforms via jax.config (env
vars are too late) and (b) never touch the TPU backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # Read when the CPU client is first created, which is after this point.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; this is a no-op)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
