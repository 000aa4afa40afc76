"""Test configuration: force CPU with a virtual 8-device mesh.

Tests run on CPU so they work everywhere; multi-chip sharding tests use the
8 virtual host devices.  Real-TPU execution is exercised by bench.py and
__graft_entry__.py.

Note: the environment's sitecustomize registers a TPU PJRT plugin and pins
jax_platforms programmatically, so the JAX_PLATFORMS env var alone is not
enough — we override the config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
