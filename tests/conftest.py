"""Test configuration: force CPU with a virtual 8-device mesh.

Tests run on CPU so they work everywhere; multi-chip sharding tests use the
8 virtual host devices.  Real-TPU execution is exercised by bench.py and
__graft_entry__.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
