"""Test environment: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a simulated mesh
(xla_force_host_platform_device_count), per SURVEY §4: shard the same pileup
1-way vs N-way and assert identical output.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
