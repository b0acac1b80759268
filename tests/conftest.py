"""Test environment: force the CPU backend with 8 virtual devices.

The container's sitecustomize imports jax with JAX_PLATFORMS=axon (one real
TPU chip over a tunnel) before pytest starts, so env vars are too late here;
instead the jax config is updated before any backend initializes. Multi-chip
sharding is validated on the 8 virtual CPU devices
(xla_force_host_platform_device_count), per SURVEY §4: shard the same pileup
1-way vs N-way and assert identical output.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
