"""Test configuration: force an 8-virtual-device CPU platform.

This environment's sitecustomize pre-imports jax and pins JAX_PLATFORMS=axon
(the tunneled TPU), so environment variables set here are too late; instead
we use jax.config.update, which takes effect any time before first backend
initialization.  Sharding tests use the 8 virtual CPU devices as a stand-in
for a TPU slice.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
