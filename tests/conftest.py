"""Test harness: force an 8-virtual-device CPU platform.

The environment pre-imports JAX with JAX_PLATFORMS=axon (one real TPU chip), so env
vars alone are too late — use jax.config before any backend is instantiated.
Multi-chip sharding tests run on this virtual mesh (the driver separately dry-runs the
multi-chip path on real topology); numerics tests are deterministic in fp32 on CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
