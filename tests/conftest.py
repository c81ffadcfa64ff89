"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding paths are validated on a virtual CPU mesh (the real
environment exposes a single TPU chip). jax may already be imported with a
TPU platform by the interpreter's sitecustomize, so override via
``jax.config`` before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
