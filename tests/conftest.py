"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding code is exercised without TPU hardware via
xla_force_host_platform_device_count — the standard way to test mesh/pjit
code (SURVEY.md section 4). NOTE: the JAX_PLATFORMS env var is overridden by
the axon TPU plugin in this image, so we must force the platform through
jax.config before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
