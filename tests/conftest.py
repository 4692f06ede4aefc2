"""Test env: force an 8-device virtual CPU mesh before JAX initializes, so
sharding/collective tests run without TPU hardware (SURVEY.md §4)."""

import os

# The session env pins JAX_PLATFORMS to the TPU tunnel; tests must override
# it, both to free the (single) chip and to get fp32-exact math.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session's sitecustomize registers the axon TPU plugin and pins the
# platform programmatically; jax.config wins over it and over the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
