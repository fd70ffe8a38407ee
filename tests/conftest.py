"""Test env: force CPU backend with 8 virtual devices so sharding/mesh tests
run without TPU hardware (SURVEY.md §4: XLA:CPU is the 'fake backend')."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize registers the axon TPU platform and pins
# jax_platforms to it regardless of the env var; override before first use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
