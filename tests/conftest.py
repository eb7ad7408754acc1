"""Test configuration: force an 8-virtual-device CPU platform so data-parallel
mesh tests run without TPU hardware (SURVEY.md §4 test plan).

Note: this image's sitecustomize registers the `axon` TPU backend at
interpreter start and wins over the JAX_PLATFORMS env var, so the platform
must be forced through jax.config *after* import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
