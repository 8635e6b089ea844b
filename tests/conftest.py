"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on host-platform virtual devices (SURVEY.md §4), so the
suite never needs real TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" programmatically, which
# beats the env var — override it back to cpu via the config API before any backend
# initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the suite is dominated by XLA compiles on 1 CPU core.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
