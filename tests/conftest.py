"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on host-platform virtual devices (SURVEY.md §4), so the
suite never needs real TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA's in-process CPU communicator SIGABRTs the whole pytest process if one
# virtual-device thread misses a collective rendezvous by 40 s — on a 1-core
# host any concurrent load (a tunnel probe, a background compile) can starve a
# thread that long. Same guard as __graft_entry__.dryrun_multichip.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags = (flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
             " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" programmatically, which
# beats the env var — override it back to cpu via the config API before any backend
# initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the suite is dominated by XLA compiles on 1 CPU core.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
